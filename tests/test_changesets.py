"""Commit-delta changesets API (reference: ``changesets/IChangeLog.java``
+ ``InMemChangeLog.java``): subscribers get one ChangeSet of DataFrames
per ``update()`` call with the statements ACTUALLY added/removed —
including inferred-statement removals under truth maintenance and the
explicit→inferred demotion pair."""

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import EXPLICIT, INFERRED, TripleStore
from database_spark.terms import RDF, RDFS, Term

EX = "http://ex.com/"


def _stmts(df):
    """ChangeSet df → set of (s_lex, p_lex, o_lex, g_lex|None, inferred)."""
    return {
        (
            r["st"]["lex"],
            r["pt"]["lex"],
            r["ot"]["lex"],
            r["gt"]["lex"] if r["gt"] else None,
            r["inferred"],
        )
        for r in df.collect()
    }


class Collector:
    def __init__(self):
        self.events = []

    def __call__(self, cs):
        self.events.append((_stmts(cs.added), _stmts(cs.removed)))


def _engine(spark, maintain=False):
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("v1")),
            (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal("v2")),
        ],
    )
    return SparqlEngine(store, maintain_entailments=maintain)


def test_insert_data_reports_only_actually_new(spark):
    e = _engine(spark)
    col = Collector()
    e.add_change_listener(col)
    # one genuinely new statement + one already present (reported only
    # if actually written — InMemChangeLog's index-write semantics)
    e.update(
        f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:p "v3" . ex:a ex:p "v1" }}'
    )
    assert len(col.events) == 1
    added, removed = col.events[0]
    assert added == {(EX + "c", EX + "p", "v3", None, EXPLICIT)}
    assert removed == set()


def test_delete_where_reports_exact_removals(spark):
    e = _engine(spark)
    col = Collector()
    e.add_change_listener(col)
    e.update(f'PREFIX ex: <{EX}> DELETE WHERE {{ ex:a ex:p ?o }}')
    added, removed = col.events[0]
    assert added == set()
    assert removed == {(EX + "a", EX + "p", "v1", None, EXPLICIT)}


def test_delete_data_of_absent_statement_reports_nothing(spark):
    e = _engine(spark)
    col = Collector()
    e.add_change_listener(col)
    e.update(f'PREFIX ex: <{EX}> DELETE DATA {{ ex:zz ex:p "nope" }}')
    added, removed = col.events[0]
    assert added == set() and removed == set()


def test_listener_unsubscribe_stops_tracking(spark):
    e = _engine(spark)
    col = Collector()
    e.add_change_listener(col)
    e.remove_change_listener(col)
    e.update(f'PREFIX ex: <{EX}> INSERT DATA {{ ex:c ex:p "v3" }}')
    assert col.events == []


def test_tm_retraction_reports_inferred_removals(spark):
    """DRed retraction: deleting the type support removes the inferred
    supertype statement — both must appear in `removed`."""
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "Dog"), Term.iri(RDFS + "subClassOf"), Term.iri(EX + "Animal")),
            (Term.iri(EX + "rex"), Term.iri(RDF + "type"), Term.iri(EX + "Dog")),
        ],
    )
    e = SparqlEngine(store, maintain_entailments=True)
    e.update("CREATE ENTAILMENTS")
    col = Collector()
    e.add_change_listener(col)
    e.update(f"PREFIX ex: <{EX}> PREFIX rdf: <{RDF}> DELETE DATA {{ ex:rex rdf:type ex:Dog }}")
    added, removed = col.events[0]
    assert (EX + "rex", RDF + "type", EX + "Dog", None, EXPLICIT) in removed
    assert (EX + "rex", RDF + "type", EX + "Animal", None, INFERRED) in removed
    assert added == set()


def test_tm_demotion_pair_on_still_derivable_delete(spark):
    """Deleting an explicit statement that remains derivable emits the
    reference's UPDATED pair: explicit row removed, inferred row added."""
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "Dog"), Term.iri(RDFS + "subClassOf"), Term.iri(EX + "Animal")),
            (Term.iri(EX + "rex"), Term.iri(RDF + "type"), Term.iri(EX + "Dog")),
            # explicitly asserted AND derivable via rdfs9
            (Term.iri(EX + "rex"), Term.iri(RDF + "type"), Term.iri(EX + "Animal")),
        ],
    )
    e = SparqlEngine(store, maintain_entailments=True)
    e.update("CREATE ENTAILMENTS")
    col = Collector()
    e.add_change_listener(col)
    e.update(
        f"PREFIX ex: <{EX}> PREFIX rdf: <{RDF}> DELETE DATA {{ ex:rex rdf:type ex:Animal }}"
    )
    added, removed = col.events[0]
    assert (EX + "rex", RDF + "type", EX + "Animal", None, EXPLICIT) in removed
    assert (EX + "rex", RDF + "type", EX + "Animal", None, INFERRED) in added
    # and the statement is still queryable
    assert e.ask(f"PREFIX ex: <{EX}> ASK {{ ex:rex a ex:Animal }}") is True


def test_insert_with_tm_reports_new_inferences(spark):
    store = TripleStore.from_python_triples(
        spark,
        [(Term.iri(EX + "Dog"), Term.iri(RDFS + "subClassOf"), Term.iri(EX + "Animal"))],
    )
    e = SparqlEngine(store, maintain_entailments=True)
    e.update("CREATE ENTAILMENTS")
    col = Collector()
    e.add_change_listener(col)
    e.update(f"PREFIX ex: <{EX}> INSERT DATA {{ ex:fido a ex:Dog }}")
    added, removed = col.events[0]
    assert (EX + "fido", RDF + "type", EX + "Dog", None, EXPLICIT) in added
    assert (EX + "fido", RDF + "type", EX + "Animal", None, INFERRED) in added
    assert removed == set()


def test_clear_graph_reports_cleared_statements(spark):
    g = Term.iri(EX + "g1")
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "a"), Term.iri(EX + "p"), Term.literal("v1"), g),
            (Term.iri(EX + "b"), Term.iri(EX + "p"), Term.literal("v2"), None),
        ],
    )
    e = SparqlEngine(store)
    col = Collector()
    e.add_change_listener(col)
    e.update(f"CLEAR GRAPH <{EX}g1>")
    added, removed = col.events[0]
    assert removed == {(EX + "a", EX + "p", "v1", EX + "g1", EXPLICIT)}
    assert added == set()
