"""Truth maintenance on retraction + entailment UPDATE verbs.

Reference: ``TruthMaintenance.java`` (retraction invalidates inferred
statements that lose support) and ``AST2BOpUpdate.java:400-458``
(CreateEntailments / DropEntailments / Enable / Disable verbs).
Strategy here: recompute-over-explicit — sound without justification
chains; the closure fixpoint only touches rule-relevant predicates.
"""

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import RDF, RDFS, Term

EX = "http://ex.com/"


def _schema_store(spark):
    return TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "Dog"), Term.iri(RDFS + "subClassOf"), Term.iri(EX + "Animal"), None),
            (Term.iri(EX + "rex"), Term.iri(RDF + "type"), Term.iri(EX + "Dog"), None),
            (Term.iri(EX + "cat"), Term.iri(RDF + "type"), Term.iri(EX + "Cat"), None),
        ],
    )


def _is_animal(eng, who: str) -> bool:
    return eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:{who} a ex:Animal }}")


def test_retraction_invalidates_entailments(spark):
    """Deleting the subClassOf support retracts the inferred type."""
    eng = SparqlEngine(_schema_store(spark), maintain_entailments=True)
    eng.update(f"PREFIX ex: <{EX}> CREATE ENTAILMENTS")
    assert _is_animal(eng, "rex") is True  # rdfs9 entailment

    eng.update(
        f"PREFIX ex: <{EX}> PREFIX rdfs: <{RDFS}> "
        "DELETE DATA { ex:Dog rdfs:subClassOf ex:Animal }"
    )
    # the inferred (rex a Animal) lost its only support
    assert _is_animal(eng, "rex") is False
    # the explicit statement survives
    assert eng.ask(f"PREFIX ex: <{EX}> ASK {{ ex:rex a ex:Dog }}") is True


def test_retraction_keeps_supported_entailments(spark):
    """Deleting unrelated data does not disturb other entailments."""
    eng = SparqlEngine(_schema_store(spark), maintain_entailments=True)
    eng.update(f"PREFIX ex: <{EX}> CREATE ENTAILMENTS")
    eng.update(f"PREFIX ex: <{EX}> DELETE DATA {{ ex:cat a ex:Cat }}")
    assert _is_animal(eng, "rex") is True


def test_insert_maintains_closure(spark):
    """With maintenance enabled, inserts entail immediately."""
    eng = SparqlEngine(_schema_store(spark), maintain_entailments=True)
    eng.update(f"PREFIX ex: <{EX}> INSERT DATA {{ ex:fido a ex:Dog }}")
    assert _is_animal(eng, "fido") is True


def test_drop_and_disable_entailments(spark):
    eng = SparqlEngine(_schema_store(spark))
    eng.update("CREATE ENTAILMENTS")
    assert _is_animal(eng, "rex") is True

    eng.update("DROP ENTAILMENTS")
    assert _is_animal(eng, "rex") is False

    eng.update("ENABLE ENTAILMENTS")
    assert _is_animal(eng, "rex") is True

    eng.update("DISABLE ENTAILMENTS")
    eng.update(f"PREFIX ex: <{EX}> INSERT DATA {{ ex:fido a ex:Dog }}")
    # maintenance off: no new entailment is derived for fido
    assert _is_animal(eng, "fido") is False
