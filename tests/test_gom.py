"""GOM (Generic Object Model) veneer (reference ``bigdata-gom``:
``IObjectManager``/``ObjectManager`` + ``IGPO``/``GPO``): canonical
lazy-materialized objects, staged mutations flushed per native
transaction, links in/out, named roots."""

import pytest

from database_spark.gom import ObjectManager
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://ex.com/"


@pytest.fixture()
def om(spark):
    store = TripleStore.from_python_triples(
        spark,
        [
            (Term.iri(EX + "w1"), Term.iri(EX + "name"), Term.literal("widget one")),
            (Term.iri(EX + "w1"), Term.iri(EX + "price"), Term.integer(10)),
            (Term.iri(EX + "w1"), Term.iri(EX + "madeBy"), Term.iri(EX + "acme")),
            (Term.iri(EX + "w2"), Term.iri(EX + "madeBy"), Term.iri(EX + "acme")),
            (Term.iri(EX + "acme"), Term.iri(EX + "name"), Term.literal("ACME")),
        ],
    )
    return ObjectManager(SparqlEngine(store))


def test_gpo_canonical_and_lazy(om):
    a, b = om.get_gpo(EX + "w1"), om.get_gpo(EX + "w1")
    assert a is b  # one instance per IRI within an OM
    assert a._forward is None  # not materialized until accessed
    assert a.get_value(EX + "name").lex == "widget one"
    assert a._forward is not None


def test_values_links_and_reverse(om):
    w1 = om.get_gpo(EX + "w1")
    acme = om.get_gpo(EX + "acme")
    assert w1.get_value(EX + "price").lex == "10"
    assert w1.is_bound(EX + "madeBy") and not w1.is_bound(EX + "missing")
    assert w1.get_links_out(EX + "madeBy") == {acme}
    # reverse links: both widgets point at acme
    assert acme.get_links_in() == {w1, om.get_gpo(EX + "w2")}
    assert acme.get_reverse_link_properties() == {EX + "madeBy": 2}
    stmts = w1.get_statements()
    assert (Term.iri(EX + "w1"), Term.iri(EX + "name"), Term.literal("widget one")) in stmts
    assert len(stmts) == 3


def test_mutations_flush_to_store(om):
    w1 = om.get_gpo(EX + "w1")
    w1.set_value(EX + "price", Term.integer(12))
    # auto-commit outside a transaction: store reflects the change
    assert om.engine.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(12)
    )
    assert not om.engine.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(10)
    )
    w1.add_value(EX + "tag", Term.literal("sale"))
    w1.add_value(EX + "tag", Term.literal("new"))
    assert {t.lex for t in w1.get_values(EX + "tag")} == {"sale", "new"}
    w1.remove_value(EX + "tag", Term.literal("sale"))
    assert {t.lex for t in w1.get_values(EX + "tag")} == {"new"}
    w1.remove_values(EX + "tag")
    assert w1.get_values(EX + "tag") == []
    assert not om.engine.store.has_statement(s=Term.iri(EX + "w1"), p=Term.iri(EX + "tag"))


def test_native_transaction_batches_one_commit(om):
    seen = []
    om.engine.add_change_listener(lambda cs: seen.append(cs))
    tx = om.begin_native_transaction()
    w2 = om.get_gpo(EX + "w2")
    w2.set_value(EX + "name", Term.literal("widget two"))
    w2.add_value(EX + "price", Term.integer(7))
    assert not om.engine.store.has_statement(
        s=Term.iri(EX + "w2"), p=Term.iri(EX + "price")
    )  # nothing hits the store before commit
    n_before = len(seen)
    om.commit_native_transaction(tx)
    assert om.engine.store.has_statement(
        s=Term.iri(EX + "w2"), p=Term.iri(EX + "price"), o=Term.integer(7)
    )
    assert len(seen) == n_before + 1  # ONE flush batch commit


def test_rollback_discards_staged(om):
    om.begin_native_transaction()
    w1 = om.get_gpo(EX + "w1")
    w1.set_value(EX + "price", Term.integer(99))
    om.rollback_native_transaction()
    assert om.engine.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(10)
    )
    # materialized state was invalidated, re-read from store
    assert om.get_gpo(EX + "w1").get_value(EX + "price").lex == "10"


def test_remove_object_and_links_in(om):
    acme = om.get_gpo(EX + "acme")
    acme.remove()
    assert not om.engine.store.has_statement(s=Term.iri(EX + "acme"))
    assert not om.engine.store.has_statement(o=Term.iri(EX + "acme"))
    # other objects' unrelated statements survive
    assert om.engine.store.has_statement(s=Term.iri(EX + "w1"), p=Term.iri(EX + "name"))


def test_remove_invalidates_linking_objects(om):
    w1 = om.get_gpo(EX + "w1")
    assert w1.get_value(EX + "madeBy") is not None  # materialize w1
    om.get_gpo(EX + "acme").remove()
    # w1's cached snapshot must not keep serving the removed link
    assert w1.get_value(EX + "madeBy") is None


def test_gpo_cache_is_weak(om):
    import gc

    om.get_gpo(EX + "transient")
    gc.collect()
    assert (EX + "transient") not in om._gpos  # no strong pin
    held = om.get_gpo(EX + "held")
    gc.collect()
    assert om.get_gpo(EX + "held") is held  # canonical while referenced


def test_named_roots_save_recall(om):
    om.save(EX + "root", Term.iri(EX + "w1"))
    assert om.recall(EX + "root") == Term.iri(EX + "w1")
    g = om.recall_as_gpo(EX + "root")
    assert g is om.get_gpo(EX + "w1")
    om.save(EX + "root", Term.iri(EX + "w2"))  # replace
    assert om.recall_as_gpo(EX + "root") is om.get_gpo(EX + "w2")
    assert om.recall(EX + "nope") is None


def test_basic_skin_typed_accessors(om):
    from database_spark.gom import BasicSkin

    s = BasicSkin(om.get_gpo(EX + "w1"))
    assert s.get_string(EX + "name") == "widget one"
    assert s.get_int(EX + "price") == 10
    assert s.get_double(EX + "price") == 10.0
    assert s.get_int(EX + "missing", 7) == 7
    assert not s.get_boolean(EX + "missing")
    acme = s.get_gpo(EX + "madeBy")
    assert acme is om.get_gpo(EX + "acme")
    s.set(EX + "active", True)
    s.set(EX + "rank", 3)
    s.set(EX + "weight", 1.5)
    s.set(EX + "boss", acme)
    assert s.get_boolean(EX + "active") and s.get_int(EX + "rank") == 3
    assert s.get_double(EX + "weight") == 1.5
    assert s.get_gpo(EX + "boss") is acme
    assert om.engine.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "boss"), o=Term.iri(EX + "acme")
    )
    assert s.as_generic() is om.get_gpo(EX + "w1")


def test_create_gpo_and_evaluate(om):
    g = om.create_gpo()
    g.set_value(EX + "name", Term.literal("fresh"))
    res = om.evaluate(
        f"SELECT ?o WHERE {{ <{g.iri}> <{EX}name> ?o }}"
    )
    rows = res.df.collect()
    assert len(rows) == 1 and rows[0][0]["lex"] == "fresh"
    om.execute(f'INSERT DATA {{ <{g.iri}> <{EX}extra> "x" }}')
    # execute() invalidates materialized snapshots
    assert g.get_value(EX + "extra").lex == "x"


# ------------------------------------------------- skin registry + OWL
def test_skin_registry_resolution(spark):
    from database_spark.gom import BasicSkin, GenericSkinRegistry, ObjectManager

    class NamedSkin(BasicSkin):
        def name(self):
            return self.get_string("urn:ex:name")

    GenericSkinRegistry.register_class(NamedSkin)
    eng = SparqlEngine(TripleStore.from_python_triples(spark, []))
    om = ObjectManager(eng)
    g = om.get_gpo("urn:ex:thing")
    g.set_value("urn:ex:name", Term.literal("Thing"))
    s = g.get_skin(NamedSkin)
    assert s.name() == "Thing"
    # cached: same skin instance on repeat, and a BasicSkin request is
    # served by the registered subclass (getImplementationClass)
    assert g.get_skin(NamedSkin) is s
    assert isinstance(g.get_skin(BasicSkin), BasicSkin)
    with pytest.raises(KeyError):
        class Unregistered(BasicSkin):
            pass

        om.get_gpo("urn:ex:other").get_skin(Unregistered)


def test_owl_skins_browse_ontology(spark):
    """Browse a small ontology through the OWL alchemy skins
    (reference gom/alchemy/owl: ontology -> classes -> subclasses /
    properties -> range type)."""
    from database_spark import gom_owl as O
    from database_spark.gom import ObjectManager

    O.register()
    EX = "urn:onto:"
    rdf_type = Term.iri(O.RDF_TYPE)
    triples = [
        (Term.iri(EX), rdf_type, Term.iri(O.OWL_ONTOLOGY)),
        (Term.iri(EX + "Person"), rdf_type, Term.iri(O.OWL_CLASS)),
        (Term.iri(EX + "Student"), rdf_type, Term.iri(O.OWL_CLASS)),
        (Term.iri(EX + "Student"), Term.iri(O.RDFS_SUBCLASSOF), Term.iri(EX + "Person")),
        (Term.iri(EX + "advisor"), rdf_type, Term.iri(O.OWL_OBJECT_PROPERTY)),
        (Term.iri(EX + "advisor"), Term.iri(O.RDFS_DOMAIN), Term.iri(EX + "Student")),
        (Term.iri(EX + "advisor"), Term.iri(O.RDFS_RANGE), Term.iri(EX + "Person")),
        (Term.iri(EX + "gpa"), rdf_type, Term.iri(O.OWL_DATATYPE_PROPERTY)),
        (Term.iri(EX + "gpa"), Term.iri(O.RDFS_DOMAIN), Term.iri(EX + "Student")),
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, triples))
    om = ObjectManager(eng)
    onto = O.OWLOntologySkin.get_ontology(om)
    classes = {c.get_name(): c for c in onto.get_classes()}
    assert set(classes) == {EX + "Person", EX + "Student"}
    subs = [s.get_name() for s in classes[EX + "Person"].get_subclasses()]
    assert subs == [EX + "Student"]
    props = {p.get_name(): p for p in classes[EX + "Student"].get_properties()}
    assert set(props) == {EX + "advisor", EX + "gpa"}
    assert props[EX + "advisor"].is_association() is True
    assert props[EX + "gpa"].is_association() is False
    assert props[EX + "advisor"].get_type().iri == EX + "Person"
    assert props[EX + "gpa"].get_type() is None
