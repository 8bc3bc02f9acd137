"""Remote GOM client (reference ``NanoSparqlObjectManager.java``,
tests ``TestRemoteGOM.java``): the embedded CRUD/links/transaction/
named-root/skin matrix of ``test_gom.py`` run through
``RemoteObjectManager`` against a real in-process HTTP
``SparqlEndpoint`` — plus embedded↔remote interop over one store."""

import pytest

from database_spark.gom import BasicSkin, ObjectManager
from database_spark.gom_client import RemoteObjectManager
from database_spark.server import SparqlEndpoint
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://ex.com/"


@pytest.fixture()
def served(spark):
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
    eng = SparqlEngine(store)
    ep = SparqlEndpoint(eng, port=0).start()
    try:
        yield RemoteObjectManager(ep.url), eng
    finally:
        ep.stop()


def test_remote_gpo_canonical_lazy_and_reads(served):
    om, _ = served
    a, b = om.get_gpo(EX + "w1"), om.get_gpo(EX + "w1")
    assert a is b
    assert a._forward is None  # no HTTP until first access
    assert a.get_value(EX + "name").lex == "widget one"
    assert a.get_value(EX + "price").lex == "10"
    acme = om.get_gpo(EX + "acme")
    assert a.get_links_out(EX + "madeBy") == {acme}
    # reverse links arrive in the same materialization round trip
    assert acme.get_links_in() == {a, om.get_gpo(EX + "w2")}
    assert acme.get_reverse_link_properties() == {EX + "madeBy": 2}


def test_remote_mutations_flush_over_http(served):
    om, eng = served
    w1 = om.get_gpo(EX + "w1")
    w1.set_value(EX + "price", Term.integer(12))
    # the remote update landed in the served engine's store
    assert eng.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(12)
    )
    assert not eng.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(10)
    )
    w1.add_value(EX + "tag", Term.literal("sale"))
    w1.add_value(EX + "tag", Term.literal("new"))
    assert {t.lex for t in w1.get_values(EX + "tag")} == {"sale", "new"}
    w1.remove_value(EX + "tag", Term.literal("sale"))
    w1.remove_values(EX + "tag")
    assert not eng.store.has_statement(s=Term.iri(EX + "w1"), p=Term.iri(EX + "tag"))


def test_remote_native_transaction_one_update_one_commit(served):
    om, eng = served
    seen = []
    eng.add_change_listener(lambda cs: seen.append(cs))
    tx = om.begin_native_transaction()
    w2 = om.get_gpo(EX + "w2")
    w2.set_value(EX + "name", Term.literal("widget two"))
    w2.add_value(EX + "price", Term.integer(7))
    assert not eng.store.has_statement(
        s=Term.iri(EX + "w2"), p=Term.iri(EX + "price")
    )  # staged client-side, no HTTP write yet
    n_before = len(seen)
    om.commit_native_transaction(tx)
    assert eng.store.has_statement(
        s=Term.iri(EX + "w2"), p=Term.iri(EX + "price"), o=Term.integer(7)
    )
    # ONE ;-chained update request = ONE server commit = ONE changeset
    assert len(seen) == n_before + 1


def test_remote_rollback_discards_staged(served):
    om, eng = served
    om.begin_native_transaction()
    w1 = om.get_gpo(EX + "w1")
    w1.set_value(EX + "price", Term.integer(99))
    om.rollback_native_transaction()
    assert eng.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "price"), o=Term.integer(10)
    )
    assert om.get_gpo(EX + "w1").get_value(EX + "price").lex == "10"


def test_remote_remove_object_and_invalidation(served):
    om, eng = served
    w1 = om.get_gpo(EX + "w1")
    assert w1.get_value(EX + "madeBy") is not None  # materialize w1
    om.get_gpo(EX + "acme").remove()
    assert not eng.store.has_statement(s=Term.iri(EX + "acme"))
    assert not eng.store.has_statement(o=Term.iri(EX + "acme"))
    # cached linking snapshot dropped, re-materializes over HTTP
    assert w1.get_value(EX + "madeBy") is None
    assert eng.store.has_statement(s=Term.iri(EX + "w1"), p=Term.iri(EX + "name"))


def test_remote_named_roots(served):
    om, _ = served
    om.save(EX + "root", Term.iri(EX + "w1"))
    assert om.recall(EX + "root") == Term.iri(EX + "w1")
    assert om.recall_as_gpo(EX + "root") is om.get_gpo(EX + "w1")
    om.save(EX + "root", Term.iri(EX + "w2"))  # replace
    assert om.recall_as_gpo(EX + "root") is om.get_gpo(EX + "w2")
    assert om.recall(EX + "nope") is None


def test_remote_skins_inherited(served):
    om, eng = served
    s = BasicSkin(om.get_gpo(EX + "w1"))
    assert s.get_string(EX + "name") == "widget one"
    assert s.get_int(EX + "price") == 10
    acme = s.get_gpo(EX + "madeBy")
    assert acme is om.get_gpo(EX + "acme")
    s.set(EX + "active", True)
    s.set(EX + "boss", acme)
    assert s.get_boolean(EX + "active")
    assert eng.store.has_statement(
        s=Term.iri(EX + "w1"), p=Term.iri(EX + "boss"), o=Term.iri(EX + "acme")
    )


def test_remote_evaluate_and_execute(served):
    om, _ = served
    g = om.create_gpo()
    g.set_value(EX + "name", Term.literal("fresh"))
    rows = om.evaluate(f"SELECT ?o WHERE {{ <{g.iri}> <{EX}name> ?o }}")
    assert len(rows) == 1 and rows[0]["o"].lex == "fresh"
    om.execute(f'INSERT DATA {{ <{g.iri}> <{EX}extra> "x" }}')
    assert g.get_value(EX + "extra").lex == "x"  # execute() invalidated


def test_remote_evaluate_graph_ntriples(served):
    om, _ = served
    stmts = om.evaluate_graph(
        f"CONSTRUCT {{ ?s <{EX}madeBy> ?o }} WHERE {{ ?s <{EX}madeBy> ?o }}"
    )
    assert (
        Term.iri(EX + "w1"),
        Term.iri(EX + "madeBy"),
        Term.iri(EX + "acme"),
    ) in stmts
    assert len(stmts) == 2


def test_embedded_and_remote_interoperate(served):
    """One store, two OMs: mutations by each are visible to the other
    (TestRemoteGOM's interop shape)."""
    rom, eng = served
    eom = ObjectManager(eng)
    # embedded writes, remote reads
    eom.get_gpo(EX + "w2").set_value(EX + "name", Term.literal("embedded"))
    assert rom.get_gpo(EX + "w2").get_value(EX + "name").lex == "embedded"
    # remote writes, embedded reads (embedded snapshot must be fresh)
    rom.get_gpo(EX + "w2").set_value(EX + "name", Term.literal("remote"))
    assert (
        ObjectManager(eng).get_gpo(EX + "w2").get_value(EX + "name").lex == "remote"
    )
