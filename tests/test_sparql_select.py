"""End-to-end SPARQL engine tests over a small hand-built graph
(mirrors the reference's data-driven eval tests, SURVEY §5.1)."""

import pytest

from database_spark import terms as T
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


def iri(x):
    return Term.iri(EX + x)


@pytest.fixture(scope="module")
def engine(spark):
    knows, age, name, mbox, typ = (
        iri("knows"), iri("age"), iri("name"), iri("mbox"),
        Term.iri(T.RDF + "type"),
    )
    person = iri("Person")
    trips = [
        (iri("alice"), typ, person),
        (iri("alice"), name, Term.literal("Alice")),
        (iri("alice"), age, Term.integer(30)),
        (iri("alice"), knows, iri("bob")),
        (iri("alice"), mbox, Term.literal("alice@example.org")),
        (iri("bob"), typ, person),
        (iri("bob"), name, Term.literal("Bob")),
        (iri("bob"), age, Term.integer(25)),
        (iri("bob"), knows, iri("carol")),
        (iri("carol"), typ, person),
        (iri("carol"), name, Term.literal("Carol")),
        (iri("carol"), age, Term.integer(35)),
        (iri("dave"), typ, person),
        (iri("dave"), name, Term.literal("Dave")),
        # dave has no age, knows nobody
        # named graph data
        (iri("eve"), name, Term.literal("Eve"), iri("g1")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    store = TripleStore(spark, store.df.localCheckpoint())
    return SparqlEngine(store)


def rows(res):
    """[(lex, lex, ...)] sorted, from a SelectResult."""
    out = []
    for r in res.df.collect():
        out.append(tuple((r[v]["lex"] if r[v] is not None else None) for v in res.vars))
    return sorted(out, key=lambda t: tuple("" if x is None else x for x in t))


def test_bgp_join_filter(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?fn WHERE {{
          ?p ex:knows ?f . ?p ex:name ?n . ?f ex:name ?fn .
          FILTER(?fn != "Carol")
        }}""")
    assert rows(res) == [("Alice", "Bob")]


def test_filter_numeric_and_error_as_false(engine):
    # ?age > 26: dave has no age → pattern absent; name > number = type
    # error → false (row dropped, not crash)
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ ?p ex:name ?n . ?p ex:age ?a . FILTER(?a > 26) }}""")
    assert rows(res) == [("Alice",), ("Carol",)]
    res2 = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ ?p ex:name ?n . FILTER(?n > 26) }}""")
    assert rows(res2) == []


def test_optional_and_bound(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?m WHERE {{
          ?p a ex:Person ; ex:name ?n .
          OPTIONAL {{ ?p ex:mbox ?m }}
        }}""")
    got = rows(res)
    assert ("Alice", "alice@example.org") in got
    assert ("Dave", None) in got and len(got) == 4


def test_optional_filter_scoping(engine):
    # filter inside OPTIONAL references outer var: must be part of the
    # left join condition, not a post-filter (SURVEY §4.4 item 8)
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?a WHERE {{
          ?p ex:name ?n .
          OPTIONAL {{ ?p ex:age ?a FILTER(?a > 28) }}
        }}""")
    got = dict(rows(res))
    assert got["Alice"] == "30" and got["Bob"] is None and got["Carol"] == "35"


def test_union(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{
          {{ ?x ex:age 30 }} UNION {{ ?x ex:age 25 }}
        }}""")
    assert rows(res) == [(EX + "alice",), (EX + "bob",)]


def test_minus(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?p a ex:Person ; ex:name ?n .
          MINUS {{ ?p ex:knows ?q }}
        }}""")
    assert rows(res) == [("Carol",), ("Dave",)]


def test_bind_and_expr(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n ?a2 WHERE {{
          ?p ex:name ?n ; ex:age ?a .
          BIND(?a * 2 AS ?a2)
          FILTER(?a2 >= 60)
        }}""")
    assert rows(res) == [("Alice", "60"), ("Carol", "70")]


def test_values(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          VALUES ?n {{ "Alice" "Dave" "Nobody" }}
          ?p ex:name ?n .
        }}""")
    assert rows(res) == [("Alice",), ("Dave",)]


def test_exists_not_exists(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?p a ex:Person ; ex:name ?n .
          FILTER NOT EXISTS {{ ?p ex:knows ?q }}
        }}""")
    assert rows(res) == [("Carol",), ("Dave",)]
    res2 = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?p a ex:Person ; ex:name ?n .
          FILTER EXISTS {{ ?p ex:age ?a }}
        }}""")
    assert rows(res2) == [("Alice",), ("Bob",), ("Carol",)]


def test_aggregates(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT (COUNT(*) AS ?c) (SUM(?a) AS ?s) (AVG(?a) AS ?avg)
               (MIN(?a) AS ?mn) (MAX(?a) AS ?mx)
        WHERE {{ ?p ex:age ?a }}""")
    r = res.df.collect()[0]
    assert r["c"]["lex"] == "3"
    assert r["s"]["lex"] == "90"
    assert float(r["avg"]["lex"]) == 30.0
    assert r["mn"]["lex"] == "25" and r["mx"]["lex"] == "35"


def test_group_by_having(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?p (COUNT(?f) AS ?nf) WHERE {{ ?p ex:knows ?f }}
        GROUP BY ?p HAVING (COUNT(?f) >= 1)""")
    got = rows(res)
    assert got == [(EX + "alice", "1"), (EX + "bob", "1")]


def test_order_limit_offset(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ ?p ex:name ?n . ?p a ex:Person }}
        ORDER BY DESC(?n) LIMIT 2 OFFSET 1""")
    vals = [r["n"]["lex"] for r in res.df.collect()]
    assert vals == ["Carol", "Bob"]


def test_distinct(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT DISTINCT ?t WHERE {{ ?p a ?t }}""")
    assert rows(res) == [(EX + "Person",)]


def test_property_path_plus(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}alice> ex:knows+ ?x }}""")
    assert rows(res) == [(EX + "bob",), (EX + "carol",)]


def test_property_path_star_and_seq(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}alice> ex:knows* ?x }}""")
    assert rows(res) == [(EX + "alice",), (EX + "bob",), (EX + "carol",)]
    res2 = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ <{EX}alice> ex:knows/ex:name ?n }}""")
    assert rows(res2) == [("Bob",)]


def test_path_alternative_and_inverse(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ ?x (ex:mbox|ex:age) ?y . }}""")
    assert sorted(set(rows(res))) == [(EX + "alice",), (EX + "bob",), (EX + "carol",)]
    res2 = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?x WHERE {{ <{EX}bob> ^ex:knows ?x }}""")
    assert rows(res2) == [(EX + "alice",)]


def test_graph_pattern(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?g ?n WHERE {{ GRAPH ?g {{ ?p ex:name ?n }} }}""")
    assert rows(res) == [(EX + "g1", "Eve")]


def test_subselect(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{
          ?p ex:name ?n .
          {{ SELECT ?p WHERE {{ ?p ex:age ?a }} ORDER BY DESC(?a) LIMIT 1 }}
        }}""")
    assert rows(res) == [("Carol",)]


def test_string_functions(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?u WHERE {{
          ?p ex:name ?n . FILTER(STRSTARTS(?n, "A"))
          BIND(UCASE(?n) AS ?u)
        }}""")
    assert rows(res) == [("ALICE",)]


def test_ask_and_construct(engine):
    assert engine.ask(f'PREFIX ex: <{EX}> ASK {{ ?p ex:age 30 }}') is True
    assert engine.ask(f'PREFIX ex: <{EX}> ASK {{ ?p ex:age 99 }}') is False
    g = engine.construct(f"""
        PREFIX ex: <{EX}>
        CONSTRUCT {{ ?p ex:knownBy ?q }} WHERE {{ ?q ex:knows ?p }}""")
    got = sorted((r["st"]["lex"], r["ot"]["lex"]) for r in g.collect())
    assert got == [(EX + "bob", EX + "alice"), (EX + "carol", EX + "bob")]


def test_describe(engine):
    g = engine.describe(f"DESCRIBE <{EX}dave>")
    preds = sorted(r["pt"]["lex"] for r in g.collect())
    assert preds == sorted([T.RDF + "type", EX + "name"])


def test_bottom_up_badly_designed_left_join(spark):
    """SPARQL's trickiest corner (ASTBottomUpOptimizer, SURVEY §4.4):
    a FILTER in a doubly-nested OPTIONAL referencing a variable bound
    only at top level is out of scope there — evaluates as
    error→false, so the inner optional never binds."""
    trips = [
        (iri("x1"), iri("p"), Term.integer(1)),
        (iri("x2"), iri("p"), Term.integer(2)),
        (iri("x3"), iri("q"), Term.integer(3)),
        (iri("x3"), iri("q"), Term.integer(4)),
    ]
    from database_spark.store import TripleStore as TS

    eng = SparqlEngine(TS.from_python_triples(spark, trips))
    res = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?v ?w ?v2 WHERE {{
          ex:x1 ex:p ?v .
          OPTIONAL {{ ex:x3 ex:q ?w .
                      OPTIONAL {{ ex:x2 ex:p ?v2 . FILTER(?v = 99) }} }}
        }}""")
    assert rows(res) == [("1", "3", None), ("1", "4", None)]


def test_min_max_cross_type_and_group_concat(spark):
    """MIN/MAX use SPARQL value order across numeric datatypes
    (IVComparator semantics), not per-type ordering; GROUP_CONCAT
    honors SEPARATOR; REGEX honors the 'i' flag."""
    from database_spark.store import TripleStore as TS

    trips = [
        (iri("a"), iri("v"), Term.integer(2)),
        (iri("b"), iri("v"), Term.double(1.5)),
        (iri("c"), iri("v"), Term.decimal("3.25")),
        (iri("a"), iri("nm"), Term.literal("Apple")),
        (iri("b"), iri("nm"), Term.literal("banana")),
    ]
    eng = SparqlEngine(TS.from_python_triples(spark, trips))
    r = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT (MIN(?x) AS ?mn) (MAX(?x) AS ?mx) WHERE {{ ?s ex:v ?x }}
    """).df.collect()[0]
    assert r["mn"]["lex"] == "1.5" and r["mn"]["dt"] == T.XSD_DOUBLE
    assert r["mx"]["lex"] == "3.25" and r["mx"]["dt"] == T.XSD_DECIMAL
    r2 = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT ?n WHERE {{ ?s ex:nm ?n FILTER(REGEX(?n, "^a", "i")) }}""")
    assert rows(r2) == [("Apple",)]
    r3 = eng.select(f"""
        PREFIX ex: <{EX}>
        SELECT (GROUP_CONCAT(?n; SEPARATOR="|") AS ?g) WHERE {{ ?s ex:nm ?n }}
    """).df.collect()[0]
    assert sorted(r3["g"]["lex"].split("|")) == ["Apple", "banana"]


def test_describe_modes(spark):
    """DescribeModeEnum.java:47-127: ForwardOneStep omits reverse
    statements; SCBD = CBD + reverse arcs expanded through bnode
    subjects; hint:describeMode selects the mode in-query."""
    from database_spark.store import TripleStore as TS

    b1, b2 = Term.bnode("b1"), Term.bnode("b2")
    trips = [
        (iri("d"), iri("p"), b1),
        (b1, iri("q"), Term.integer(1)),          # CBD reaches via bnode
        (iri("up"), iri("r"), iri("d")),          # reverse arc
        (b2, iri("s"), iri("d")),                 # reverse bnode subject
        (iri("x"), iri("t"), b2),                 # SCBD reaches via b2
        (iri("other"), iri("p"), Term.integer(9)),
    ]
    eng = SparqlEngine(TS.from_python_triples(spark, trips))

    def preds(df):
        return sorted(r["pt"]["lex"].rsplit("/", 1)[-1] for r in df.collect())

    assert preds(eng.describe(f"DESCRIBE <{EX}d>", mode="forward")) == ["p"]
    assert preds(eng.describe(f"DESCRIBE <{EX}d>")) == ["p", "r", "s"]
    assert preds(eng.describe(f"DESCRIBE <{EX}d>", mode="cbd")) == ["p", "q"]
    assert preds(eng.describe(f"DESCRIBE <{EX}d>", mode="scbd")) == [
        "p", "q", "r", "s", "t"
    ]
    # the reference's query-hint surface (QueryHints.DESCRIBE_MODE)
    hinted = eng.describe(f"""
        PREFIX hint: <http://www.bigdata.com/queryHints#>
        DESCRIBE <{EX}d> WHERE {{ hint:Query hint:describeMode "CBD" }}""")
    assert preds(hinted) == ["p", "q"]
