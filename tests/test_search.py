"""Full-text (bds:search) + geospatial (geo:search) service tests
(reference: BDS.java / GeoSpatial.java magic-predicate services)."""

import pytest

from database_spark import terms as T
from database_spark.search.geospatial import LATLON_DT, make_point
from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "http://example.org/"


@pytest.fixture(scope="module")
def engine(spark):
    label, loc = Term.iri(EX + "label"), Term.iri(EX + "loc")
    trips = [
        (Term.iri(EX + "a"), label, Term.literal("the quick brown fox")),
        (Term.iri(EX + "b"), label, Term.literal("lazy brown dog")),
        (Term.iri(EX + "c"), label, Term.literal("quick silver surfer")),
        (Term.iri(EX + "d"), label, Term.literal("nothing relevant here")),
        # points: Paris-ish, London-ish, Tokyo-ish
        (Term.iri(EX + "paris"), loc, make_point(48.85, 2.35)),
        (Term.iri(EX + "london"), loc, make_point(51.50, -0.12)),
        (Term.iri(EX + "tokyo"), loc, make_point(35.68, 139.69)),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    return SparqlEngine(TripleStore(spark, store.df.localCheckpoint()))


def lexes(res, var):
    return sorted(
        r[var]["lex"] for r in res.df.collect() if r[var] is not None
    )


def test_bds_search_any_term(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?s ?lit WHERE {{
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search "quick brown" .
          }}
          ?s ex:label ?lit .
        }}""")
    assert lexes(res, "s") == [EX + "a", EX + "b", EX + "c"]


def test_bds_search_match_all_and_relevance(engine):
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?s ?score WHERE {{
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search "quick brown" ;
                 bds:matchAllTerms "true" ;
                 bds:relevance ?score .
          }}
          ?s ex:label ?lit .
        }}""")
    rows = res.df.collect()
    assert lexes(res, "s") == [EX + "a"]
    # reference cosine: both query tokens match "the quick brown fox"
    # (4 tokens, dw = byte315(1/2) = 0.5 each; qw = 1/sqrt(2))
    import math

    assert abs(float(rows[0]["score"]["lex"]) - 2 * 0.5 / math.sqrt(2)) < 1e-12


def test_bds_min_relevance_filters(engine):
    res = engine.select(f"""
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?lit WHERE {{
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search "quick brown fox" ; bds:minRelevance "0.6" .
          }}
        }}""")
    assert lexes(res, "lit") == ["the quick brown fox"]


def test_geo_rectangle(engine):
    # box around western Europe: catches Paris + London, not Tokyo
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        SELECT ?s WHERE {{
          SERVICE <http://www.bigdata.com/rdf/geospatial#search> {{
            ?s geo:search "inRectangle" ;
               geo:predicate ex:loc ;
               geo:spatialRectangleSouthWest "40.0#-5.0" ;
               geo:spatialRectangleNorthEast "55.0#10.0" .
          }}
        }}""")
    assert lexes(res, "s") == [EX + "london", EX + "paris"]


def test_geo_circle(engine):
    # 500 km around Paris: London yes (~344 km), Tokyo no
    res = engine.select(f"""
        PREFIX ex: <{EX}>
        PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>
        SELECT ?s ?where WHERE {{
          SERVICE <http://www.bigdata.com/rdf/geospatial#search> {{
            ?s geo:search "inCircle" ;
               geo:predicate ex:loc ;
               geo:spatialCircleCenter "48.85#2.35" ;
               geo:spatialCircleRadius "500.0" ;
               geo:locationValue ?where .
          }}
        }}""")
    assert lexes(res, "s") == [EX + "london", EX + "paris"]
    assert len(lexes(res, "where")) == 2


def test_geo_point_datatype_roundtrip():
    p = make_point(10.5, -20.25)
    assert p.dt == LATLON_DT and p.lex == "10.5#-20.25"


def test_fulltext_index_shape(spark, engine):
    from database_spark.search.fulltext import text_index

    idx = text_index(engine.store.df)
    toks = {r["token"] for r in idx.collect()}
    assert {"quick", "brown", "fox", "lazy", "dog"} <= toks
    # geo literals (typed, non-string) must NOT be tokenized
    assert not any("#" in t for t in toks)


def test_reference_child_proofing_cosines(spark):
    """The reference's own scoring fixture (bigdata-core-test
    TestSearch.test_ChildProofing): query "child proofing" over the
    seven Berry & Browne book titles must reproduce the exact expected
    cosines — doc weights tf-normalized then byte315-quantized, query
    weights exact."""
    from database_spark.search.fulltext import search_literals

    docs = [
        "Infant Toddler",
        "Bab Child Home",
        "Child Safety Home",
        "Bab Health Safety Infant Toddler",
        "Bab Proofing",
        "Guide Proofing",
        "Bab Guide",
    ]
    label = Term.iri(EX + "label")
    trips = [
        (Term.iri(f"{EX}book{i+1}"), label, Term.literal(d))
        for i, d in enumerate(docs)
    ]
    store = TripleStore.from_python_triples(spark, trips)
    hits = search_literals(store.df, "child proofing")
    got = sorted(
        (r["lit"]["lex"], r["relevance"]) for r in hits.collect()
    )
    want = {
        "Bab Proofing": 0.44194173824159216,
        "Guide Proofing": 0.44194173824159216,
        "Bab Child Home": 0.35355339059327373,
        "Child Safety Home": 0.35355339059327373,
    }
    assert dict(got) == want


def test_prefix_match_scoring(spark):
    """'mi*' prefix-matches every token starting with 'mi'; a
    single-token query has qw = 1.0, so an exact one-token literal
    scores byte315(1.0) = 1.0 (TCK search-1 expectation)."""
    from database_spark.search.fulltext import search_literals

    label = Term.iri(EX + "label")
    trips = [
        (Term.iri(EX + "Mike"), label, Term.literal("Mike")),
        (Term.iri(EX + "Bryan"), label, Term.literal("Bryan")),
        (Term.iri(EX + "MikePersonick"), label, Term.literal("Mike Personick")),
    ]
    store = TripleStore.from_python_triples(spark, trips)
    got = {
        r["lit"]["lex"]: r["relevance"]
        for r in search_literals(store.df, "mi*").collect()
    }
    assert got["Mike"] == 1.0
    assert abs(got["Mike Personick"] - 0.625) < 1e-12  # byte315(1/sqrt 2)
    assert "Bryan" not in got


def test_as_bound_service_params(engine):
    """As-bound SERVICE parameters: an input param bound by a preceding
    BIND (const_env path) or by a preceding pattern (driver-side
    distinct-value expansion) is injected into the service call
    (reference: as-bound SERVICE evaluation —
    geo-customfields-bindinginjection fixtures)."""
    res = engine.select(f"""
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?lit WHERE {{
          BIND("0.6" AS ?minRel)
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search "quick brown fox" ; bds:minRelevance ?minRel .
          }}
        }}""")
    assert lexes(res, "lit") == ["the quick brown fox"]


def test_as_bound_service_param_from_pattern(spark):
    label = Term.iri(EX + "label")
    qp = Term.iri(EX + "queryString")
    trips = [
        (Term.iri(EX + "a"), label, Term.literal("alpha beta")),
        (Term.iri(EX + "b"), label, Term.literal("gamma delta")),
        (Term.iri(EX + "cfg"), qp, Term.literal("gamma")),
    ]
    eng = SparqlEngine(TripleStore.from_python_triples(spark, trips))
    res = eng.select(f"""
        PREFIX ex: <{EX}>
        PREFIX bds: <http://www.bigdata.com/rdf/search#>
        SELECT ?lit WHERE {{
          ex:cfg ex:queryString ?q .
          SERVICE <http://www.bigdata.com/rdf/search#search> {{
            ?lit bds:search ?q .
          }}
        }}""")
    got = lexes(res, "lit")
    # the config literal "gamma" matches itself too — fine; the point
    # is that the pattern-bound query string reached the service
    assert "gamma delta" in got and "alpha beta" not in got
