"""Configurable geospatial datatypes (reference:
GeoSpatialDatatypeConfiguration / GeoSpatialLiteralExtension) — the
custom-datatype registration surface: JSON field configs, encoded-
domain range filtering, value extraction, correct rejection."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

XY_CFG = (
    '{"config": {"uri": "http://ex/xy", "fields": ['
    '{"valueType":"DOUBLE","multiplier":"1000","serviceMapping":"x"},'
    '{"valueType":"DOUBLE","multiplier":"1000","serviceMapping":"y"}]}}'
)
LLT_CFG = (
    '{"config": {"uri": "http://ex/llt", "fields": ['
    '{"valueType":"DOUBLE","multiplier":"100000","serviceMapping":"LATITUDE"},'
    '{"valueType":"DOUBLE","multiplier":"100000","serviceMapping":"LONGITUDE"},'
    '{"valueType":"LONG","serviceMapping":"TIME"}]}}'
)
GEO = "PREFIX geo: <http://www.bigdata.com/rdf/geospatial#>\n"


@pytest.fixture(scope="module")
def engine(spark):
    trips = [
        (Term.iri("http://a"), Term.iri("http://p"), Term.literal("0.5#0.5", "http://ex/xy"), None),
        (Term.iri("http://b"), Term.iri("http://p"), Term.literal("2#2", "http://ex/xy"), None),
        (Term.iri("http://c"), Term.iri("http://q"), Term.literal("10#20#5", "http://ex/llt"), None),
        (Term.iri("http://d"), Term.iri("http://q"), Term.literal("50#60#9", "http://ex/llt"), None),
    ]
    return SparqlEngine(
        TripleStore.from_python_triples(spark, trips),
        geo_datatype_configs=[XY_CFG, LLT_CFG],
    )


def test_custom_fields_range(engine):
    rows = engine.select(
        GEO + """SELECT ?res ?v WHERE {
          ?res geo:searchDatatype <http://ex/xy> ;
               geo:predicate <http://p> ;
               geo:customFields "x#y" ;
               geo:customFieldsLowerBounds "0#0" ;
               geo:customFieldsUpperBounds "1#1" ;
               geo:customFieldsValues ?v . }"""
    ).df.collect()
    assert [(r["res"]["lex"], r["v"]["lex"]) for r in rows] == [
        ("http://a", "0.5#0.5")
    ]


def test_rectangle_with_time_and_values(engine):
    rows = engine.select(
        GEO + """SELECT ?res ?loc ?t WHERE { SERVICE geo:search {
          ?res geo:search "inRectangle" ;
               geo:searchDatatype <http://ex/llt> ;
               geo:predicate <http://q> ;
               geo:spatialRectangleSouthWest "0#0" ;
               geo:spatialRectangleNorthEast "30#30" ;
               geo:timeStart "0" ; geo:timeEnd "6" ;
               geo:locationValue ?loc ; geo:timeValue ?t . } }"""
    ).df.collect()
    assert len(rows) == 1
    assert rows[0]["loc"]["lex"] == "10.0#20.0"
    assert rows[0]["t"]["lex"] == "5"


def test_under_constrained_time_rejected(engine):
    with pytest.raises(Exception, match="timeStart and timeEnd"):
        engine.select(
            GEO + """SELECT ?res WHERE { SERVICE geo:search {
              ?res geo:search "inRectangle" ;
                   geo:searchDatatype <http://ex/llt> ;
                   geo:predicate <http://q> ;
                   geo:spatialRectangleSouthWest "0#0" ;
                   geo:spatialRectangleNorthEast "30#30" . } }"""
        ).df.collect()


def test_unregistered_datatype_rejected(engine):
    with pytest.raises(Exception, match="not a registered"):
        engine.select(
            GEO + """SELECT ?res WHERE { SERVICE geo:search {
              ?res geo:search "inRectangle" ;
                   geo:searchDatatype <http://ex/nope> ;
                   geo:spatialRectangleSouthWest "0#0" ;
                   geo:spatialRectangleNorthEast "1#1" . } }"""
        ).df.collect()


WKT_CFG = (
    '{"config": {"uri": "http://ex/wkt", '
    '"literalSerializer": "com.bigdata.rdf.sparql.ast.eval.service.'
    'GeoSpatialTestWKTLiteralSerializer", "fields": ['
    '{"valueType":"DOUBLE","multiplier":"1000000","serviceMapping":"LATITUDE"},'
    '{"valueType":"DOUBLE","multiplier":"100000","serviceMapping":"LONGITUDE"}]}}'
)


def test_custom_literal_serializer(spark):
    """IGeoSpatialLiteralSerializer surface: a datatype config naming a
    registered serializer parses Point(lat,lon) literals, filters in
    the encoded domain, and emits locationValue back through the
    serializer (typed with the geo datatype)."""
    from database_spark.search.geospatial import canonicalize_literal_lex, geo_registry

    trips = [
        (Term.iri("http://a"), Term.iri("http://p"),
         Term.literal("Point(0.5,1.0)", "http://ex/wkt"), None),
        (Term.iri("http://b"), Term.iri("http://p"),
         Term.literal("Point(5.0,5.0)", "http://ex/wkt"), None),
    ]
    eng = SparqlEngine(
        TripleStore.from_python_triples(spark, trips),
        geo_datatype_configs=[WKT_CFG],
    )
    res = eng.select(GEO + """
        SELECT ?s ?loc WHERE {
          SERVICE geo:search {
            ?s geo:searchDatatype <http://ex/wkt> .
            ?s geo:search "inRectangle" .
            ?s geo:predicate <http://p> .
            ?s geo:spatialRectangleSouthWest "0#0" .
            ?s geo:spatialRectangleNorthEast "2#2" .
            ?s geo:locationValue ?loc .
          }
        }""")
    rows = res.df.collect()
    assert [r["s"]["lex"] for r in rows] == ["http://a"]
    assert rows[0]["loc"]["lex"] == "Point(0.5,1.0)"
    # canonicalization round-trips through the serializer
    reg = geo_registry([WKT_CFG], include_builtins=False)
    assert canonicalize_literal_lex("Point(2,3)", reg["http://ex/wkt"]) == "Point(2.0,3.0)"
