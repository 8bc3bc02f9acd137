"""bd:values / bd:slice / bd:sample utility SERVICEs (reference:
ValuesServiceFactory.java, SliceServiceFactory.java,
SampleServiceFactory.java)."""

import pytest

from database_spark.sparql.engine import SparqlEngine
from database_spark.store import TripleStore
from database_spark.terms import Term

EX = "urn:ex:"
BD = "http://www.bigdata.com/rdf#"


@pytest.fixture(scope="module")
def engine(spark):
    name = Term.iri(EX + "name")
    trips = [
        (Term.iri(EX + f"s{i}"), name, Term.literal(f"n{i}")) for i in range(10)
    ]
    return SparqlEngine(TripleStore.from_python_triples(spark, trips))


def test_bd_values_binds_var(engine):
    res = engine.select(f"""
        PREFIX bd: <{BD}>
        SELECT ?s ?nm WHERE {{
          SERVICE bd:values {{
            bd:serviceParam bd:values.var ?nm .
            bd:serviceParam bd:values.val "n1" .
            bd:serviceParam bd:values.val "n3" .
          }}
          ?s <{EX}name> ?nm .
        }}""")
    got = sorted(r["s"]["lex"] for r in res.df.collect())
    assert got == [EX + "s1", EX + "s3"]


def test_bd_slice_offset_limit(engine):
    res = engine.select(f"""
        PREFIX bd: <{BD}>
        SELECT ?s ?nm WHERE {{
          SERVICE bd:slice {{
            ?s <{EX}name> ?nm .
            bd:serviceParam bd:slice.offset 2 .
            bd:serviceParam bd:slice.limit 3 .
          }}
        }}""")
    rows = res.df.collect()
    assert len(rows) == 3
    # a different slice of the same deterministic order is disjoint
    res2 = engine.select(f"""
        PREFIX bd: <{BD}>
        SELECT ?s ?nm WHERE {{
          SERVICE bd:slice {{
            ?s <{EX}name> ?nm .
            bd:serviceParam bd:slice.offset 5 .
            bd:serviceParam bd:slice.limit 3 .
          }}
        }}""")
    a = {r["s"]["lex"] for r in rows}
    b = {r["s"]["lex"] for r in res2.df.collect()}
    assert len(b) == 3 and not (a & b)


def test_bd_slice_range_count(engine):
    res = engine.select(f"""
        PREFIX bd: <{BD}>
        SELECT ?n WHERE {{
          SERVICE bd:slice {{
            ?s <{EX}name> ?nm .
            bd:serviceParam bd:slice.range ?n .
          }}
        }}""")
    rows = res.df.collect()
    assert len(rows) == 1 and rows[0]["n"]["lex"] == "10"


def test_bd_sample_seeded_and_bounded(engine):
    q = f"""
        PREFIX bd: <{BD}>
        SELECT ?s WHERE {{
          SERVICE bd:sample {{
            ?s <{EX}name> ?nm .
            bd:serviceParam bd:sample.limit 4 .
            bd:serviceParam bd:sample.seed 7 .
          }}
        }}"""
    a = sorted(r["s"]["lex"] for r in engine.select(q).df.collect())
    b = sorted(r["s"]["lex"] for r in engine.select(q).df.collect())
    assert len(a) == 4 and a == b  # reproducible for a fixed seed
    c = sorted(
        r["s"]["lex"]
        for r in engine.select(q.replace("seed 7", "seed 8")).df.collect()
    )
    assert len(c) == 4 and c != a  # a different seed samples differently
    dense = sorted(
        r["s"]["lex"]
        for r in engine.select(
            q.replace("bd:sample.seed 7 .",
                      'bd:sample.seed 7 . bd:serviceParam bd:sample.sampleType "DENSE" .')
        ).df.collect()
    )
    assert len(dense) == 4
