from pyspark.sql import functions as F

from database_spark import terms as T
from database_spark.store import RdfMapping, TripleStore, rdfize


def test_term_id_identity_and_distinctness(spark):
    from pyspark.sql.types import StructField, StructType

    df = spark.createDataFrame(
        [
            (T.Term.iri("urn:a").as_row(),),
            (T.Term.literal("urn:a").as_row(),),  # literal with same lex != iri
            (T.Term.literal("5", T.XSD_INTEGER).as_row(),),
            (T.Term.literal("5", T.XSD + "int").as_row(),),  # different datatype
            (T.Term.literal("chat", lang="fr").as_row(),),
            (T.Term.literal("chat").as_row(),),
        ],
        schema=StructType([StructField("t", T.TERM_TYPE, False)]),
    )
    ids = [r[0] for r in df.select(T.term_id(F.col("t"))).collect()]
    assert len(set(ids)) == 6  # all six are distinct terms

    # same term built twice hashes identically
    a = df.select(T.term_id(T.lit_term(T.Term.iri("urn:a")))).head()[0]
    assert a == ids[0]


def test_store_from_python_and_pattern_count(spark):
    ex = "http://example.org/"
    trips = [
        (T.Term.iri(ex + "alice"), T.Term.iri(ex + "knows"), T.Term.iri(ex + "bob")),
        (T.Term.iri(ex + "bob"), T.Term.iri(ex + "knows"), T.Term.iri(ex + "carol")),
        (T.Term.iri(ex + "alice"), T.Term.iri(ex + "age"), T.Term.integer(42)),
    ]
    st = TripleStore.from_python_triples(spark, trips)
    assert st.df.count() == 3
    assert st.count_pattern(p=T.Term.iri(ex + "knows")) == 2
    assert st.count_pattern(s=T.Term.iri(ex + "alice")) == 2
    terms = st.terms()
    assert terms.count() == 6  # alice bob carol knows age 42


def test_rdfize_tpch_nation(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    m = RdfMapping(
        subject_key="n_nationkey",
        subject_prefix="urn:nation:",
        predicates={
            "n_name": "urn:tpch:n_name",
            "n_regionkey": "urn:tpch:n_regionkey->urn:region:",
        },
        type_iri="urn:tpch:Nation",
    )
    df = rdfize(spark, nation, m)
    st = TripleStore.from_term_structs(spark, df)
    n = nation.count()
    assert st.df.count() == 3 * n
    assert st.count_pattern(p=T.Term.iri("urn:tpch:n_name")) == n
