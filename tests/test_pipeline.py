"""Pipeline operators: dedup / similarity / text / multimodal.

Includes DuckDB cross-checks that mirror the driver's oracle harness
(same parquet in, order-insensitive value comparison).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from database_spark.pipeline import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_vs_duckdb(docs):
    kept = dedup.dedup_exact(docs, "doc_id", "text")
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
                WHERE doc_id IN (
                  SELECT min(doc_id) FROM read_parquet('{SF}/documents.parquet')
                  GROUP BY md5(text))"""
        ).fetchall()
    )
    assert got == want and len(got) <= docs.count()


def test_ngram_jaccard_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert set(got) == {(1, 2)}
    # 7 shingles each, 6 shared (only the final shingle differs) → 6/8
    assert got[(1, 2)] == pytest.approx(6 / 8, abs=1e-6)


def test_ngram_jaccard_max_df_consistent(spark):
    """When max_df drops a stop-shingle, sizes must be computed over the
    surviving shingles too — Jaccard is over the non-stop universe
    (ADVICE r1: sizes were counted pre-filter → biased low)."""
    stop = "aa bb cc"  # one shared shingle across ALL docs → df=3 > max_df=2
    rows = [
        (1, f"{stop} xx yy zz ww"),
        (2, f"{stop} xx yy zz vv"),
        (3, f"{stop} q1 q2 q3 q4"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.5, max_df=2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # docs 1,2: 4 surviving shingles each ('aa bb cc' dropped), 3 common
    # → 3/5 = 0.6.  With the old pre-filter sizes (5 each) this was
    # 3/7 ≈ 0.43 < 0.5 → the pair was silently dropped.
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == pytest.approx(3 / 5, abs=1e-6)


def test_ngram_jaccard_no_cap_uses_self_join(spark):
    """max_df=None must fall back to the self-join pair shape: the
    posting-list path's collect_list would be UNBOUNDED per-group
    state without the cap (one viral shingle OOMs an executor; the
    self-join just emits more rows) — advice r8.  Same results."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    capped = dedup.ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.3)
    uncapped = dedup.ngram_jaccard_pairs(
        df, "id", "text", n=3, threshold=0.3, max_df=None
    )
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in uncapped.collect()}
    assert got == want
    plan = uncapped._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


def test_minhash_lsh_recall(docs):
    """LSH candidates (verified) must find the high-similarity pairs
    that exact all-pairs Jaccard finds."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", 3, num_hashes=64, bands=16, threshold=0.8
        ).collect()
    }
    assert lsh <= exact or exact == set()  # verify step guarantees precision
    if exact:
        assert len(lsh) >= 0.9 * len(exact)  # banded recall at s>=0.8


def test_simhash_values_and_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base),  # exact duplicate → hamming 0
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    sh = {r["id"]: r["sh"] for r in df.select("id", dedup.simhash(F.col("text")).alias("sh")).collect()}
    assert sh[1] == sh[2] != sh[3]
    ham13 = bin((sh[1] ^ sh[3]) & (2**64 - 1)).count("1")
    assert ham13 > 3  # unrelated docs are far apart
    pairs = dedup.simhash_near_pairs(df, "id", "text", max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got == {(1, 2): 0}


def test_cosine_pairs_vs_duckdb(embs):
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_similar_pairs(embs, "vec_id", "embedding", 0.95).collect()
    }
    want = {
        (a, b): c
        for a, b, c in duckdb.sql(
            f"""SELECT * FROM (
                  SELECT a.vec_id ia, b.vec_id ib,
                     round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) c
                  FROM read_parquet('{SF}/embeddings.parquet') a,
                       read_parquet('{SF}/embeddings.parquet') b
                  WHERE a.vec_id < b.vec_id) WHERE c >= 0.95"""
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_cosine_topk(embs):
    q = embs.limit(3)
    res = similarity.cosine_topk(embs, q, "vec_id", "embedding", "vec_id", "embedding", k=5)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        # self is always rank 1 with cos 1.0
        first = min(rs, key=lambda r: r["rank"])
        assert first["neighbor_id"] == qid and first["cos"] == pytest.approx(1.0)


def test_ivf_topk_recall(embs):
    q = embs.limit(5)
    exact = similarity.cosine_topk(embs, q, "vec_id", "embedding", "vec_id", "embedding", k=3)
    approx = similarity.ivf_topk(
        embs, q, "vec_id", "embedding", "vec_id", "embedding", k=3, n_cells=8, n_probe=4
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & e) >= 0.5 * len(e)  # recall floor for the approx path


def test_text_metrics_vs_duckdb(docs):
    out = docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.lang_id(F.col("text")).alias("lang_guess"),
        text.quality_score(F.col("text")).alias("quality"),
        text.fingerprint(F.col("text")).alias("fp"),
    )
    got = {r["doc_id"]: r for r in out.collect()}
    want = duckdb.sql(
        f"""SELECT doc_id,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) n,
               md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) fp
            FROM read_parquet('{SF}/documents.parquet')"""
    ).fetchall()
    for doc_id, n, fp in want:
        assert got[doc_id]["n_tokens"] == n
        assert got[doc_id]["fp"] == fp
    assert all(0.0 <= r["quality"] <= 1.0 for r in got.values())
    langs = {r["lang_guess"] for r in got.values()}
    assert "en" in langs


def test_multimodal_plumbing(spark):
    rows = [
        (1, b"\x89PNGfakebytes", ("image/png", 640, 480, None)),
        (2, b"RIFFfakewav", ("audio/wav", None, None, 4500)),
        (3, b"\x00\x00ftypmp4", ("video/mp4", 1920, 1080, 3200)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    imgs = multimodal.filter_by_meta(df, mime_prefix="image/", min_width=600)
    assert [r["asset_id"] for r in imgs.collect()] == [1]
    feats = multimodal.extract_features(df, dim=8, fake=True).collect()
    assert len(feats) == 3 and all(len(r["feature"]) == 8 for r in feats)
    # determinism of the stub
    feats2 = multimodal.extract_features(df, dim=8, fake=True).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    frames = multimodal.sample_frames(df, every_ms=1000).collect()
    got = {(r["asset_id"], r["frame_no"]) for r in frames}
    assert got == {(2, 0), (2, 1), (2, 2), (2, 3), (3, 0), (3, 1), (3, 2)}
    # real decode path: undecodable bytes → null feature, job survives
    real = {r["asset_id"]: r["feature"] for r in multimodal.extract_features(df, dim=8).collect()}
    assert real[2] is None and real[3] is None


def test_multimodal_real_decode(spark):
    """Real PNG decode → features → resize, via the in-repo codec
    (stdlib+numpy; Pillow only needed for JPEG-class formats)."""
    import numpy as np

    from database_spark.pipeline.media_codec import decode_png, encode_png

    rng = np.random.RandomState(3)
    img_a = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
    img_b = np.full((6, 6, 3), 200, dtype=np.uint8)
    rows = [
        (1, bytes(encode_png(img_a)), ("image/png", 9, 12, None)),
        (2, bytes(encode_png(img_b)), ("image/png", 6, 6, None)),
        (3, b"garbage-not-an-image", ("image/png", 1, 1, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    feats = {r["asset_id"]: r["feature"] for r in multimodal.extract_features(df, dim=16).collect()}
    assert len(feats[1]) == 16
    # img_b is uniform gray 200/255 → channel means ≈ 0.784, stds ≈ 0
    # (float32 epsilon, not exact zero)
    assert abs(feats[2][3] - 200 / 255) < 1e-6 and feats[2][6] < 1e-6
    assert feats[3] is None  # bad row → null, not a crashed job

    resized = {r["asset_id"]: r["content"] for r in multimodal.resize_images(df, 4, 5).collect()}
    out = decode_png(bytes(resized[1]))
    assert out.shape == (5, 4, 3)
    assert resized[3] is None


def test_near_dup_clusters(spark):
    """Pairs → components → canonical representative (longest text,
    smallest-id tiebreak); singletons keep themselves."""
    import pandas as pd

    from database_spark.pipeline.dedup import near_dup_clusters

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog today",
                "the quick brown fox jumps over the lazy dog today!!",
                "the quick brown fox jumps over the lazy dog today extra",
                "completely different content about spark dataframes here",
            ],
        }
    )
    df = spark.createDataFrame(docs)
    out = {
        r["id"]: (r["cluster"], r["keep"])
        for r in near_dup_clusters(df, "doc_id", "text").collect()
    }
    # 1,2,3 cluster together under min id 1; 3 has the longest text
    assert out[1] == (1, False)
    assert out[2] == (1, False)
    assert out[3] == (1, True)
    # 4 is a singleton and keeps itself
    assert out[4] == (4, True)


def test_lsh_multiprobe_recall_compensates_extra_planes(spark):
    """Advice r8: scaling plane count with corpus size silently drops
    LSH recall unless compensated.  Validate against EXACT ground
    truth: on a deterministic clustered corpus, the scaled config
    (extra planes + Hamming-1 multiprobe — what `_lsh_probe_for`
    selects) must recover at least the recall of the unscaled 8-plane
    baseline, and ≥ 90% of all truly-similar pairs."""
    import math

    dim, n_clusters, per = 64, 60, 4

    def vec(c, j):
        # cluster center + small deterministic perturbation → members
        # of a cluster are pairwise-similar, cross-cluster ~orthogonal
        out = []
        for d in range(dim):
            x = math.sin(0.7 * c + 1.3 * d) + 0.15 * math.sin(
                2.1 * j + 0.9 * d + 5 * c
            )
            out.append(x)
        return out

    rows = [
        (c * per + j, vec(c, j)) for c in range(n_clusters) for j in range(per)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    threshold = 0.9
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_similar_pairs(df, "id", "v", threshold).collect()
    }
    assert len(exact) >= n_clusters  # the planted pairs exist

    def recall(n_planes, probe):
        got = {
            (r["id_a"], r["id_b"])
            for r in similarity.lsh_similar_pairs(
                df, "id", "v", dim=dim, threshold=threshold,
                n_planes=n_planes, n_tables=8, probe_hamming=probe,
            ).collect()
        }
        assert got <= exact  # exact-verified: no false positives
        return len(got) / len(exact)

    base = recall(8, 0)          # the unscaled gate-scale config
    scaled_bare = recall(12, 0)  # extra planes, no compensation
    scaled = recall(12, 1)       # what _lsh_probe_for(12) selects
    assert scaled >= base  # compensation claim, measured
    assert scaled >= 0.9
    # and the probe is genuinely doing the compensating work
    assert scaled >= scaled_bare


def test_lsh_probe_radius_capped_and_tables_grow(spark):
    """r9 verdict wrong #2: the probe radius must stay O(planes) —
    NEVER C(planes, R) — at any scale; recall past LSH_PROBE_COMP
    extra planes comes from table growth (b/r banding) instead."""
    import math

    import __spark_entry__ as E

    # radius is capped at 1 for every plane count
    for planes in (8, 12, 13, 18, 27, 40):
        assert E._lsh_probe_for(planes) <= 1
    # probe masks per doc per table = 1 + planes (linear, by formula)
    masks = 1 + sum(
        math.comb(18, j) for j in range(1, E._lsh_probe_for(18) + 1)
    )
    assert masks == 19  # O(planes), not C(18,2)=153 of the old radius-2
    # the table ladder is monotone and kicks in past probe compensation
    assert E._lsh_tables_for(E.LSH_PLANES + E.LSH_PROBE_COMP) == E.LSH_TABLES
    lad = [E._lsh_tables_for(p) for p in range(8, 19)]
    assert lad == sorted(lad) and lad[-1] > E.LSH_TABLES


def test_lsh_table_growth_holds_recall_at_delta10(spark):
    """The Δ=10 operating point (n ≈ 2M under the production base):
    18 planes, radius-1 probing, and the grown table count must still
    recover ≥90% of truly-similar pairs — the regime where the old
    ceil(Δ/5) radius rule would have spent C(18,2)-mask probe volume."""
    import math

    import __spark_entry__ as E

    dim, n_clusters, per = 64, 60, 4

    def vec(c, j):
        return [
            math.sin(0.7 * c + 1.3 * d)
            + 0.15 * math.sin(2.1 * j + 0.9 * d + 5 * c)
            for d in range(dim)
        ]

    rows = [
        (c * per + j, vec(c, j)) for c in range(n_clusters) for j in range(per)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    threshold = 0.9
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_similar_pairs(df, "id", "v", threshold).collect()
    }

    def recall(n_planes, n_tables, probe):
        got = {
            (r["id_a"], r["id_b"])
            for r in similarity.lsh_similar_pairs(
                df, "id", "v", dim=dim, threshold=threshold,
                n_planes=n_planes, n_tables=n_tables, probe_hamming=probe,
            ).collect()
        }
        assert got <= exact  # exact-verified: no false positives
        return len(got) / len(exact)

    base = recall(8, 8, 0)  # the unscaled gate-scale config
    planes = 18             # Δ = 10
    scaled = recall(planes, E._lsh_tables_for(planes), E._lsh_probe_for(planes))
    assert scaled >= 0.9
    assert scaled >= base


def test_lsh_scaled_tables_match_oracle(spark):
    """Hash-equivalence of the TABLE-GROWTH path against DuckDB: with
    the corpus-size base scaled down, the sf0.1 embeddings land at
    Δ=8 extra planes → radius 1 + a grown table count, and the Spark
    plan must match the oracle SQL bit-for-bit (both sides compute
    planes/radius/tables in-query from COUNT(*))."""
    import importlib

    import pandas as pd

    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.1"
    old = E.LSH_BASE_N
    E.LSH_BASE_N = 8  # 2000 rows → np=16, over=3 → tables=13, radius=1
    try:
        assert E._lsh_planes_for(2000) == 16
        assert E._lsh_tables_for(16) > E.LSH_TABLES
        got = E.queries()["lsh_cosine_pairs"](spark, sf_dir).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        # regenerate the SQL under the patched base (the oracle_sql()
        # dict is rendered at import time with the production base —
        # the formulas under test are identical either way)
        want = con.execute(E._lsh_pairs_oracle()).df()
    finally:
        E.LSH_BASE_N = old

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    got, want = canon(got), canon(want)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype({c: "float64" for c in ("cos",)}),
        want.astype({c: "float64" for c in ("cos",)}),
        check_dtype=False,
    )
