"""Round-14 optimization tests: spread_scan semantics and the
narrow (long-grain) embedding-centroid fold's bit-equality with the
wide r13 form."""

import os

import pyspark.sql.functions as F
import pytest

from bo_sql_spark.parallel import spread_scan


def test_spread_scan_spreads_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    out = spread_scan(df, "id", target=8)
    assert out.rdd.getNumPartitions() == 8
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_spread_scan_noop_when_already_parallel(spark):
    df = spark.range(1000).repartition(8)
    out = spread_scan(df, "id", target=8)
    # no new exchange: the plan is returned unchanged
    assert out is df


def test_spread_scan_keyless_round_robin(spark):
    df = spark.range(100).coalesce(1)
    out = spread_scan(df, target=4)
    assert out.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_spread_scan_disable_env(spark, monkeypatch):
    monkeypatch.setenv("BOSQL_SPREAD_DISABLE", "1")
    df = spark.range(10).coalesce(1)
    assert spread_scan(df, "id", target=8) is df


def test_lineage_cut_identity_and_disable(spark, monkeypatch):
    from bo_sql_spark.parallel import lineage_cut

    df = spark.range(100)
    cut = lineage_cut(df)
    assert sorted(r.id for r in cut.collect()) == list(range(100))
    monkeypatch.setenv("BOSQL_CKPT_DISABLE", "1")
    assert lineage_cut(df) is df


def _toy_emb(spark):
    rows = [
        (0, 0, [0.5, -0.25, 0.125]),
        (1, 0, [0.5, 0.25, -0.125]),
        (2, 1, [-0.5, 0.75, 0.0]),
        (3, 1, [0.25, 0.25, 0.25]),
        (4, 2, [1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def test_centroid_drift_narrow_equals_wide(spark):
    from bo_sql_spark.operators.drift import embedding_centroid_drift

    emb = _toy_emb(spark)
    wide = sorted(
        tuple(r)
        for r in embedding_centroid_drift(
            emb, "label", dims=3, impl="wide"
        ).collect()
    )
    narrow = sorted(
        tuple(r)
        for r in embedding_centroid_drift(
            emb, "label", dims=3, impl="narrow"
        ).collect()
    )
    assert wide == narrow
    assert len(narrow) == 3


def test_centroid_drift_narrow_counts_empty_vectors(spark):
    # an all-zero vector still counts toward n_vectors (it contributes
    # a d=0 row); the posexplode_outer NULL-d guard covers truly empty
    # arrays
    from bo_sql_spark.operators.drift import embedding_centroid_drift

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.0, 0.0]),
        (2, 1, []),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    out = {
        r["label"]: r["n_vectors"]
        for r in embedding_centroid_drift(
            emb, "label", dims=2, impl="narrow"
        ).collect()
    }
    assert out == {0: 2, 1: 1}


def test_centroid_from_sums_narrow_matches_operator(spark):
    # centroid_cosines_from_sums (the streaming serve fold) over
    # embedding_group_sums must agree with the one-shot operator
    from bo_sql_spark.operators.drift import (
        centroid_cosines_from_sums,
        embedding_centroid_drift,
        embedding_group_sums,
    )

    emb = _toy_emb(spark)
    via_sums = sorted(
        tuple(r)
        for r in centroid_cosines_from_sums(
            embedding_group_sums(emb, "label", dims=3), dims=3
        )
        .withColumnRenamed("grp", "label")
        .collect()
    )
    direct = sorted(
        tuple(r)
        for r in embedding_centroid_drift(
            emb, "label", dims=3, impl="narrow"
        ).collect()
    )
    assert via_sums == direct


def test_inverted_index_build_single_tokenize_shape(spark, tmp_path):
    """The r14-opt index-build rewrite: dl derived as sum(tf) from the
    checkpointed postings (one corpus tokenize) must equal the old
    per-doc token count, and the clustered write keeps files-per-bucket
    at ONE regardless of upstream map parallelism (the spread_scan +
    partitionBy fan-out regression this round caught)."""
    import os

    from bo_sql_spark.operators.search import materialize_inverted_index

    rows = [
        (1, "the quick brown fox  jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the five boxing wizards jump quickly"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    path = str(tmp_path / "idx")
    materialize_inverted_index(docs, path, n_term_buckets=4)
    post = spark.read.parquet(path)
    # dl == total token count per doc (the old definition)
    got = {
        (r["doc_id"], r["dl"]) for r in post.select("doc_id", "dl").distinct().collect()
    }
    want = {
        (i, len(t.split())) for i, t in rows if t
    }
    assert got == want
    # one data file per bucket directory
    for d in os.listdir(path):
        if not d.startswith("tb="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_no_spread_context(spark):
    from bo_sql_spark.parallel import no_spread

    df = spark.range(1000).coalesce(1)
    with no_spread():
        assert spread_scan(df, "id", target=8).rdd.getNumPartitions() == 1
    # restored outside the block
    assert spread_scan(df, "id", target=8).rdd.getNumPartitions() == 8


def test_simhash_portable_narrow_equals_wide(spark):
    """The reopen-session long-grain simhash fold (impl='narrow') must
    be bit-identical to the wide 60-aggregate r13 form — same ±1
    integer sums, OR of distinct single-bit values == their sum."""
    from bo_sql_spark.operators.dedup import simhash_portable

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "a"),  # single token: every bit decided by one hash
        (4, None),  # NULL text excluded by both forms
        (5, "   "),  # whitespace-only: split yields [''] -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wide = {
        r["doc_id"]: r["simhash"]
        for r in simhash_portable(docs, impl="wide").collect()
    }
    narrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_portable(docs, impl="narrow").collect()
    }
    assert narrow == wide
    assert set(narrow) == {0, 1, 2, 3}  # 4 and 5 drop out in both


def test_kmv_overlap_exact_quad_identity(spark, sf_dir):
    """sketch_kmv_overlap's single-pass exact stats (reopen session)
    must reproduce the four independently-computed set counts the old
    4-subtree form emitted: |A|, |B|, |A∪B|, |A∩B| = |A|+|B|-|A∪B|."""
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K
    from bo_sql_spark.queries.pipeline import sketch_kmv_overlap

    row = sketch_kmv_overlap(spark, sf_dir).collect()[0]

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )

    def hashes(pred):
        return (
            docs.filter(pred)
            .select(F.explode(word_shingles(F.col("text"), 3)).alias("shingle"))
            .filter(F.col("shingle") != "")
            .select(K.kmv_hash("shingle").alias("h"))
            .distinct()
        )

    ha = hashes(F.col("doc_id") < 250)
    hb = hashes(F.col("doc_id") >= 250)
    na, nb = ha.count(), hb.count()
    nu = ha.union(hb).distinct().count()
    ni = ha.intersect(hb).count()
    assert (row["exact_a"], row["exact_b"]) == (na, nb)
    assert (row["exact_union"], row["exact_intersect"]) == (nu, ni)
    assert ni == na + nb - nu
