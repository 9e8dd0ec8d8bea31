"""Keyword retrieval over the document corpus: inverted-index
conjunctive search and fixed-point BM25 ranking.

Beyond-reference surface (SURVEY §2.3): the lookup side of a training
corpus — "find the documents containing these terms / rank them" — is
the same posting-list algebra a search engine runs, and it maps onto
Spark as pure relational ops:

- a POSTING LIST is just the distinct (term, doc_id) relation; building
  it is explode + distinct, querying it is a filter on term followed by
  a doc-grain aggregate. The term filter lands BEFORE any shuffle, so
  the shuffled volume is proportional to the query terms' selectivity,
  never the corpus (and against a materialized term-partitioned store
  it becomes partition pruning, the text twin of the IVF served index).
- BM25's per-term score is a rational function of integer counts
  (tf, df, dl, avgdl), so with the idf expressed as the same linear
  integer surrogate text_tfidf_topk uses — (n_docs * 1e6) DIV df,
  monotone in 1/df like ln(n/df) — the WHOLE score computes in exact
  BIGINT/DECIMAL arithmetic: no libm, no float summation order, and a
  DuckDB oracle replays every score bit-for-bit (oracle-determinism
  doctrine). k1/b are fixed-point micros (k1=1.2, b=0.75 — the
  textbook defaults, Robertson & Walker '94).

Tokenization is the registry-wide convention (text_tfidf_topk,
text_token_count): lowercase, collapse whitespace, split on space.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# BM25 constants in micros: k1 = 1.2, b = 0.75
K1_MICROS = 1_200_000
B_MICROS = 750_000
_M = 1_000_000


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term) token stream — one row per token occurrence."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")


def conjunctive_search(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL of ``terms``: the posting-list AND.

    Plan at scale: the term filter applies at token grain before
    anything shuffles, so the groupBy moves only (doc_id, term) pairs
    for the |terms| query terms — selectivity-proportional, never
    corpus-proportional. The HAVING count(distinct term) = k is the
    classic postings intersection as an aggregate (no k-way self-join).
    """
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    toks = doc_terms(docs, id_col, text_col)
    hits = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col)
        .agg(F.count_distinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(set(terms)))
        .select(id_col)
    )
    return hits


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by fixed-point BM25 over ``terms`` (OR query).

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    computed entirely in integer micros:
        idf_micros   = (n_docs * 1e6) DIV df          -- linear-idf
                       surrogate, same doctrine as text_tfidf_topk
        dlr_micros   = (dl * 1e6 * n_docs) DIV sum_dl -- dl/avgdl
        denom_micros = tf*1e6 + k1*(1-b)*1e6
                       + (k1_micros * b_micros DIV 1e6 * dlr) DIV 1e6
        tfpart       = (tf * (k1+1e6) * 1e6) DIV denom -- <= 2.2e6
        term_score   = (idf * tfpart) DIV 1e6          -- DECIMAL(38)
                       product: idf grows with n_docs/df

    Every DIV is floor division on positives — identical in Spark and
    DuckDB — so scores (and the top-k cut) are cross-engine exact.
    Plan at scale: term filter before any shuffle; df and the length
    stats are tiny aggregates broadcast back; the final top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    toks = doc_terms(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    qtoks = toks.filter(F.col("term").isin(list(terms)))
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = qtoks.groupBy("term").agg(F.count_distinct(id_col).cast("long").alias("df"))
    k1_1 = K1_MICROS + _M  # (k1 + 1) in micros
    k1_1mb = K1_MICROS * (_M - B_MICROS) // _M  # k1*(1-b) micros = 300000
    k1b = K1_MICROS * B_MICROS // _M  # k1*b micros = 900000
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("idf_micros", F.expr("(n_docs * 1000000L) DIV df"))
        .withColumn("dlr_micros", F.expr("(dl * 1000000L * n_docs) DIV sum_dl"))
        .withColumn(
            "denom_micros",
            F.expr(
                f"tf * 1000000L + {k1_1mb}L + ({k1b}L * dlr_micros) DIV 1000000L"
            ),
        )
        .withColumn(
            "tfpart_micros",
            F.expr(f"(tf * {k1_1}L * 1000000L) DIV denom_micros"),
        )
        .withColumn(
            "term_score",
            F.expr(
                "CAST(CAST(idf_micros AS DECIMAL(38,0)) * tfpart_micros"
                " DIV 1000000 AS BIGINT)"
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("term_score").cast("long").alias("bm25_micros"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    return per_doc.orderBy(F.col("bm25_micros").desc(), id_col).limit(k)


def materialize_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = 64,
) -> None:
    """Persist posting lists as parquet PARTITIONED BY term bucket —
    the text twin of materialize_ivf_assignment.

    The scale fix for per-query tokenization: building postings costs
    a full corpus scan, so paying it inside every search makes each
    query O(corpus). Materialized once at (term, doc_id, tf) grain and
    partitioned by ``tb = pmod(xxhash64(term), n_term_buckets)``, a
    query's term filter becomes PARTITION PRUNING at the source — the
    scan touches only the query terms' bucket directories,
    O(terms_probed / n_term_buckets) of the index, and the corpus is
    tokenized exactly once per (re)build, amortized over every query.
    Bucketing by term HASH (not raw term) keeps the directory count
    fixed and hot terms spread across files within a bucket."""
    post = (
        doc_terms(docs, id_col, text_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn(
            "tb", F.pmod(F.xxhash64("term"), F.lit(int(n_term_buckets)))
        )
    )
    post.write.mode("overwrite").partitionBy("tb").parquet(path)


def search_served(
    spark,
    index_path: str,
    terms: list[str],
    n_term_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive search answered from a materialized inverted index.

    The query terms' buckets are computed with the same engine hash
    (one tiny local job — the scalar edge every served index pays, cf.
    ivf_topk_served's probe cells), and ``tb IN (buckets)`` lands on
    the partition column: PartitionFilters in the plan, only those
    directories are read. Emits (id, n_terms_hit, tf_sum) for docs
    containing ALL terms."""
    if not terms:
        raise ValueError("search_served needs at least one term")
    uniq = sorted(set(terms))
    buckets = [
        r["tb"]
        for r in spark.createDataFrame([(t,) for t in uniq], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(int(n_term_buckets))).alias("tb"))
        .distinct()
        .collect()
    ]
    idx = spark.read.parquet(index_path)
    return (
        idx.filter(F.col("tb").isin(buckets) & F.col("term").isin(uniq))
        .groupBy(id_col)
        .agg(
            F.count_distinct("term").alias("_nt"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
        .filter(F.col("_nt") == len(uniq))
        .select(id_col, F.col("_nt").cast("long").alias("n_terms_hit"), "tf_sum")
    )
