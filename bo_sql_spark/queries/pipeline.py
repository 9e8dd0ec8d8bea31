"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal, as-of join, JSON extraction.

These wrap the bo_sql_spark.operators modules into graded entries.
Oracle design notes:
- xxhash64/NumPy-plane operators (MinHash/LSH, SimHash, hyperplane
  buckets) have no DuckDB twin -> rows-only checks; since round 12
  EVERY such family also has an ENGINE-PORTABLE sibling graded against
  a full oracle (md5-derived hashes / literal sign masks / fixed-point
  quantization: *_portable queries), so the production-default hash
  family stays fast while the algorithm itself is bit-replayed.
- Cosine math is written as the same explicit double-precision
  dot/sqrt formula on both engines (accumulate in index order) — bit-
  identical, then rounded to 6dp for the hash.
- DuckDB can't substr BLOBs -> binary heads are compared as hex-string
  prefixes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bo_sql_spark.catalog import load_tables
from bo_sql_spark.functions import cosine_similarity
from bo_sql_spark.operators import corpus_filters as CF
from bo_sql_spark.operators import dedup as D
from bo_sql_spark.operators import multimodal as M
from bo_sql_spark.operators import similarity as S
from bo_sql_spark.operators import text as T
from bo_sql_spark.operators.asof import asof_join
from bo_sql_spark.queries import register


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


def _portable_minhash_pairs_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_k: int = 3,
    prefix: str = "pm",
) -> str:
    """CTE chain replaying minhash_signatures_portable -> r=2 LSH
    candidates -> exact-Jaccard verify in DuckDB, ending in
    ``{prefix}pairs (id_a, id_b, jacc_raw)``. Same md5-15-hex base
    hash, per-seed (a_i*h+b_i) mod P family, and mh[2b]*P + mh[2b+1]
    band packing as operators/dedup.py — bit-identical pair sets."""
    P = D._PMH_P
    p, k = prefix, int(shingle_k)
    consts = [D._pmh_ab(i) for i in range(n_hashes)]
    mh_exprs = ",\n               ".join(
        f"MIN((hb * {a} + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = "\n        UNION ALL ".join(
        f"SELECT {id_col}, CAST({b} AS BIGINT) AS band,"
        f" mh{2 * b} * {P} + mh{2 * b + 1} AS h FROM {p}sig"
        for b in range(bands)
    )
    return f"""{p}sh AS MATERIALIZED (
        SELECT {id_col},
               list_filter(list_distinct(list_transform(
                   range(1, greatest(len(tok) - {k} + 2, 2)),
                   i -> array_to_string(tok[i:i+{k - 1}], ' '))),
                   s -> s <> '') AS sh
        FROM (SELECT {id_col},
                     string_split(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' ') AS tok
              FROM {src})
    ), {p}ex AS (
        SELECT {id_col}, unnest(sh) AS s FROM {p}sh
    ), {p}hb AS (
        SELECT {id_col},
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {P} AS hb
        FROM {p}ex
    ), {p}sig AS MATERIALIZED (
        SELECT {id_col}, {mh_exprs}
        FROM {p}hb GROUP BY {id_col}
    ), {p}bands AS (
        {band_selects}
    ), {p}cand AS (
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM {p}bands a JOIN {p}bands b
          ON a.band = b.band AND a.h = b.h AND a.{id_col} < b.{id_col}
        GROUP BY 1, 2
    ), {p}pairs AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jacc_raw
        FROM {p}cand
        JOIN {p}sh sa ON sa.{id_col} = id_a
        JOIN {p}sh sb ON sb.{id_col} = id_b
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= {threshold}
    )"""



# ------------------------------------------------------------- dedup
@register(
    "dedup_exact",
    # coalesce(text, sentinel) mirrors exact_dedup's NULL-position-
    # preserving key (operators/dedup.py NULL_SENTINEL).
    oracle=f"""
    SELECT md5(coalesce(text, '{D.NULL_SENTINEL}')) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT)    AS dup_count
    FROM documents
    GROUP BY 1
    """,
    doc="Exact content dedup: group on md5(coalesce(text, sentinel)), "
    "keep min doc_id. Shuffle rows are (16-byte hash, id) — content "
    "never moves.",
    tags=("pipeline", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return D.exact_dedup(t["documents"], ["text"], "doc_id")


@register(
    "dedup_minhash_pairs_salted",
    oracle=None,  # KEPT ROWS-ONLY BY DESIGN (r13 triage): xxhash64
    # signatures are Spark-engine-private, and this entry exists for
    # its SKEW DEFENSE, which has no portable twin — the md5 family's
    # graded queries (dedup_minhash_survivors_portable,
    # dedup_pair_evidence) cover the banding/verify semantics; pair-set
    # equality with the unsalted form is unit-proven
    # (tests/test_operators.py::test_lsh_salted_pairs_equal_unsalted)
    doc="The hot-bucket-salted MinHash LSH pair join "
    "(operators/dedup.py:lsh_band_pairs_salted) — kept as the "
    "NATIVE-ENGINE skew demo after its unsalted/incremental xxhash64 "
    "siblings were retired (r13) in favor of their md5-portable "
    "oracle-graded twins: LSH buckets over "
    "hot_threshold=4 members spread their quadratic pair output over "
    "an r^2 grid of salted cells (deterministic per-id salt + "
    "(cell_i, cell_j) join keys) while cold buckets keep the plain "
    "single-shuffle self-join — byte-identical pairs, no straggler "
    "task when a viral template concentrates a bucket. Exists because "
    "AQE's input-byte skew split measurably CANNOT fire on this shape "
    "(the hot bucket's join input is KBs; the blow-up is the output "
    "inside one reduce task — SCALE.md round-7 skew table). The low "
    "threshold here routes the corpus' natural near-dup clusters "
    "through the hot path so BOTH paths execute and lint in this "
    "registered plan.",
    tags=("pipeline", "dedup"),
)
def dedup_minhash_pairs_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return D.minhash_dedup_pairs(
        t["documents"], threshold=0.5, salt_r=4, salt_hot_threshold=4
    ).select("id_a", "id_b", F.round("jacc", 6).alias("jacc"))


@register(
    "dedup_minhash_pairs_auto",
    oracle=f"""
    WITH {_portable_minhash_pairs_sql(
        "documents",
        n_hashes=2 * D.minhash_auto_bands(0.7),
        bands=D.minhash_auto_bands(0.7),
        threshold=0.7,
        prefix="am",
    )}
    SELECT id_a, id_b, ROUND(jacc_raw, 6) AS jacc FROM ampairs
    """,
    doc="Portable MinHash near-dup pairs with the banding AUTO-SIZED "
    "from the verify threshold (r13 verdict #4): bands = "
    "round(1/(0.7*t)^2) places the S-curve knee 1/sqrt(b) at 0.7x the "
    "threshold (dedup.py:minhash_auto_bands — threshold 0.7 here -> "
    "4 bands / 8 hashes, vs the 0.5-threshold family's 8/16), so the "
    "LSH shuffles HALF the band rows of the fixed default while "
    "recall at s >= t stays ~1 (knee at 0.5, collision prob "
    "1-(1-0.49)^4 = 0.93 at the threshold and ~1 above it; the exact "
    "verify then drops sub-threshold survivors). The oracle builds "
    "its SQL with the SAME rule call, so the knob choice itself is "
    "hash-gated. Pure threshold->integer rule — no corpus statistics "
    "— hence no COUNT(*) tier gates needed.",
    tags=("pipeline", "dedup", "approx"),
)
def dedup_minhash_pairs_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return D.minhash_dedup_pairs_portable(docs, threshold=0.7).select(
        "id_a", "id_b", F.round("jacc", 6).alias("jacc")
    )


@register(
    "dedup_incremental_minhash_portable",
    oracle=f"""
    WITH {_portable_minhash_pairs_sql("documents")}
    SELECT id_b AS new_id, id_a AS idx_id, ROUND(jacc_raw, 6) AS jacc
    FROM pmpairs
    WHERE id_a < 400 AND id_b >= 400
    ORDER BY new_id, idx_id
    """,
    doc="Incremental near-dup with a FULL oracle — "
    "the incremental near-dup probe with a portable hash family "
    "(supersedes the retired xxhash64 form, r13): the corpus "
    "(doc_id < 400) is indexed once with the SQL-replayable hash "
    "family (band rows parquet-partitioned by band + shingle sets), "
    "the new batch (doc_id >= 400) probes it, exact-Jaccard verify at "
    "0.5. Band collision is a pairwise property, so the incremental "
    "probe's candidate set equals the full-corpus portable-LSH pair "
    "set restricted to (index x batch) — which is exactly what the "
    "oracle replays. Same 100 TB economics as the xxhash64 form: "
    "corpus signatures paid once, per-batch cost O(batch), index "
    "bands read partition-pruned.",
    tags=("pipeline", "dedup", "incremental"),
)
def dedup_incremental_minhash_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    docs = _t(spark, sf_dir)["documents"]
    path = tempfile.mkdtemp(prefix="bosql_mhidxp_") + "/index"
    D.materialize_minhash_index(
        docs.filter(F.col("doc_id") < 400), path,
        n_hashes=16, bands=8, portable=True,
    )
    return (
        D.minhash_probe_index(
            spark, path, docs.filter(F.col("doc_id") >= 400),
            threshold=0.5, n_hashes=16, bands=8, portable=True,
        )
        .select("new_id", "idx_id", F.round("jacc", 6).alias("jacc"))
        .orderBy("new_id", "idx_id")
    )


@register(
    "dedup_incremental_exact",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(tok) >= 3
                    THEN list_transform(range(1, len(tok) - 1),
                                        i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
                    ELSE []::VARCHAR[] END) AS s
        FROM toks
    ), ex AS (
        SELECT doc_id, unnest(s) AS g FROM sh
    ), sizes AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), inter AS (
        SELECT a.doc_id AS idx_id, b.doc_id AS new_id,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM ex a JOIN ex b USING (g)
        WHERE a.doc_id < 400 AND b.doc_id >= 400
        GROUP BY 1, 2
    )
    SELECT new_id, idx_id,
           ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jacc
    FROM inter
    JOIN sizes na ON na.doc_id = idx_id
    JOIN sizes nb ON nb.doc_id = new_id
    WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.5
    """,
    doc="Ground truth for the incremental path: exact 3-word-shingle "
    "Jaccard between every (corpus, new-batch) pair at >= 0.5 — the "
    "pairs the incremental minhash probes must find (8 such pairs exist in "
    "the sf0.01 fixture, all >= 0.9). Computed as a shingle EQUI-JOIN "
    "(explode distinct shingles, hash-join corpus-side with batch-side "
    "on the shingle, count = |intersection|, sizes joined back), NOT "
    "an all-pairs nested loop with array_intersect — same exact "
    "output (a pair at jacc >= 0.5 shares >= 1 shingle, so the join "
    "loses nothing), but the cost is sum of per-shingle match counts "
    "instead of |corpus| x |batch| array intersections: the sf0.1 "
    "rehearsal wall fell 147s -> ~3s, and at 100 TB this is the only "
    "form that exists at all (the nested loop is a "
    "BroadcastNestedLoopJoin).",
    tags=("pipeline", "dedup", "incremental"),
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles

    t = _t(spark, sf_dir)
    sh = t["documents"].select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")
    )
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    sizes = sh.select("doc_id", F.size("s").cast("long").alias("n"))
    inter = (
        ex.filter(F.col("doc_id") < 400)
        .select(F.col("doc_id").alias("idx_id"), "g")
        .join(
            ex.filter(F.col("doc_id") >= 400).select(
                F.col("doc_id").alias("new_id"), "g"
            ),
            "g",
        )
        .groupBy("idx_id", "new_id")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("idx_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("new_id"), F.col("n").alias("nb"))
    jacc_raw = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    ).cast("double")
    return (
        inter.join(F.broadcast(na), "idx_id")
        .join(F.broadcast(nb), "new_id")
        .withColumn("jacc_raw", jacc_raw)
        .filter(F.col("jacc_raw") >= 0.5)
        .select("new_id", "idx_id", F.round("jacc_raw", 6).alias("jacc"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                 / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))), 6) AS jacc
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
          / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.4
    """,
    doc="Exact token-set Jaccard pairs (>= 0.4) on a doc subset — the "
    "ground-truth twin of the MinHash pipeline, O(n^2) bounded to the "
    "subset. |A ∪ B| computed as |A|+|B|-|A ∩ B| on both engines.",
    tags=("pipeline", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 150)
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("tok"),
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("tok").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("tok").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size("ta") + F.size("tb") - F.size(F.array_intersect("ta", "tb"))
    jacc = inter / union.cast("double")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jacc_raw", jacc)
        .filter(F.col("jacc_raw") >= 0.4)
        .select("id_a", "id_b", F.round("jacc_raw", 6).alias("jacc"))
    )


@register(
    "dedup_simhash",
    oracle=None,  # KEPT ROWS-ONLY BY DESIGN (r13 triage): xxhash64 bit
    # signatures are Spark-engine-private — the engine hash IS the
    # production choice at 100 TB (no Python, no literals); the md5
    # twin dedup_simhash_portable grades the identical signature ->
    # band -> Hamming-verify semantics bit-for-bit against DuckDB
    doc="64-bit SimHash per doc (one explode + groupBy, 64-long state "
    "per doc) — kept as the NATIVE-ENGINE signature demo; "
    "dedup_simhash_portable is its oracle-graded twin. Rows-only: "
    "row count must equal |documents|.",
    tags=("pipeline", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return D.simhash64(t["documents"])


def _portable_simhash_pairs_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_hamming: int = 3,
    prefix: str = "sh",
) -> str:
    """CTE chain replaying simhash_portable -> 15-bit-chunk banding ->
    bit_count(XOR) verify in DuckDB, ending in ``{prefix}pairs (id_a,
    id_b, hamming)``. Same md5-15-hex per-token hash, bit-sign folds,
    and chunk packing as operators/dedup.py — bit-identical pair sets."""
    p = prefix
    chunk_bits = 60 // bands
    chunk_mask = (1 << chunk_bits) - 1
    return f"""{p}tok AS (
        SELECT {id_col},
               unnest(list_distinct(string_split(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' '))) AS tok
        FROM {src} WHERE {text_col} IS NOT NULL
    ), {p}h AS (
        SELECT {id_col}, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM {p}tok WHERE tok <> ''
    ), {p}bits AS (
        SELECT {id_col}, j.j,
               SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM {p}h CROSS JOIN (SELECT unnest(range(60)) AS j) j
        GROUP BY {id_col}, j.j
    ), {p}sig AS MATERIALIZED (
        SELECT {id_col}, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
        FROM {p}bits GROUP BY {id_col}
    ), {p}band AS (
        SELECT {id_col}, sig, b.b AS band, (sig >> (b.b * {chunk_bits})) & {chunk_mask} AS chunk
        FROM {p}sig CROSS JOIN (SELECT unnest(range({bands})) AS b) b
    ), {p}cand AS (
        SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
               a.sig AS sa, b.sig AS sb
        FROM {p}band a JOIN {p}band b
          ON a.band = b.band AND a.chunk = b.chunk AND a.{id_col} < b.{id_col}
    ), {p}pairs AS (
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM {p}cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    )"""


@register(
    "dedup_simhash_portable",
    oracle=f"""
    WITH {_portable_simhash_pairs_sql("documents")}
    SELECT id_a, id_b, hamming FROM shpairs
    """,
    doc="SimHash near-dup pairs with a FULL oracle (the xxhash64 "
    "signature family grades rows-only): 60-bit portable SimHash "
    "(md5-15-hex per-token hashes, operators/dedup.py:simhash_portable) "
    "-> exact-match banding on 4 x 15-bit chunks -> bit_count(XOR) "
    "verify at Hamming <= 3. By pigeonhole (3 flips dirty at most 3 of "
    "4 chunks) the banded output EQUALS brute-force Hamming search — "
    "exact, not approximate — while only (id, band, chunk) triples "
    "ever shuffle; the oracle replays signature, banding, and verify "
    "bit-for-bit over the whole documents table.",
    tags=("pipeline", "dedup"),
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return D.simhash_near_dup_pairs_portable(
        t["documents"], bands=4, max_hamming=3
    )


@register(
    "dedup_embedding_neardup",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 1000
    )
    SELECT id_a, id_b, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    ) WHERE sim >= 0.40
    """,
    doc="Embedding near-dup pairs (cosine >= 0.40, brute force on a "
    "bounded subset, vec_id < 1000 at every SF). Same double dot/sqrt formula on both engines.",
    tags=("pipeline", "dedup", "similarity"),
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"].filter(F.col("vec_id") < 1000)
    return D.embedding_near_dup_pairs(emb, threshold=0.40)


@register(
    "dedup_clusters",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.4
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    )
    SELECT a AS node, CAST(MIN(b) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
    """,
    doc="Duplicate CLUSTERS: near-dup pairs -> connected components via "
    "iterative min-label propagation (GraphFrames-free; O(log diameter) "
    "join rounds). The genuinely-iterative algorithm of the suite; "
    "oracle computes the same components with a recursive CTE over the "
    "same oracle-checked edge set (ngram-Jaccard >= 0.4, doc_id < 150).",
    tags=("pipeline", "dedup", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    return D.connected_components(pairs)


@register(
    "dedup_survivors",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.4
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    ), canon AS (
        SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id
    FROM (SELECT doc_id FROM documents WHERE doc_id < 150) d
    LEFT JOIN canon ON d.doc_id = canon.node
    WHERE canon.node IS NULL OR canon.cluster_id = d.doc_id
    """,
    doc="END-TO-END dedup: near-dup pairs -> connected components -> "
    "keep one canonical doc (min id) per cluster, pass singletons "
    "through. The output is the deduplicated corpus id-set — what a "
    "training-data pipeline actually ships.",
    tags=("pipeline", "dedup", "iterative"),
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 150).select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    canon = D.connected_components(pairs)
    return (
        docs.join(canon, docs.doc_id == canon.node, "left")
        .filter(F.col("node").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .select("doc_id")
    )


@register(
    "dedup_minhash_survivors_portable",
    oracle=f"""
    WITH {_portable_minhash_pairs_sql("documents")}, edges AS (
        SELECT id_a AS src, id_b AS dst FROM pmpairs
        UNION SELECT id_b, id_a FROM pmpairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    ), canon AS (
        SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id
    FROM documents d
    LEFT JOIN canon ON d.doc_id = canon.node
    WHERE canon.node IS NULL OR canon.cluster_id = d.doc_id
    """,
    doc="END-TO-END **MinHash** dedup with a FULL oracle — the graded "
    "gap the xxhash64 family couldn't close (its signatures are "
    "Spark-private — the retired xxhash64 pair query could only "
    "grade rows-only): the "
    "portable signature (md5-15-hex base hash mod P=1e9+7, per-seed "
    "universal-family permutations, operators/dedup.py:"
    "minhash_signatures_portable) -> r=2 packed-band LSH candidates "
    "-> exact-Jaccard verify at 0.5 -> connected components -> keep "
    "min-id per cluster, over the WHOLE documents table (no doc_id "
    "bound — candidates are O(collisions), never all-pairs). The "
    "oracle replays every stage bit-for-bit, recursive-CTE components "
    "included. Same 100 TB shape as minhash_dedup_pairs: corpus text "
    "never shuffles; band rows are fixed-width (id, band, h).",
    tags=("pipeline", "dedup", "iterative"),
)
def dedup_minhash_survivors_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    pairs = D.minhash_dedup_pairs_portable(docs, threshold=0.5)
    canon = D.connected_components(pairs.select("id_a", "id_b"))
    ids = docs.select("doc_id")
    return (
        ids.join(canon, ids.doc_id == canon.node, "left")
        .filter(F.col("node").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .select("doc_id")
    )


@register(
    "dedup_pair_evidence",
    oracle=f"""
    WITH {_portable_minhash_pairs_sql("documents")}, pev AS (
        SELECT p.id_a, p.id_b,
               list_sort(list_intersect(a.sh, b.sh)) AS shared
        FROM pmpairs p
        JOIN pmsh a ON p.id_a = a.doc_id
        JOIN pmsh b ON p.id_b = b.doc_id
    )
    SELECT id_a, id_b, CAST(len(shared) AS BIGINT) AS n_shared,
           COALESCE(array_to_string(shared[1:3], ' | '), '') AS evidence
    FROM pev
    """,
    doc="Dedup AUDIT surface: for every verified portable-MinHash "
    "near-dup pair, the EVIDENCE a reviewer needs to trust the merge "
    "— shared-shingle count and the first three shared shingles "
    "(lexicographic, deterministic). Production dedup gets disputed "
    "('why were these two docs merged?'); the answer has to be "
    "reconstructable from the pipeline itself, not a rerun. Shingle "
    "sets move ONLY for flagged pairs (O(pairs), never the corpus); "
    "the oracle replays the pair set and the evidence strings "
    "verbatim, including the array_to_string([])-is-NULL DuckDB guard.",
    tags=("pipeline", "dedup"),
)
def dedup_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles

    docs = _t(spark, sf_dir)["documents"]
    pairs = D.minhash_dedup_pairs_portable(docs, threshold=0.5).select(
        "id_a", "id_b"
    )
    sh = docs.select(
        F.col("doc_id"), word_shingles(F.col("text"), 3).alias("sh")
    )
    ev = (
        pairs.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("shared", F.array_sort(F.array_intersect("sh_a", "sh_b")))
    )
    return ev.select(
        "id_a",
        "id_b",
        F.size("shared").cast("long").alias("n_shared"),
        F.concat_ws(" | ", F.slice("shared", 1, 3)).alias("evidence"),
    )


@register(
    "decontaminate_bloom_survivors",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), sh AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(tok) - 5 + 2, 2)),
                       i -> array_to_string(tok[i:i+4], ' ')))) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> ''
    ), contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM sh s
        JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 25 = 0) e
          USING (shingle)
        WHERE s.doc_id % 25 <> 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 25 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="decontaminate_survivors through the BLOOM PREFILTER "
    "(operators/bloom.py:decontaminate_bloom): identical output "
    "(Bloom admits no false negative, so no contaminated doc escapes; "
    "false positives die in the exact verify — the oracle is the "
    "exact form's, verbatim), different scale shape: the corpus "
    "shingle stream meets a ~48 KB broadcast BITSET before any "
    "string-keyed join, and the exact eval-set join runs only over "
    "the probable vocabulary. At 100 TB with a large eval suite: "
    "kilobytes of bits into every task instead of megabytes of "
    "shingle strings.",
    tags=("pipeline", "dedup", "training", "sketch"),
)
def decontaminate_bloom_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.bloom import decontaminate_bloom

    docs = _t(spark, sf_dir)["documents"]
    train = docs.filter(F.col("doc_id") % 25 != 0)
    evalset = docs.filter(F.col("doc_id") % 25 == 0)
    survivors, _ = decontaminate_bloom(train, evalset, k=5)
    return survivors.select("doc_id", "source")


_LINES_K = 8


@register(
    "dedup_lines_global",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents WHERE text IS NOT NULL
    ), chunks AS (
        SELECT doc_id,
               unnest(range((len(tok) - 1) // {_LINES_K} + 1)) AS c,
               tok
        FROM toks
    ), cut AS (
        SELECT doc_id, c,
               array_to_string(tok[c * {_LINES_K} + 1 : c * {_LINES_K} + {_LINES_K}], ' ') AS chunk
        FROM chunks
    ), flagged AS (
        SELECT doc_id, c, chunk,
               ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, c) = 1 AS keep
        FROM cut
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY c), '') AS text_kept
    FROM flagged GROUP BY doc_id
    """,
    doc="C4-style GLOBAL line-level dedup (operators/dedup.py:"
    "dedup_lines_global; Raffel et al. 2020 drop any thrice-sentence "
    "span occurring >1x in the corpus, RefinedWeb does it per line): "
    "docs cut into fixed 8-token chunks (the fixture has no "
    "sentence/line boundaries), each distinct chunk keeps only its "
    "first corpus occurrence (min (doc_id, pos)), docs reassembled "
    "from survivors — cross-page boilerplate disappears from every "
    "copy but the first. Round 9: the first-occurrence window keys on "
    "a 128-bit chunk fingerprint (fixed-width dedup exchange + "
    "map-side WindowGroupLimit), and text crosses only the doc-keyed "
    "rebuild join, once, as the raw string — 0.72x the r8 form's "
    "shuffle bytes at realistic chunk sizes (SCALE.md). The oracle "
    "replays chunking, the first-occurrence window (on raw text — "
    "identical keeps absent a 2^-64 fingerprint collision), and the "
    "rebuild verbatim.",
    tags=("pipeline", "dedup"),
)
def dedup_lines_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return D.dedup_lines_global(t["documents"], chunk_tokens=_LINES_K)


_LEAK_SPLIT_SALT = 7
_LEAK_W = {"train": 0.8, "val": 0.1, "test": 0.1}


def _leak_h() -> str:
    from bo_sql_spark.operators.sampling import portable_hash_sql

    return portable_hash_sql("cluster_id", _LEAK_SPLIT_SALT)


@register(
    "split_leakage_safe",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.4
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    ), canon AS (
        SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    ), assigned AS (
        SELECT d.doc_id,
               CAST(COALESCE(canon.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM (SELECT doc_id FROM documents WHERE doc_id < 150) d
        LEFT JOIN canon ON d.doc_id = canon.node
    )
    SELECT doc_id, cluster_id,
           CASE WHEN {_leak_h()} < {int(0.8 * 1_000_000_007)} THEN 'train'
                WHEN {_leak_h()} < {int(0.9 * 1_000_000_007)} THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """,
    doc="LEAKAGE-SAFE train/val/test split: assignment hashes the "
    "near-dup CLUSTER id (dedup_clusters' connected components), not "
    "the doc id, so every member of a duplicate cluster lands in the "
    "same split — the standard guard against near-duplicate train/test "
    "leakage (the hash_split docstring's promised composition, now "
    "graded end-to-end). Singletons hash their own id; the oracle "
    "replays components via a recursive CTE and the identical portable "
    "integer mix on cluster_id.",
    tags=("pipeline", "dedup", "training", "sampling", "iterative"),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import sampling as SA

    t = _t(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 150).select("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    canon = D.connected_components(pairs)
    assigned = docs.join(canon, docs.doc_id == canon.node, "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    return SA.hash_split(
        assigned, "cluster_id", _LEAK_W, salt=_LEAK_SPLIT_SALT
    ).select("doc_id", "cluster_id", "split")


# -------------------------------------------------------- similarity
@register(
    "similarity_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT vec_id,
               list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
        FROM e CROSS JOIN q
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="Exact cosine top-10 to the vec_id=0 query vector. Spark plan: "
    "broadcast 1-row query + codegen'd score + TakeOrderedAndProject "
    "(per-partition heaps, no global sort) — O(n) scan at any scale.",
    tags=("pipeline", "similarity"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("sim", 6).alias("cos_sim"))
    )


def _rp_plane_proj_sql(mask: int, qv_expr: str, dims: int) -> str:
    """SQL for ONE plane's exact integer projection: dot of the
    quantized vector against the +-1 literal sign list of one
    md5-derived mask (similarity.py:rp_sign_masks). Every term is an
    exact integer < 2^53, so the double sum is order-independent."""
    signs = ", ".join("1" if (mask >> d) & 1 else "-1" for d in range(dims))
    return (
        f"list_dot_product(CAST({qv_expr} AS DOUBLE[]),"
        f" CAST([{signs}] AS DOUBLE[]))"
    )


def _rp_bucket_expr_sql(masks_row: list[int], qv_expr: str, dims: int) -> str:
    """SQL expression for one seed's RP-LSH bucket over a quantized
    vector column: per plane, the sign of an exact integer projection
    against a +-1 literal list (the same md5-derived masks the Spark
    side embeds — similarity.py:rp_sign_masks)."""
    bit_terms = []
    for pl, m in enumerate(masks_row):
        proj = _rp_plane_proj_sql(m, qv_expr, dims)
        bit_terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << pl} ELSE 0 END)")
    return "(" + " + ".join(bit_terms) + ")"


def _portable_rp_join_sql(
    src: str = "embeddings",
    bits: int = 4,
    seeds: int = 4,
    threshold: float = 0.40,
    dims: int = 64,
    prefix: str = "rp",
    n_gate: tuple[int, int] | None = None,
) -> str:
    """CTE chain replaying approx_similarity_join_portable in DuckDB:
    fixed-point quantization -> per-seed buckets from the SAME literal
    md5-derived sign masks (similarity.py:rp_sign_masks) -> (seed,
    bucket) candidate self-join -> exact integer-dot cosine verify.
    Ends in ``{prefix}pairs (id_a, id_b, cos)``. Sign vectors are
    embedded as +-1 literal lists; every dot product is a sum of exact
    integers below 2^53, so double accumulation is order-independent
    and the candidate set and values replay bit-for-bit."""
    from bo_sql_spark.operators.similarity import _RP_SCALE, rp_sign_masks

    p = prefix
    masks = rp_sign_masks(seeds, bits)
    buck_rows = []
    for s in range(seeds):
        buck_rows.append(
            f"SELECT vec_id, qv, {s} AS seed, "
            + _rp_bucket_expr_sql(masks[s], "qv", dims)
            + f" AS bucket FROM {p}q"
        )
    stacked = "\n        UNION ALL ".join(buck_rows)
    gate = ""
    if n_gate is not None:
        lo, hi = n_gate
        gate = (
            f"\n          AND (SELECT COUNT(*) FROM {src})"
            f" BETWEEN {lo} AND {hi}"
        )
    return f"""{p}q AS MATERIALIZED (
        SELECT vec_id, qv
        FROM (SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                                    v -> CAST(round(v * {_RP_SCALE}) AS BIGINT)) AS qv
              FROM {src})
        WHERE len(list_filter(qv, x -> x <> 0)) > 0{gate}
    ), {p}buck AS MATERIALIZED (
        {stacked}
    ), {p}cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               a.qv AS qa, b.qv AS qb
        FROM {p}buck a JOIN {p}buck b
          ON a.seed = b.seed AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), {p}pairs AS (
        SELECT id_a, id_b,
               list_dot_product(CAST(qa AS DOUBLE[]), CAST(qb AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(qa AS DOUBLE[]), CAST(qa AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(qb AS DOUBLE[]), CAST(qb AS DOUBLE[])))) AS cos
        FROM {p}cand
    )"""


def _rp_join_tier_bounds(bits: int) -> tuple[int, int]:
    """COUNT(*) range over which rp_auto_join_params picks ``bits``:
    clamp(ceil_log2(n) - 5, 4, 16) == bits. The low clamp folds every
    n <= 2^9 into the bits=4 tier."""
    lo = 1 if bits == 4 else (1 << (bits + 4)) + 1
    hi = 1 << (bits + 5)
    return lo, hi


# bits tiers the auto-sized SQL oracles replay. A corpus size OUTSIDE
# the union of the tier ranges would make every COUNT(*) gate empty
# and the oracle silently return zero rows (ADVICE r13) — so the
# query functions assert coverage via _assert_tier_covered before
# running, and tests/test_oracle_parity.py pins every fixture's
# corpus count inside the ranges AND the rule<->bounds consistency.
_RP_JOIN_TIERS = (4, 5, 6, 7)  # n in [1, 4096]
_RP_PROBE_TIERS = (5, 6, 7, 8, 9, 10)  # n in [1, 4096]
_IVF_AUTO_MAX_N = 16384  # the CASE in similarity_ivf_auto_cells' oracle


def _assert_tier_covered(n, tiers, bounds_fn, label: str) -> None:
    """Raise LOUDLY when a corpus count falls outside the n-ranges the
    auto-tier oracle replays — a silent zero-row oracle is a confusing
    grading failure; this makes it a one-line fix (extend ``tiers``)."""
    if not any(lo <= n <= hi for b in tiers for lo, hi in (bounds_fn(b),)):
        spans = ", ".join(f"bits={b}:{bounds_fn(b)}" for b in tiers)
        raise AssertionError(
            f"{label}: corpus count {n} is outside the oracle's replayed "
            f"tier ranges ({spans}) — extend the tier tuple so the SQL "
            "oracle covers this fixture size"
        )


def _portable_rp_join_sql_auto(
    src: str = "embeddings",
    threshold: float = 0.40,
    dims: int = 64,
    prefix: str = "rp",
    tiers: tuple[int, ...] = _RP_JOIN_TIERS,
) -> str:
    """AUTO-SIZED twin of _portable_rp_join_sql: one gated CTE chain
    per candidate ``bits`` tier (the n-ranges where
    rp_auto_join_params picks that bits — pure integer rule, so the
    gates are plain COUNT(*) BETWEEN bounds). Exactly one tier's base
    CTE survives its gate at any corpus size; the others quantize
    zero rows, so their bucket/join/verify stages are all no-ops.
    Ends in ``{prefix}pairs (id_a, id_b, cos)`` = the union of tier
    pair tables. Tiers cover n <= 2^12 (fixtures are 500 and 2000
    vectors); the query functions assert coverage at run time."""
    chains, pair_sels = [], []
    for b in tiers:
        tp = f"{prefix}t{b}"
        chains.append(
            _portable_rp_join_sql(
                src=src,
                bits=b,
                seeds=4,
                threshold=threshold,
                dims=dims,
                prefix=tp,
                n_gate=_rp_join_tier_bounds(b),
            )
        )
        pair_sels.append(f"SELECT id_a, id_b, cos FROM {tp}pairs")
    return (
        ",\n    ".join(chains)
        + f",\n    {prefix}pairs AS (\n        "
        + "\n        UNION ALL ".join(pair_sels)
        + "\n    )"
    )


@register(
    "similarity_approx_join_portable",
    oracle=f"""
    WITH {_portable_rp_join_sql_auto()}
    SELECT id_a, id_b, ROUND(cos, 6) AS cos_sim
    FROM rppairs WHERE cos >= 0.4
    """,
    doc="Approximate similarity self-join with a FULL oracle (the "
    "NumPy-literal hyperplane form, retired r13, could only grade "
    "rows-only: the sign of a float projection sum is accumulation-"
    "order-sensitive): fixed-point quantized vectors (round(v*1e6) as "
    "int64) -> 4 seeds x AUTO-bit buckets from literal md5-derived "
    "Rademacher sign masks (similarity.py:rp_sign_masks) -> candidates "
    "share a (seed, bucket) key -> exact integer-dot cosine verify at "
    "0.40, rounded 6dp, Arrow-vectorized (one NumPy int64 matmul per "
    "batch — the r12 interpreted-HOF wall removed). bits = "
    "ceil_log2(n) - 5 (rp_auto_join_params) keeps bucket occupancy "
    "~16-32 so candidates stay LINEAR in N (the r12b ledger's exp "
    "2.12 -> ~1 knob, now self-applied); the oracle replays the rule "
    "with COUNT(*)-gated per-bits tiers. All arithmetic is exact "
    "below 2^53, so DuckDB replays candidate set AND values "
    "bit-for-bit; recall vs brute force asserted in tests.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_approx_join_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    n = emb.count()
    _assert_tier_covered(
        n, _RP_JOIN_TIERS, _rp_join_tier_bounds,
        "similarity_approx_join_portable",
    )
    bits, seeds = S.rp_auto_join_params(n)
    return S.approx_similarity_join_portable(
        emb, threshold=0.40, dim=64, bits=bits, seeds=seeds
    )


def _rp_probe_tier_bounds(bits: int) -> tuple[int, int]:
    """COUNT(*) range over which rp_auto_probe_params picks ``bits``:
    clamp(ceil_log2(n) - 2, 5, 16) == bits. The low clamp folds every
    n <= 2^7 into the bits=5 tier."""
    lo = 1 if bits == 5 else (1 << (bits + 1)) + 1
    hi = 1 << (bits + 2)
    return lo, hi


def _portable_rp_topk_sql(
    src: str = "embeddings",
    query_id: int = 0,
    k: int = 10,
    bits: int = 7,
    seeds: int = 4,
    flips: int = 3,
    radius: int = 2,
    dims: int = 64,
    prefix: str = "rt",
    n_gate: tuple[int, int] | None = None,
    corpus_pred: str | None = None,
    corpus_cte: str | None = None,
    corpus_bucket_cte: str | None = None,
) -> str:
    """CTE chain replaying ann_topk_lsh_portable in DuckDB at FIXED
    knobs: quantize corpus AND query with the same half-away-from-zero
    rule, bucket both under every seed's literal masks, build the
    QUERY-DIRECTED probe set (the query's bucket plus XOR-flips of
    every subset, size <= ``radius``, of the ``flips`` most marginal
    planes — ranked ORDER BY abs(proj), plane, the exact tie rule
    rp_query_probes uses), keep corpus rows sharing a (seed, bucket)
    with any probe, rank by exact integer-dot cosine. Ends in
    ``{prefix}top (vec_id, cos)`` — ordered, LIMIT ``k`` — and
    ``{prefix}cand`` (the candidate set, counted by the recall
    canary's scan-fraction columns). ``n_gate`` empties the corpus
    CTE outside a COUNT(*) range (the auto-tier mechanism)."""
    import itertools

    from bo_sql_spark.operators.similarity import _RP_SCALE, rp_sign_masks

    p = prefix
    masks = rp_sign_masks(seeds, bits)
    corpus_rows = "\n        UNION ALL ".join(
        f"SELECT vec_id, qv, {s} AS seed, "
        + _rp_bucket_expr_sql(masks[s], "qv", dims)
        + f" AS bucket FROM {p}c"
        for s in range(seeds)
    )
    # per-(seed, plane) exact integer projections of the query
    plane_rows = "\n        UNION ALL ".join(
        f"SELECT {s} AS seed, {pl} AS plane, "
        + _rp_plane_proj_sql(masks[s][pl], "qq", dims)
        + f" AS proj FROM {p}qv"
        for s in range(seeds)
        for pl in range(bits)
    )
    # pivot the flips most-marginal plane indexes to columns p1..pt
    rank_cols = ", ".join(
        f"MAX(CASE WHEN rnk = {i} THEN plane END) AS p{i}"
        for i in range(1, flips + 1)
    )
    probe_sels = [f"SELECT seed, bucket FROM {p}qb"]
    for r in range(1, radius + 1):
        for combo in itertools.combinations(range(1, flips + 1), r):
            mask = " + ".join(f"(CAST(1 AS BIGINT) << m.p{i})" for i in combo)
            probe_sels.append(
                f"SELECT m.seed, xor(b.bucket, {mask}) AS bucket"
                f" FROM {p}qm m JOIN {p}qb b USING (seed)"
            )
    probes = "\n        UNION ALL ".join(probe_sels)
    pred = corpus_pred or f"vec_id <> {query_id}"
    gate = ""
    if n_gate is not None:
        lo, hi = n_gate
        gate = (
            f"\n          AND (SELECT COUNT(*) FROM {src}"
            f" WHERE {pred}) BETWEEN {lo} AND {hi}"
        )
    if corpus_bucket_cte is not None:
        # the caller defined a SHARED gated+bucketed corpus CTE for
        # this tier (one quantize AND one bucketing pass for ALL of a
        # batch's query chains — the per-tier continuation of the
        # shared-quantized-corpus trim); skip {p}c/{p}cb entirely
        corpus_part = ""
        cb_name = corpus_bucket_cte
    elif corpus_cte is not None:
        # the caller defined a shared MATERIALIZED quantized-corpus CTE
        # (one quantization pass for ALL chains — the batch oracles'
        # 4x-duplicate-work trim); the COUNT(*) gate still counts the
        # RAW corpus via src+pred so it matches the Spark-side count
        corpus_part = f"""{p}c AS (
        SELECT vec_id, qv FROM {corpus_cte}
        WHERE true{gate}
    ), {p}cb AS (
        {corpus_rows}
    ), """
        cb_name = f"{p}cb"
    else:
        corpus_part = f"""{p}c AS MATERIALIZED (
        SELECT vec_id, qv FROM (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(round(x * {_RP_SCALE}) AS BIGINT)) AS qv
            FROM {src} WHERE {pred})
        WHERE len(list_filter(qv, x -> x <> 0)) > 0{gate}
    ), {p}cb AS (
        {corpus_rows}
    ), """
        cb_name = f"{p}cb"
    return f"""{p}q0 AS (
        SELECT CAST(embedding AS DOUBLE[]) AS v FROM {src} WHERE vec_id = {query_id}
    ), {p}qv AS MATERIALIZED (
        SELECT list_transform(v, x -> CAST(round(x * {_RP_SCALE}) AS BIGINT)) AS qq
        FROM {p}q0
    ), {corpus_part}{p}qp AS MATERIALIZED (
        {plane_rows}
    ), {p}qb AS (
        SELECT seed,
               CAST(SUM(CASE WHEN proj >= 0
                             THEN (CAST(1 AS BIGINT) << plane)
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM {p}qp GROUP BY seed
    ), {p}qm AS (
        SELECT seed, {rank_cols}
        FROM (SELECT seed, plane,
                     row_number() OVER (PARTITION BY seed
                                        ORDER BY abs(proj), plane) AS rnk
              FROM {p}qp)
        GROUP BY seed
    ), {p}qpr AS (
        {probes}
    ), {p}cand AS (
        SELECT DISTINCT c.vec_id, c.qv
        FROM {cb_name} c JOIN {p}qpr q ON c.seed = q.seed AND c.bucket = q.bucket
    ), {p}top AS (
        SELECT vec_id,
               list_dot_product(CAST(qv AS DOUBLE[]), CAST(qq AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(qq AS DOUBLE[]), CAST(qq AS DOUBLE[])))) AS cos
        FROM {p}cand, {p}qv
        ORDER BY cos DESC, vec_id LIMIT {k}
    )"""


def _portable_rp_topk_sql_auto(
    src: str = "embeddings",
    query_id: int = 0,
    k: int = 10,
    dims: int = 64,
    prefix: str = "rt",
    tiers: tuple[int, ...] = _RP_PROBE_TIERS,
    corpus_pred: str | None = None,
    corpus_cte: str | None = None,
    shared_bucket_fmt: str | None = None,
) -> str:
    """AUTO-SIZED twin of _portable_rp_topk_sql: one gated chain per
    ``bits`` tier (n-ranges where rp_auto_probe_params picks that
    bits; flips = bits - 4, radius = 2 for bits <= 7 else 3 — the
    same pure-integer rule the Spark side resolves from its count).
    Exactly one tier's corpus CTE survives its gate; ends in
    ``{prefix}top (vec_id, cos)`` (ordered, LIMIT k) and
    ``{prefix}cand`` (union of tier candidate sets, for the canary's
    scan-fraction columns). Tiers cover n <= 2^12; the query
    functions assert coverage at run time."""
    chains, top_sels, cand_sels = [], [], []
    for b in tiers:
        tp = f"{prefix}t{b}"
        chains.append(
            _portable_rp_topk_sql(
                src=src,
                query_id=query_id,
                k=k,
                bits=b,
                seeds=4,
                flips=b - 4,
                radius=(2 if b <= 7 else 3),
                dims=dims,
                prefix=tp,
                n_gate=_rp_probe_tier_bounds(b),
                corpus_pred=corpus_pred,
                corpus_cte=corpus_cte,
                corpus_bucket_cte=(
                    shared_bucket_fmt.format(b=b) if shared_bucket_fmt else None
                ),
            )
        )
        top_sels.append(f"SELECT vec_id, cos FROM {tp}top")
        cand_sels.append(f"SELECT vec_id FROM {tp}cand")
    return (
        ",\n    ".join(chains)
        + f",\n    {prefix}cand AS (\n        "
        + "\n        UNION ALL ".join(cand_sels)
        + f"\n    ), {prefix}top AS (\n        SELECT vec_id, cos FROM (\n        "
        + "\n        UNION ALL ".join(top_sels)
        + f"\n        ) ORDER BY cos DESC, vec_id LIMIT {k}\n    )"
    )


@register(
    "similarity_ann_lsh_portable",
    oracle=f"""
    WITH {_portable_rp_topk_sql_auto()}
    SELECT vec_id, ROUND(cos, 6) AS cos_sim FROM rttop
    """,
    doc="ANN top-10 via QUERY-DIRECTED multi-probe LSH with a FULL "
    "oracle (the NumPy-plane form, retired r13, graded rows-only): "
    "bits auto-size to ceil_log2(n) - 2 (~2-4-vector buckets) and "
    "recall is bought back by probing the query's bucket PLUS the "
    "XOR-flips of subsets of its flips = bits - 4 most MARGINAL "
    "planes (smallest |projection| — Lv et al. 2007), all computed "
    "DRIVER-SIDE as plain integers and broadcast as a literal probe "
    "table; the corpus side is one Arrow-vectorized quantize+bucket "
    "matmul LEFT-SEMI-joined against it, so only probed buckets' rows "
    "(19-23%, oracle-verified by the recall canary) reach the top-k "
    "heap (TakeOrderedAndProject — no global sort). Measured recall "
    "800 permille vs 300-600 at the r12 single-bucket probe. The "
    "oracle replays quantization, bucketing, margin ranking, probe "
    "generation, and ranking verbatim in COUNT(*)-gated bits tiers.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ann_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    n = corpus.count()
    _assert_tier_covered(
        n, _RP_PROBE_TIERS, _rp_probe_tier_bounds, "similarity_ann_lsh_portable"
    )
    bits, seeds, flips, radius = S.rp_auto_probe_params(n)
    return S.ann_topk_lsh_portable(
        corpus, qvec, k=10, dim=64,
        bits=bits, seeds=seeds, flips=flips, radius=radius,
    )


def _batch_ann_oracle(n_q: int = 4, k: int = 10) -> str:
    """Oracle for the batch portable-ANN probe: one auto-tier chain
    per query id (0..n_q-1), all over the SHARED corpus vec_id >= n_q
    (corpus_pred — so every chain's COUNT(*) gates and knobs resolve
    from the same corpus the Spark batch uses), unioned with a
    query_id column. Each chain is verbatim the single-probe oracle,
    so the batch result being its union IS the served-equals-oneshot
    statement."""
    from bo_sql_spark.operators.similarity import _RP_SCALE, rp_sign_masks

    chains = [
        f"""bqsrc AS MATERIALIZED (
        SELECT vec_id, qv FROM (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(round(x * {_RP_SCALE}) AS BIGINT)) AS qv
            FROM embeddings WHERE vec_id >= {n_q})
        WHERE len(list_filter(qv, x -> x <> 0)) > 0
    )"""
    ]
    # one gated + BUCKETED corpus CTE per tier, shared by every query
    # chain (quantize AND bucketing paid once per tier instead of once
    # per (query, tier) — the r15-candidate continuation of the shared
    # quantized corpus; the COUNT(*) gate still counts the raw corpus
    # so it matches the Spark-side auto-knob count)
    for b in _RP_PROBE_TIERS:
        lo, hi = _rp_probe_tier_bounds(b)
        masks = rp_sign_masks(4, b)
        bucket_rows = "\n        UNION ALL ".join(
            f"SELECT vec_id, qv, {s} AS seed, "
            + _rp_bucket_expr_sql(masks[s], "qv", 64)
            + f" AS bucket FROM sbt{b}c"
            for s in range(4)
        )
        chains.append(
            f"""sbt{b}c AS (
        SELECT vec_id, qv FROM bqsrc
        WHERE (SELECT COUNT(*) FROM embeddings WHERE vec_id >= {n_q})
              BETWEEN {lo} AND {hi}
    ), sbt{b}cb AS MATERIALIZED (
        {bucket_rows}
    )"""
        )
    sels = []
    for i in range(n_q):
        chains.append(
            _portable_rp_topk_sql_auto(
                query_id=i,
                k=k,
                prefix=f"bq{i}x",
                corpus_pred=f"vec_id >= {n_q}",
                shared_bucket_fmt="sbt{b}cb",
            )
        )
        sels.append(
            f"SELECT CAST({i} AS BIGINT) AS query_id, vec_id,"
            f" ROUND(cos, 6) AS cos_sim FROM bq{i}xtop"
        )
    return "WITH " + ",\n    ".join(chains) + "\n    " + "\n    UNION ALL ".join(sels)


@register(
    "similarity_ann_batch_portable",
    oracle=_batch_ann_oracle(),
    doc="BATCH portable ANN (r13 verdict #5): 4 queries, ONE plan — "
    "the serving-amortization twin of similarity_ivf_batch_served for "
    "the RP-LSH path. All queries' probe keys (rp_query_probes, "
    "driver-side ints) broadcast as ONE (query_id, seed, bucket) "
    "literal table; the corpus is quantized + bucketed ONCE (the "
    "Arrow matmul the batch amortizes — a one-shot loop pays it per "
    "query) and joined against it; one Arrow scoring stage against "
    "the literal query matrix; per-query top-10 via a rank window "
    "that plans WindowGroupLimit (~k rows per query below the final "
    "shuffle) instead of 4 TakeOrdered jobs. Per query the result is "
    "BIT-identical to similarity_ann_lsh_portable over the same "
    "corpus; the oracle is literally 4 copies of the single-probe "
    "auto-tier chain over the shared corpus, unioned — "
    "served-equals-oneshot, hash-gated. Measured sf0.1 (warm, 3-run "
    "median): batch 1.13s vs 3.68s for 4 sequential one-shots = "
    "0.31x; per-query amortized 0.28s vs 0.92s (SCALE.md r14).",
    tags=("pipeline", "similarity", "approx", "served"),
)
def similarity_ann_batch_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    corpus = emb.filter(F.col("vec_id") >= 4)
    n = corpus.count()
    _assert_tier_covered(
        n, _RP_PROBE_TIERS, _rp_probe_tier_bounds, "similarity_ann_batch_portable"
    )
    bits, seeds, flips, radius = S.rp_auto_probe_params(n)
    return S.ann_topk_lsh_batch_portable(
        corpus, qvecs, k=10, dim=64,
        bits=bits, seeds=seeds, flips=flips, radius=radius,
    )


@register(
    "stream_rp_index_ingest",
    oracle=f"""
    WITH {_portable_rp_topk_sql_auto()}
    SELECT vec_id, ROUND(cos, 6) AS cos_sim FROM rttop
    """,
    doc="STREAMING ANN-index ingest: the RP store is built by "
    "INDEPENDENT APPENDS (a readStream microbatch whose foreachBatch "
    "splits the corpus into 4 chunks and rp_index_append's each — "
    "band rows land as new files in the same (seed, bucket_pfx) "
    "directories, knobs self-configure from the _rp_meta.json sidecar "
    "after the first append), then rp_index_topk serves the union. "
    "Bucketing is a pure per-row function, so union-of-appended-"
    "indexes == full-corpus index and the served top-10 replays "
    "similarity_ann_lsh_portable's oracle VERBATIM regardless of "
    "batching — the ingest-equals-batch statement stream_bloom_ingest "
    "makes for Bloom (OR) and stream_kmv_ingest for KMV, made for the "
    "ANN store. The knobs are auto-sized from the EXPECTED corpus "
    "count (not the first batch's — the one decision an incremental "
    "index must make up front; re-sizing = rebuild, same as bits in "
    "any LSH store). Per-append file count <= 1 per directory; "
    "compaction is compact_table's job (stream_search_index_compacted "
    "pattern).",
    tags=("pipeline", "similarity", "approx", "streaming", "store"),
)
def stream_rp_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators.similarity import (
        rp_auto_probe_params,
        rp_index_append,
        rp_index_topk,
    )

    emb = _t(spark, sf_dir)["embeddings"]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    n = emb.filter(F.col("vec_id") != 0).count()
    _assert_tier_covered(
        n, _RP_PROBE_TIERS, _rp_probe_tier_bounds, "stream_rp_index_ingest"
    )
    bits, seeds, flips, radius = rp_auto_probe_params(n)
    root = tempfile.mkdtemp(prefix="bosql_rp_stream_")
    store = os.path.join(root, "index")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        corpus = batch_df.filter(F.col("vec_id") != 0)
        for chunk in range(4):
            rp_index_append(
                corpus.filter(F.col("vec_id") % 4 == chunk),
                store, dim=64, bits=bits, seeds=seeds,
            )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rp_index_topk(
        spark, store, qvec, k=10, dim=64, flips=flips, radius=radius
    )


@register(
    "similarity_rp_index_batch_served",
    oracle=_batch_ann_oracle(),
    doc="INDEX-SERVED batch portable ANN: the corpus quantize+bucket "
    "pass is materialized ONCE (materialize_rp_index, auto-sized, "
    "knobs persisted in the _rp_meta.json sidecar and re-read by the "
    "probe — ADVICE r13) and 4 queries probe it in ONE plan: the "
    "UNION of their driver-computed probe keys becomes one set of "
    "(seed, bucket_pfx) PARTITION filters — probed directories are "
    "listed once and SHARED across queries — then the broadcast "
    "(query_id, seed, bucket) table attributes rows per query, one "
    "Arrow scoring stage, WindowGroupLimit per-query top-10. "
    "Composes the r14 batch probe with the r13 bounded index layout; "
    "per query bit-identical to rp_index_topk AND to the one-shot "
    "probe, so it grades against the batch oracle VERBATIM — "
    "served-equals-oneshot at batch grain. The q-queries-one-store-"
    "read economics of similarity_ivf_batch_served, on the RP path.",
    tags=("pipeline", "similarity", "approx", "served"),
)
def similarity_rp_index_batch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.similarity import (
        materialize_rp_index,
        rp_auto_probe_params,
        rp_index_topk_batch,
    )

    emb = _t(spark, sf_dir)["embeddings"]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    corpus = emb.filter(F.col("vec_id") >= 4)
    n = corpus.count()
    _assert_tier_covered(
        n, _RP_PROBE_TIERS, _rp_probe_tier_bounds,
        "similarity_rp_index_batch_served",
    )
    bits, seeds, flips, radius = rp_auto_probe_params(n)
    path = tempfile.mkdtemp(prefix="bosql_rp_bidx_") + "/index"
    materialize_rp_index(corpus, path, dim=64, bits=bits, seeds=seeds)
    return rp_index_topk_batch(
        spark, path, qvecs, k=10, dim=64, flips=flips, radius=radius
    )


@register(
    "similarity_rp_index_served",
    oracle=f"""
    WITH {_portable_rp_topk_sql_auto()}
    SELECT vec_id, ROUND(cos, 6) AS cos_sim FROM rttop
    """,
    doc="INDEX-SERVED portable ANN: the corpus quantize+bucket pass is "
    "materialized ONCE partitioned by (seed, bucket) "
    "(similarity.py:materialize_rp_index — the RP twin of the IVF "
    "assignment and minhash band indexes, auto-sized by the same "
    "rp_auto_probe_params rule as the one-shot), and the probe turns "
    "the query's driver-computed probe keys — its bucket plus the "
    "query-directed marginal-plane flips — into PARTITION FILTERS: "
    "only probed directories are read (plan-pinned; 28 of 512 dirs "
    "at the sf0.01 tier). Bit-identical to the one-shot probe — this "
    "entry grades against similarity_ann_lsh_portable's oracle "
    "VERBATIM, the served-equals-oneshot statement the IVF/BM25 "
    "served paths make.",
    tags=("pipeline", "similarity", "approx", "served"),
)
def similarity_rp_index_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.similarity import (
        materialize_rp_index,
        rp_auto_probe_params,
        rp_index_topk,
    )

    emb = _t(spark, sf_dir)["embeddings"]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    n = corpus.count()
    _assert_tier_covered(
        n, _RP_PROBE_TIERS, _rp_probe_tier_bounds, "similarity_rp_index_served"
    )
    bits, seeds, flips, radius = rp_auto_probe_params(n)
    path = tempfile.mkdtemp(prefix="bosql_rp_index_") + "/index"
    materialize_rp_index(corpus, path, dim=64, bits=bits, seeds=seeds)
    return rp_index_topk(
        spark, path, qvec, k=10, dim=64,
        bits=bits, seeds=seeds, flips=flips, radius=radius,
    )


@register(
    "similarity_ann_recall_portable",
    oracle=f"""
    WITH {_portable_rp_topk_sql_auto()}, exq AS (
        SELECT list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qq
        FROM embeddings WHERE vec_id = 0
    ), exc AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id <> 0
    ), extop AS (
        SELECT vec_id,
               list_dot_product(CAST(qv AS DOUBLE[]), CAST(qq AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(qq AS DOUBLE[]), CAST(qq AS DOUBLE[])))) AS cos
        FROM exc, exq
        ORDER BY cos DESC, vec_id LIMIT 10
    )
    SELECT CAST(10 AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM rttop) AS BIGINT) AS n_probe,
           CAST((SELECT COUNT(*) FROM rttop JOIN extop USING (vec_id)) AS BIGINT) AS n_hits,
           CAST((SELECT COUNT(*) FROM rttop JOIN extop USING (vec_id)) * 1000 // 10 AS BIGINT) AS recall_permille,
           CAST((SELECT COUNT(*) FROM rtcand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id <> 0) AS BIGINT) AS n_corpus,
           CAST((SELECT COUNT(*) FROM rtcand) * 1000
                // (SELECT COUNT(*) FROM embeddings WHERE vec_id <> 0) AS BIGINT) AS scan_permille
    """,
    doc="SELF-MEASURING ANN quality AND cost: recall@10 of the "
    "portable query-directed multi-probe against the exact "
    "quantized-cosine top-10, PLUS the scanned-candidate fraction, "
    "in one row — and because both rankings, the probe rule, and the "
    "candidate set are engine-portable, the recall AND scan numbers "
    "are themselves oracle-verified, not just asserted in a unit "
    "test. At the auto knobs (rp_auto_probe_params) the fixtures "
    "grade recall 800 permille at scan 224/191 permille (sf0.01/"
    "sf0.1) — vs 300-600 permille recall at the r12 single-bucket "
    "probe. The exact side is one TakeOrderedAndProject scan; the "
    "probe side reuses ann_lsh_candidates verbatim. At 100 TB this "
    "is the nightly index-quality canary: both sides are one pass, "
    "output is one row.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ann_recall_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    n_corpus = corpus.count()
    _assert_tier_covered(
        n_corpus, _RP_PROBE_TIERS, _rp_probe_tier_bounds,
        "similarity_ann_recall_portable",
    )
    qq, cands = S.ann_lsh_candidates(corpus, qvec, dim=64)
    cands = cands.cache()
    probe = S._topk_quantized_cosine(cands, qq, 10, "vec_id").select("vec_id")
    cos = S._query_cos_udf(qq)(S.quantize_vec("embedding"))
    exact = (
        corpus.select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    hits = probe.join(exact, "vec_id")
    return (
        probe.agg(F.count(F.lit(1)).alias("n_probe"))
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .crossJoin(
            F.broadcast(cands.agg(F.count(F.lit(1)).alias("n_candidates")))
        )
        .select(
            F.lit(10).cast("long").alias("k"),
            F.col("n_probe").cast("long").alias("n_probe"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") * 1000 / F.lit(10))
            .cast("long")
            .alias("recall_permille"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.lit(n_corpus).cast("long").alias("n_corpus"),
            F.expr(f"(n_candidates * 1000) DIV {n_corpus}")
            .cast("long")
            .alias("scan_permille"),
        )
    )


@register(
    "similarity_ivf_topk",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), qcell AS (
        SELECT cell FROM assigned WHERE vec_id = 0
    ), q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT a.vec_id,
               list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM assigned a
        JOIN vecs e USING (vec_id)
        CROSS JOIN q
        WHERE a.cell = (SELECT cell FROM qcell) AND a.vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="IVF-Flat ANN: coarse-quantize every vector to its nearest of "
    "16 fixed centroids (broadcast argmin, L2 via the expanded "
    "||v||^2 - 2v.c + ||c||^2 form in BOTH engines so float ops agree "
    "bitwise), then exact cosine top-10 inside the query's cell only — "
    "the inverted-file scale path, single probe.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    assigned = S.ivf_assign(emb, cents)
    qrow = assigned.filter(F.col("vec_id") == 0).select("cell", "embedding").first()
    qcell, qvec = qrow["cell"], [float(x) for x in qrow["embedding"]]
    return S.ivf_topk(
        emb.filter(F.col("vec_id") != 0),
        qvec,
        query_cell=qcell,
        k=10,
        centroids=cents,
    )


@register(
    "similarity_ivf_auto_cells",
    oracle="""
    WITH nc AS (
        SELECT CASE WHEN COUNT(*) <= 512 THEN 16
                    WHEN COUNT(*) <= 1024 THEN 32
                    WHEN COUNT(*) <= 2048 THEN 64
                    WHEN COUNT(*) <= 4096 THEN 128
                    WHEN COUNT(*) <= 8192 THEN 256
                    ELSE 512 END AS k
        FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < (SELECT k FROM nc)
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), qcell AS (
        SELECT cell FROM assigned WHERE vec_id = 0
    ), q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT a.vec_id,
               list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM assigned a
        JOIN vecs e USING (vec_id)
        CROSS JOIN q
        WHERE a.cell = (SELECT cell FROM qcell) AND a.vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="IVF-Flat ANN with the cell count AUTO-SIZED from the corpus "
    "(similarity.py:ivf_auto_cells = 2^(ceil_log2(n)-5), ~16-32 "
    "vectors/cell — 16 cells at the sf0.01 fixture, 64 at sf0.1): "
    "the graded statement of the doctrine every IVF-family ledger row "
    "leans on — per-cell work stays bounded only while cells TRACK "
    "the corpus (fixed cells make within-cell scans quadratic; the "
    "r13 semantic-ingest budget measured exactly that onset). Same "
    "broadcast expanded-L2 argmin assignment and in-cell exact-cosine "
    "top-10 as similarity_ivf_topk; the oracle replays the rule as a "
    "CASE over COUNT(*), so the auto choice itself is hash-gated at "
    "every fixture SF.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_auto_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    n = emb.count()
    # the oracle's CASE replays ivf_auto_cells only through 512 cells
    # (n <= 16384) — fail loudly past it instead of hash-mismatching
    assert n <= _IVF_AUTO_MAX_N, (
        f"similarity_ivf_auto_cells: corpus {n} exceeds the oracle's "
        f"replayed CASE range (n <= {_IVF_AUTO_MAX_N}) — extend the CASE"
    )
    k_cells = S.ivf_auto_cells(n)
    cents = emb.filter(F.col("vec_id") < k_cells).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    assigned = S.ivf_assign(emb, cents)
    qrow = assigned.filter(F.col("vec_id") == 0).select("cell", "embedding").first()
    qcell, qvec = qrow["cell"], [float(x) for x in qrow["embedding"]]
    return S.ivf_topk(
        emb.filter(F.col("vec_id") != 0),
        qvec,
        query_cell=qcell,
        k=10,
        centroids=cents,
    )


@register(
    "similarity_ivf_multiprobe",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), probes AS (
        SELECT c_id
        FROM cents CROSS JOIN q
        ORDER BY list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv) + list_dot_product(cv, cv), c_id
        LIMIT 4
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT a.vec_id,
               list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM assigned a
        JOIN vecs e USING (vec_id)
        CROSS JOIN q
        WHERE a.cell IN (SELECT c_id FROM probes) AND a.vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="IVF-Flat ANN with multi-probe: scan the 4 cells nearest the "
    "query instead of 1. Probe selection and cell assignment use the "
    "same expanded-L2 op order in both engines (bitwise-equal floats, "
    "ties to smallest c_id). Measured recall@10 on this fixture: "
    "0.27 single-probe -> 0.55 at 4 probes for a 25% scan fraction "
    "(SCALE.md).",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import dot

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    qcol = F.array(*[F.lit(x) for x in qvec]).cast("array<double>")
    cv = F.col("c_vec").cast("array<double>")
    # Probe selection is IN-ENGINE: top-4 centroids by L2 feed a
    # broadcast LEFT SEMI join inside ivf_topk — no driver collect, the
    # whole query is one lazy plan (probe choice is deterministic
    # either way: same expanded-L2 op order, ties to smallest c_id).
    probes = (
        cents.select(
            "c_id",
            (dot(qcol, qcol) - 2 * dot(qcol, cv) + dot(cv, cv)).alias("_d2"),
        )
        .orderBy("_d2", "c_id")
        .limit(4)
        .select("c_id")
    )
    return S.ivf_topk(
        emb.filter(F.col("vec_id") != 0),
        qvec,
        probe_cells=probes,
        k=10,
        centroids=cents,
    )


@register(
    "similarity_ivf_train_step",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), by_dim AS (
        SELECT a.cell,
               generate_subscripts(e.v, 1) AS pos,
               unnest(e.v) AS x
        FROM assigned a JOIN vecs e USING (vec_id)
    ), dim_means AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, CAST(COUNT(*) AS BIGINT) AS n
        FROM by_dim GROUP BY cell, pos
    )
    SELECT cell,
           CAST(MIN(n) AS BIGINT) AS n_members,
           array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS centroid
    FROM dim_means
    GROUP BY cell
    """,
    doc="One Lloyd (k-means) iteration — the trainer behind the IVF "
    "index: broadcast-argmin assignment (ivf_assign, no vector "
    "shuffle), then per-(cell, dim) partial-aggregated means — shuffle "
    "carries (cell, dim, partial) rows, never vectors — reassembled "
    "sorted by dim so collect_list order can't leak. Loop to "
    "convergence offline, then materialize_ivf_assignment serves "
    "queries from the result (similarity_ivf_served).",
    tags=("pipeline", "similarity", "training"),
)
def similarity_ivf_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return S.ivf_train_step(emb, cents)


@register(
    "similarity_ivf_train2",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents0 AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), a1 AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents0 GROUP BY vec_id
    ), bd1 AS (
        SELECT a1.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
        FROM a1 JOIN vecs e USING (vec_id)
    ), dm1 AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, COUNT(*) AS n FROM bd1 GROUP BY cell, pos
    ), cents1 AS (
        SELECT cell AS c_id, array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS cv
        FROM dm1 GROUP BY cell
    ), a2 AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents1 GROUP BY vec_id
    ), bd2 AS (
        SELECT a2.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
        FROM a2 JOIN vecs e USING (vec_id)
    ), dm2 AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, CAST(COUNT(*) AS BIGINT) AS n
        FROM bd2 GROUP BY cell, pos
    )
    SELECT cell,
           CAST(MIN(n) AS BIGINT) AS n_members,
           array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS centroid
    FROM dm2
    GROUP BY cell
    """,
    doc="TWO chained Lloyd iterations (train-to-convergence shape): "
    "centroids round to 6dp BETWEEN steps so both engines feed each "
    "assignment bit-identical inputs — multi-step training stays "
    "oracle-checkable, and production retrains stay reproducible. "
    "Feed the result to materialize_ivf_assignment and the index the "
    "engine serves (similarity_ivf_served) is trained entirely "
    "in-engine.",
    tags=("pipeline", "similarity", "training"),
)
def similarity_ivf_train2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return S.ivf_train(emb, cents, iters=2)


@register(
    "similarity_ivf_served",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), answer AS (
        SELECT qid, vec_id, sim FROM (
            SELECT CAST(0 AS BIGINT) AS qid, a.vec_id,
                   list_dot_product(e.v, q.v)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS sim
            FROM assigned a
            JOIN vecs e USING (vec_id)
            CROSS JOIN (SELECT v FROM vecs WHERE vec_id = 0) q
            WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 0)
              AND a.vec_id <> 0
            ORDER BY sim DESC, a.vec_id LIMIT 10
        )
        UNION ALL
        SELECT qid, vec_id, sim FROM (
            SELECT CAST(1 AS BIGINT) AS qid, a.vec_id,
                   list_dot_product(e.v, q.v)
                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS sim
            FROM assigned a
            JOIN vecs e USING (vec_id)
            CROSS JOIN (SELECT v FROM vecs WHERE vec_id = 1) q
            WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 1)
              AND a.vec_id <> 1
            ORDER BY sim DESC, a.vec_id LIMIT 10
        )
    )
    SELECT qid AS query_id, vec_id, ROUND(sim, 6) AS cos_sim FROM answer
    """,
    doc="IVF serving path (the 100 TB anti-pattern fix): the coarse "
    "assignment is MATERIALIZED once — parquet partitioned by cell — "
    "and two different query vectors (vec_id 0 and 1) are answered "
    "from that one index build. Each query's `cell IN (...)` filter "
    "lands on the partition column, so the scan prunes to the probed "
    "cell's directory (PartitionFilters pinned by "
    "tests/test_scale_ops.py) instead of re-scoring the corpus per "
    "query as ivf_topk's inline path does.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = tempfile.mkdtemp(prefix="bosql_ivf_") + "/assignment"
    S.materialize_ivf_assignment(emb, cents, path)
    assigned = spark.read.parquet(path)
    parts = []
    for qid in (0, 1):
        qrow = assigned.filter(F.col("vec_id") == qid).first()
        qvec = [float(x) for x in qrow["embedding"]]
        parts.append(
            S.ivf_topk_served(
                spark,
                path,
                qvec,
                query_cells=[qrow["cell"]],
                k=10,
                exclude_id=qid,
            ).select(F.lit(qid).cast("long").alias("query_id"), "vec_id", "cos_sim")
        )
    return parts[0].unionAll(parts[1])


@register(
    "similarity_ivf_batch_served",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), queries AS (
        SELECT CAST(vec_id AS BIGINT) AS qid, v AS qv FROM vecs WHERE vec_id < 4
    ), probed AS (
        SELECT qid, cell, qv FROM (
            SELECT q.qid, c.c_id AS cell, q.qv,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                       list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv)
                       + list_dot_product(c.cv, c.cv), c.c_id) AS rn
            FROM queries q CROSS JOIN cents c
        ) WHERE rn <= 2
    ), scored AS (
        SELECT p.qid, a.vec_id,
               list_dot_product(e.v, p.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS sim
        FROM probed p
        JOIN assigned a ON a.cell = p.cell
        JOIN vecs e ON e.vec_id = a.vec_id
        WHERE a.vec_id <> p.qid
    ), ranked AS (
        SELECT qid, vec_id, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid AS query_id, vec_id, ROUND(sim, 6) AS cos_sim
    FROM ranked WHERE rn <= 10
    """,
    doc="BATCH ANN serving (operators/similarity.py:"
    "ivf_batch_topk_served): four query vectors answered from one "
    "materialized IVF index in ONE plan — the production batch-"
    "inference shape, replacing the per-query plan loop "
    "similarity_ivf_served demonstrates. Probe selection is a per-"
    "query in-engine window over the broadcast centroid table (top-2 "
    "cells each); the (qid, cell, qvec) probe rows broadcast-join the "
    "cell-partitioned store; a per-qid window top-k finishes "
    "(WindowGroupLimit trims below the shuffle). Scales in BOTH "
    "directions at 100 TB: corpus (partition-pruned scan) and query "
    "count (everything partitions by qid or cell, nothing serial).",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_batch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = tempfile.mkdtemp(prefix="bosql_ivf_batch_") + "/assignment"
    S.materialize_ivf_assignment(emb, cents, path)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return S.ivf_batch_topk_served(
        spark, path, queries, cents, n_probe=2, k=10
    )


@register(
    "similarity_ivf_train_serve",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents0 AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), a1 AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents0 GROUP BY vec_id
    ), bd1 AS (
        SELECT a1.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
        FROM a1 JOIN vecs e USING (vec_id)
    ), dm1 AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, COUNT(*) AS n FROM bd1 GROUP BY cell, pos
    ), cents1 AS (
        SELECT cell AS c_id, array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS cv
        FROM dm1 GROUP BY cell
    ), a2 AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents1 GROUP BY vec_id
    ), bd2 AS (
        SELECT a2.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
        FROM a2 JOIN vecs e USING (vec_id)
    ), dm2 AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, COUNT(*) AS n FROM bd2 GROUP BY cell, pos
    ), cents2 AS (
        SELECT cell AS c_id, array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS cv
        FROM dm2 GROUP BY cell
    ), a3 AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents2 GROUP BY vec_id
    ), q AS (
        SELECT v AS qv FROM vecs WHERE vec_id = 0
    ), probes AS (
        SELECT c_id
        FROM cents2 CROSS JOIN q
        ORDER BY list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv) + list_dot_product(cv, cv), c_id
        LIMIT 2
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT a.vec_id,
               list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM a3 a
        JOIN vecs e USING (vec_id)
        CROSS JOIN q
        WHERE a.cell IN (SELECT c_id FROM probes) AND a.vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="IVF end-to-end, train THEN serve in one lazy plan: two Lloyd "
    "iterations from the 16 seed vectors (centroids rounded to 6dp "
    "between and after steps — bit-identical inputs in both engines), "
    "then the query is answered FROM THE TRAINED centroids: assignment "
    "by broadcast argmin, the 2 probe cells nearest the query selected "
    "lazily and pushed down as a BROADCAST SEMI-JOIN on cell (no "
    "driver-side probe collect — the form that still works when the "
    "centroid table itself is too big to collect), exact cosine "
    "top-10 inside the probed cells.",
    tags=("pipeline", "similarity", "training", "approx"),
)
def similarity_ivf_train_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import dot

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cents0 = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    trained = S.ivf_train(emb, cents0, iters=2)
    cents2 = trained.select(
        F.col("cell").alias("c_id"), F.col("centroid").alias("c_vec")
    )
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    qcol = F.array(*[F.lit(x) for x in qvec]).cast("array<double>")
    cv = F.col("c_vec")
    probes = (
        cents2.select(
            "c_id",
            (dot(qcol, qcol) - 2 * dot(qcol, cv) + dot(cv, cv)).alias("_d2"),
        )
        .orderBy("_d2", "c_id")
        .limit(2)
        .select("c_id")
    )
    assigned = S.ivf_assign(emb, cents2)
    return (
        assigned.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probes), assigned["cell"] == probes["c_id"], "left_semi")
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), qcol).alias("_cos"),
        )
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 6).alias("cos_sim"))
    )


@register(
    "similarity_bucket_histogram",
    oracle=None,  # KEPT ROWS-ONLY BY DESIGN (r13 triage): the NumPy
    # hyperplane projections are float sums, whose SIGN is
    # accumulation-order-sensitive — unreplayable by construction; the
    # fixed-point twin similarity_bucket_histogram_portable grades the
    # identical histogram shape bit-for-bit
    doc="LSH bucket occupancy histogram — the data-engineer's skew check "
    "before trusting bucketed ANN at scale; kept as the NATIVE "
    "float-plane demo, with similarity_bucket_histogram_portable as "
    "its oracle-graded fixed-point twin.",
    tags=("pipeline", "similarity"),
)
def similarity_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    return (
        emb.withColumn("bucket", S.hyperplane_bucket("embedding", dim=64, bits=8))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _rp_histogram_sql(
    src: str = "embeddings", bits: int = 8, seeds: int = 2, dims: int = 64
) -> str:
    """DuckDB replay of rp_bucket_histogram, ending in ``rph (seed,
    bucket, n_vectors)`` — same literal masks, quantization, and
    zero-vector exclusion as the Spark side."""
    from bo_sql_spark.operators.similarity import _RP_SCALE, rp_sign_masks

    masks = rp_sign_masks(seeds, bits)
    rows = "\n        UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS seed, CAST("
        + _rp_bucket_expr_sql(masks[s], "qv", dims)
        + " AS BIGINT) AS bucket FROM rphq"
        for s in range(seeds)
    )
    return f"""rphq AS MATERIALIZED (
        SELECT qv FROM (
            SELECT list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(round(x * {_RP_SCALE}) AS BIGINT)) AS qv
            FROM {src})
        WHERE len(list_filter(qv, x -> x <> 0)) > 0
    ), rphb AS (
        {rows}
    ), rph AS (
        SELECT seed, bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM rphb GROUP BY seed, bucket
    )"""


@register(
    "similarity_bucket_histogram_portable",
    oracle=f"""
    WITH {_rp_histogram_sql()}
    SELECT seed, bucket, n_vectors FROM rph
    """,
    doc="LSH bucket occupancy histogram with a FULL oracle (the "
    "NumPy-plane form grades rows-only): portable RP buckets "
    "(quantized vectors x literal md5 sign masks) counted per (seed, "
    "bucket) — at most seeds * 2^bits rows out regardless of corpus "
    "size, map-side combined. The skew check before trusting bucketed "
    "ANN: a hot bucket here is a quadratic candidate join downstream.",
    tags=("pipeline", "similarity"),
)
def similarity_bucket_histogram_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return S.rp_bucket_histogram(t["embeddings"], dim=64, bits=8, seeds=2)


# ------------------------------------------------------ text analysis
@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_words,
           CAST(len(list_filter(
               string_split_regex(
                   regexp_replace(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\\s])', '\\1' || chr(31), 'g'),
                   '\\s|' || chr(31)),
               x -> x <> '')) AS BIGINT) AS n_subwords
    FROM documents
    """,
    doc="Whitespace token count + BPE-ish subword count (letter/digit "
    "runs + punctuation singletons via one regexp pass).",
    tags=("pipeline", "text"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return T.token_count(t["documents"]).select("doc_id", "n_words", "n_subwords")


@register(
    "text_quality",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS mean_word_len,
               CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE) / len(toks) AS stop_ratio,
               CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / greatest(length(norm), 1) AS punct_ratio
        FROM n
    )
    SELECT doc_id, n_tokens,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(stop_ratio, 6)    AS stop_ratio,
           ROUND(punct_ratio, 6)   AS punct_ratio,
           ROUND(least(n_tokens / 100.0, 1.0) * 0.4
                 + least(stop_ratio * 5.0, 1.0) * 0.3
                 + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3, 6) AS quality
    FROM m
    """,
    doc="C4/Gopher-style quality signals: token count, mean word length, "
    "stopword ratio, punctuation ratio, composite score. Pure codegen.",
    tags=("pipeline", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return T.quality_score(t["documents"]).select(
        "doc_id", "n_tokens", "mean_word_len", "stop_ratio", "punct_ratio", "quality"
    )


@register(
    "text_quality_classifier",
    oracle="""
    WITH n AS (
        SELECT doc_id, source,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS mwl,
               CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE) / len(toks) AS stop_ratio,
               CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / greatest(length(norm), 1) AS punct_ratio
        FROM n
    ), scored AS (
        SELECT doc_id, source,
               ROUND(1.0 / (1.0 + exp(-(-1.2
                   + 2.0 * least(n_tokens / 100.0, 1.0)
                   + 3.0 * stop_ratio
                   - 4.0 * punct_ratio
                   + 0.15 * mwl))), 6) AS q_score
        FROM m
    )
    SELECT doc_id, source, q_score,
           CASE WHEN q_score >= 0.5 THEN 'keep' ELSE 'drop' END AS q_label
    FROM scored
    """,
    doc="Model-backed quality filtering served as pure expressions: a "
    "deterministic logistic model (fixed literal weights standing in "
    "for trained coefficients) over the quality signals — "
    "sigmoid(b + w.x) entirely inside whole-stage codegen, no UDF or "
    "model server in the scan path. keep/drop cuts on the ROUNDED "
    "score so a ULP of exp() divergence can't flip membership.",
    tags=("pipeline", "text", "training"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return T.quality_classifier(t["documents"]).select(
        "doc_id", "source", "q_score", "q_label"
    )


@register(
    "text_lang_id",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), hits AS (
        SELECT doc_id, lang,
               len(list_filter(tok, x -> x IN ('der','die','und','das','ist'))) AS h_de,
               len(list_filter(tok, x -> x IN ('the','and','of','to','a')))     AS h_en,
               len(list_filter(tok, x -> x IN ('el','la','los','que','de')))    AS h_es,
               len(list_filter(tok, x -> x IN ('le','la','et','les','des')))    AS h_fr,
               len(list_filter(tok, x -> x IN ('de','shi','le','wo','ni')))     AS h_zh
        FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
                ELSE 'zh' END AS lang_guess
    FROM hits
    """,
    doc="Marker-word language ID (argmax over per-language common-word "
    "hit counts, ties -> lexicographically first). The fixture text is "
    "synthetic word salad, so this gates the OPERATOR, not accuracy.",
    tags=("pipeline", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return T.lang_id(t["documents"]).select("doc_id", "lang", "lang_guess")


@register(
    "text_lang_confusion",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), hits AS (
        SELECT doc_id, lang,
               len(list_filter(tok, x -> x IN ('der','die','und','das','ist'))) AS h_de,
               len(list_filter(tok, x -> x IN ('the','and','of','to','a')))     AS h_en,
               len(list_filter(tok, x -> x IN ('el','la','los','que','de')))    AS h_es,
               len(list_filter(tok, x -> x IN ('le','la','et','les','des')))    AS h_fr,
               len(list_filter(tok, x -> x IN ('de','shi','le','wo','ni')))     AS h_zh
        FROM toks
    ), guessed AS (
        SELECT lang,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
                    WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_guess
        FROM hits
    )
    SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM guessed GROUP BY lang, lang_guess
    """,
    doc="Language-ID confusion matrix (ground-truth lang x guess): the "
    "evaluation aggregate a pipeline runs before trusting a classifier "
    "at scale — one groupBy over the classified corpus.",
    tags=("pipeline", "text"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        T.lang_id(t["documents"])
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               AVG(value)         AS mu,
               stddev_samp(value) AS sd
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 2) AS value,
           ROUND((e.value - s.mu) / s.sd, 4) AS z_score
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sd) > 3
    """,
    doc="Z-score outlier detection per event_type: grouped moments "
    "joined back (broadcast — |types| rows) and filtered at |z| > 3 — "
    "the standard data-quality gate before training ingestion.",
    tags=("pipeline", "events"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("z_score"),
        )
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH n AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        FROM documents
    ), p AS (
        SELECT doc_id, norm,
               unnest(generate_series(1, greatest(length(norm) - 29, 1))) AS pos
        FROM n
    )
    SELECT doc_id, MIN(md5(substr(norm, pos, 30))) AS fp_min,
                   MAX(md5(substr(norm, pos, 30))) AS fp_max
    FROM p
    GROUP BY doc_id
    """,
    doc="Winnowing-style rolling fingerprint: min/max md5 over all "
    "30-char windows of normalized text (shift-tolerant signature; "
    "explode -> hash -> groupBy, sub-document parallel).",
    tags=("pipeline", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return T.fingerprint(t["documents"])


@register(
    "text_vocab_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS tok
        FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM toks
    GROUP BY tok
    ORDER BY doc_freq DESC, tok
    LIMIT 50
    """,
    doc="Corpus vocabulary by document frequency (distinct tokens per "
    "doc -> explode -> count -> top-50). The BPE-training / "
    "stopword-discovery primitive; map-side partial agg keeps the "
    "shuffle at |vocab| rows.",
    tags=("pipeline", "text"),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
            )
        ).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "tok")
        .limit(50)
    )


@register(
    "dedup_char_ngram_jaccard",
    oracle="""
    WITH n AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        FROM documents WHERE doc_id < 60
    ), g AS (
        SELECT doc_id,
               list_distinct(list(substr(norm, CAST(pos AS BIGINT), 5))) AS grams
        FROM n, unnest(generate_series(1, greatest(length(norm) - 4, 1))) AS u(pos)
        GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jacc
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
    """,
    doc="Character 5-gram Jaccard near-dup pairs (subset-bounded "
    "O(n^2) ground truth) — the character-level twin of "
    "dedup_ngram_jaccard, robust to tokenization differences.",
    tags=("pipeline", "dedup", "text"),
)
def dedup_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import char_ngrams

    t = _t(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 60)
    g = docs.select("doc_id", char_ngrams("text", 5).alias("grams"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = (F.size("ga") + F.size("gb") - F.size(F.array_intersect("ga", "gb"))).cast(
        "double"
    )
    jacc = inter / union
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jacc_raw", jacc)
        .filter(F.col("jacc_raw") >= 0.5)
        .select("id_a", "id_b", F.round("jacc_raw", 6).alias("jacc"))
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS sum_value
    FROM events
    GROUP BY k
    """,
    doc="JSON extraction from the events.props payload column + "
    "group-agg on the extracted key.",
    tags=("pipeline", "text", "events"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["events"]
        .select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# -------------------------------------------------------- multimodal
@register(
    "decontaminate_survivors",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), sh AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(tok) - 5 + 2, 2)),
                       i -> array_to_string(tok[i:i+4], ' ')))) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> ''
    ), contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM sh s
        JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 25 = 0) e
          USING (shingle)
        WHERE s.doc_id % 25 <> 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 25 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="Benchmark decontamination: docs with doc_id % 25 = 0 act as "
    "the eval set; any train doc sharing a 5-word shingle with it is "
    "dropped. The eval shingle set is DISTINCT + broadcast (benchmarks "
    "are small), so the corpus scans once and never shuffles its text "
    "— the LEFT ANTI join removes hits by doc_id. Catches the "
    "train-on-test leakage exact dedup can't (partial overlap).",
    tags=("pipeline", "dedup", "training"),
)
def decontaminate_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    train = docs.filter(F.col("doc_id") % 25 != 0)
    evalset = docs.filter(F.col("doc_id") % 25 == 0)
    survivors, _ = D.decontaminate(train, evalset, k=5)
    return survivors.select("doc_id", "source")


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           'image/fake'                            AS media_type,
           CAST(n_chars % 64 + 1 AS BIGINT)        AS width,
           CAST(doc_id % 48 + 1 AS BIGINT)         AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(hex(encode(text)), 1, 16)        AS head_hex
    FROM documents
    """,
    doc="Multimodal plumbing end-to-end: synthesize binary blobs "
    "(header + payload) JVM-side, decode via Arrow-batched mapInPandas "
    "(the pluggable codec leaf), emit typed metadata. The oracle "
    "recomputes every decoded field from first principles — this gates "
    "the full distributed decode path, not just the schema.",
    tags=("pipeline", "multimodal"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_fake_blob_df(t["documents"])
    decoded = M.decode_image(blobs, codec="fake")
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "n_bytes",
        F.hex("payload_head").alias("head_hex"),
    )


@register(
    "multimodal_decode_pointers",
    oracle="""
    SELECT doc_id,
           'image/fake'                            AS media_type,
           CAST(n_chars % 64 + 1 AS BIGINT)        AS width,
           CAST(doc_id % 48 + 1 AS BIGINT)         AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(hex(encode(text)), 1, 16)        AS head_hex
    FROM documents
    """,
    doc="URI+byte-range media source: blobs are packed into shard files "
    "(write_media_store), the table keeps only (uri, offset, length) "
    "pointers, and decode runs on blobs re-fetched by ranged reads "
    "(fetch_media) — the object-store layout at 100 TB. Oracle-checked "
    "twin of multimodal_decode: identical decoded output proves the "
    "pack -> pointer -> ranged-fetch -> decode round trip is lossless.",
    tags=("pipeline", "multimodal"),
)
def multimodal_decode_pointers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    t = _t(spark, sf_dir)
    blobs = M.make_fake_blob_df(t["documents"])
    base = tempfile.mkdtemp(prefix="bosql_media_")
    store = os.path.join(base, "store")
    os.makedirs(store, exist_ok=True)
    ptr_path = os.path.join(base, "pointers")
    # Materialize pointers first: shards must be flushed and closed
    # before any ranged read opens them.
    M.write_media_store(blobs, store).write.mode("overwrite").parquet(ptr_path)
    pointers = spark.read.parquet(ptr_path)
    decoded = M.decode_image(M.fetch_media(pointers), codec="fake")
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "n_bytes",
        F.hex("payload_head").alias("head_hex"),
    )


@register(
    "multimodal_stats",
    oracle="""
    SELECT doc_id,
           CAST(12 + octet_length(encode(text)) AS BIGINT) AS blob_bytes,
           'image/fake' AS mime,
           source       AS origin
    FROM documents
    """,
    doc="Metadata-only media stats (no decode) — the 'filter before you "
    "decode' step; blob length = 12-byte header + utf-8 payload.",
    tags=("pipeline", "multimodal"),
)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_fake_blob_df(t["documents"])
    return M.media_stats(blobs).select("doc_id", "blob_bytes", "mime", "origin")


@register(
    "rollup_daily_served",
    oracle="""
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS sum_value,
           ROUND(MIN(value), 6)      AS min_value,
           ROUND(MAX(value), 6)      AS max_value
    FROM events
    GROUP BY day_start, event_type
    """,
    doc="Hypertable-style continuous aggregate: materialize an HOURLY "
    "rollup (partitioned parquet), then serve the DAILY query by "
    "re-aggregating the rollup partials — the oracle aggregates raw "
    "events directly, proving hour->day nesting is lossless for "
    "algebraic aggregates.",
    tags=("pipeline", "rollup", "events"),
)
def rollup_daily_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.rollup_mat import (
        daily_from_hourly,
        materialize_hourly_rollup,
    )

    t = _t(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="bosql_rollup_") + "/hourly"
    materialize_hourly_rollup(t["events"], path)
    daily = daily_from_hourly(spark, path)
    return daily.select(
        "day_start",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "rollup_incremental_refresh",
    oracle="""
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS sum_value,
           ROUND(MIN(value), 6)      AS min_value,
           ROUND(MAX(value), 6)      AS max_value
    FROM events
    GROUP BY day_start, event_type
    """,
    doc="Continuous-aggregate REFRESH path: materialize the hourly "
    "rollup from half the events (even event_ids), incrementally fold "
    "in the other half with refresh_hourly_rollup — late data landing "
    "in every existing bucket, the adversarial case for partial "
    "merging — then serve the daily query from the refreshed rollup. "
    "The oracle aggregates raw events directly: count/sum/min/max "
    "partials must merge losslessly. Refresh rewrites only the day "
    "partitions the batch touches (dynamic partition overwrite) — "
    "O(batch) per ingest at 100 TB, not O(history).",
    tags=("pipeline", "rollup", "events"),
)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.rollup_mat import (
        daily_from_hourly,
        materialize_hourly_rollup,
        refresh_hourly_rollup,
    )

    t = _t(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="bosql_rollup_inc_") + "/hourly"
    materialize_hourly_rollup(t["events"].filter(F.col("event_id") % 2 == 0), path)
    refresh_hourly_rollup(
        spark, t["events"].filter(F.col("event_id") % 2 == 1), path
    )
    daily = daily_from_hourly(spark, path)
    return daily.select(
        "day_start",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(n_chars % 64 + 1 AS BIGINT) AS width,
               CAST(doc_id % 48 + 1 AS BIGINT)  AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           greatest(1, (width * 16 + greatest(width, height) - 1) // greatest(width, height))  AS new_width,
           greatest(1, (height * 16 + greatest(width, height) - 1) // greatest(width, height)) AS new_height
    FROM dims
    """,
    doc="Multimodal resize: longest side scaled to 16 preserving aspect "
    "(ceil), computed inside the Arrow-batched codec stub; the oracle "
    "re-derives the integer dimension math from first principles.",
    tags=("pipeline", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_fake_blob_df(t["documents"])
    return M.resize_media(blobs, max_side=16)


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id, text,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               unnest(generate_series(0, 3)) AS frame_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT)            AS frame_idx,
           (frame_idx * n) // 4                 AS byte_offset,
           sha256(substr(text, CAST((frame_idx * n) // 4 + 1 AS BIGINT), 16)) AS frame_sha
    FROM f
    """,
    doc="Frame sampling (1 -> n row-expanding mapInPandas): 4 evenly "
    "spaced (offset, payload-window sha256) records per blob — the "
    "ffmpeg-sampler shape with a deterministic stand-in for the decoded "
    "frame. Oracle recomputes offsets and hashes (documents are ASCII, "
    "so text substrings ARE the payload byte windows).",
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_fake_blob_df(t["documents"])
    return M.sample_frames(blobs, n_frames=4)


# ------------------------------------------------------------ as-of
@register(
    "asof_join_purchases",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS tsn, value
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS tsn,
               value AS p_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.tsn,
           p.p_event_id, ROUND(p.p_value, 2) AS p_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.tsn >= p.tsn
    """,
    doc="As-of join: each click gets the user's most recent prior "
    "purchase. Spark lacks this operator natively — implemented as a "
    "cogrouped applyInPandas merge_asof (one shuffle per side on "
    "user_id, Arrow batches, sorted two-pointer per group). Compared "
    "on exact int64 micros against DuckDB's native ASOF JOIN (DuckDB "
    "reads the ns parquet column at us resolution).",
    tags=("pipeline", "asof"),
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ev = t["events"]
    tsn_us = F.expr("ts_ns DIV 1000")  # us granularity, matching DuckDB's read
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", tsn_us.alias("tsn"), "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        tsn_us.alias("tsn"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        clicks, purchases, on="tsn", by="user_id", right_cols=["p_event_id", "p_value"]
    )
    return joined.select(
        "event_id", "user_id", "tsn", "p_event_id", F.round("p_value", 2).alias("p_value")
    )


_RJ_W = 300_000_000_000  # 5 min in nanos: bucket width == interval length


@register(
    "range_join_incidents",
    oracle=f"""
    WITH err AS (
        SELECT event_id AS incident_id, epoch_ns(ts) AS start_ns,
               epoch_ns(ts) + {_RJ_W} AS end_ns
        FROM events WHERE event_type = 'error' AND ts IS NOT NULL
    ), oth AS (
        SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value FROM events
        WHERE event_type <> 'error' AND ts IS NOT NULL
    )
    SELECT incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_follow,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM oth JOIN err
      ON oth.ts_ns >= err.start_ns AND oth.ts_ns < err.end_ns
    GROUP BY incident_id
    ORDER BY incident_id
    """,
    doc="Batch RANGE JOIN via bucket expansion (operators/asof.py:"
    "range_join_bucketed) — the other join Spark lacks natively: "
    "every non-error event joined to the 5-minute incident window of "
    "each error event, aggregated per incident. The naive BETWEEN "
    "join plans as BroadcastNestedLoopJoin (O(L*R) comparisons, "
    "single-task at scale; the DuckDB oracle RUNS that naive form as "
    "ground truth); bucketing by ts DIV w with the intervals exploded "
    "to their covered buckets turns it into a plain hash equi-join + "
    "exact-predicate filter — shuffle |L| + 2|R| rows at w == "
    "interval length, and NO post-dedup because a (left, interval) "
    "pair shares exactly one bucket, the left row's own. All-integer "
    "int64-nanos bucket arithmetic; plan-pinned to contain a hash "
    "join and no nested-loop/cartesian node (tests/test_plans.py).",
    tags=("pipeline", "asof", "join"),
)
def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.asof import range_join_bucketed

    ev = _t(spark, sf_dir)["events"].filter(F.col("ts_ns").isNotNull())
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ns").alias("start_ns"),
        (F.col("ts_ns") + F.lit(_RJ_W)).alias("end_ns"),
    )
    oth = ev.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("f_event_id"), "user_id", "ts_ns", "value"
    )
    j = range_join_bucketed(oth, err, "ts_ns", "start_ns", "end_ns", _RJ_W)
    return (
        j.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_follow"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_value_cents"),
        )
        .orderBy("incident_id")
    )


_IOV_ERR_W = 300_000_000_000  # 5 min incident windows
_IOV_CLK_W = 120_000_000_000  # 2 min click-activity windows


@register(
    "interval_overlap_incidents",
    oracle=f"""
    WITH err AS (
        SELECT event_id AS incident_id, epoch_ns(ts) AS e_start,
               epoch_ns(ts) + {_IOV_ERR_W} AS e_end
        FROM events WHERE event_type = 'error' AND ts IS NOT NULL
    ), clk AS (
        SELECT event_id AS click_id, user_id, epoch_ns(ts) AS c_start,
               epoch_ns(ts) + {_IOV_CLK_W} AS c_end
        FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    )
    SELECT incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(LEAST(e_end, c_end) - GREATEST(e_start, c_start))
                AS BIGINT) AS overlap_ns
    FROM err JOIN clk
      ON e_start < c_end AND c_start < e_end
    GROUP BY incident_id
    ORDER BY incident_id
    """,
    doc="INTERVAL-INTERVAL overlap join (operators/asof.py:"
    "interval_overlap_join) — the third temporal join Spark lacks "
    "natively (asof = point-in-time, range = point-in-interval, this "
    "= interval-vs-interval): every 5-minute error-incident window "
    "joined to every OVERLAPPING 2-minute click-activity window, "
    "aggregated per incident with the exact integer-nanos overlap "
    "length. The naive overlap predicate plans as a nested-loop "
    "(the DuckDB oracle RUNS that naive form as ground truth); both "
    "sides bucket-explode and hash-join on the bucket, with the pair "
    "emitted only from its CANONICAL bucket (the intersection's "
    "first: greatest(starts) DIV w) — an integer comparison instead "
    "of a global pair dedup. Plan-pinned hash join, no NLJ "
    "(tests/test_plans.py); brute-force parity across widths "
    "unit-pinned.",
    tags=("pipeline", "asof", "join"),
)
def interval_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.asof import interval_overlap_join

    ev = _t(spark, sf_dir)["events"].filter(F.col("ts_ns").isNotNull())
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ns").alias("e_start"),
        (F.col("ts_ns") + F.lit(_IOV_ERR_W)).alias("e_end"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_ns").alias("c_start"),
        (F.col("ts_ns") + F.lit(_IOV_CLK_W)).alias("c_end"),
    )
    j = interval_overlap_join(
        err, clk, "e_start", "e_end", "c_start", "c_end", _IOV_ERR_W
    )
    return (
        j.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(
                F.least("e_end", "c_end") - F.greatest("e_start", "c_start")
            )
            .cast("long")
            .alias("overlap_ns"),
        )
        .orderBy("incident_id")
    )


@register(
    "sketch_quantile_sampled",
    oracle="""
    WITH samp AS (
        SELECT l_extendedprice AS x
        FROM lineitem
        WHERE CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                            AS VARCHAR)), 1, 15))
                   AS BIGINT) % 8 = 0
          AND l_extendedprice IS NOT NULL
    ), r AS (
        SELECT x, row_number() OVER (ORDER BY x) AS rnk,
               COUNT(*) OVER () AS n
        FROM samp
    ), picks AS (
        SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE), 500000),
                              (CAST(0.95 AS DOUBLE), 950000)) p(q, qm)
    )
    SELECT q,
           CAST(max(n) AS BIGINT) AS sample_n,
           -- rank in EXACT integer micros: CEIL(q*n) on DOUBLE q ceils
           -- one rank too high whenever q*n is integral (0.95 as a
           -- double sits just above the decimal)
           max(CASE WHEN rnk = GREATEST(1, (qm * n + 999999) // 1000000)
                    THEN x END) AS est
    FROM r, picks GROUP BY q ORDER BY q
    """,
    doc="Portable mergeable quantile sketch (operators/heavy_hitters"
    ".py:sampled_quantiles): p50/p95 of l_extendedprice from a "
    "DETERMINISTIC 1/8 hash sample of row keys (md5-prefix mod d — "
    "the sketch IS the sample, so shards merge by concatenation and "
    "any engine replays the same sample and the same rank-ceil(q*m) "
    "estimates exactly; GK/t-digest retain engine-private elements "
    "and can never oracle-match — cf. percentile_approx's degenerate-"
    "exact registration). Rank error is the sampling bound "
    "O(sqrt(q(1-q)/m)). Execution is global-window-free: value-range "
    "shards + per-shard row_number + an n_shards-row broadcast "
    "offsets table (the contiguous-shard trick), so no task ever "
    "holds more than ~sample/n_shards rows; two scalar driver stats "
    "(count, min/max) are the documented scalar-stat edge.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_quantile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import heavy_hitters as HH

    li = _t(spark, sf_dir)["lineitem"].withColumn(
        "_lineid", F.expr("l_orderkey * 10 + l_linenumber")
    )
    return HH.sampled_quantiles(
        li, "l_extendedprice", "_lineid", qs=(0.5, 0.95), d=8
    )


@register(
    "sketch_quantile_sampled_by",
    oracle="""
    WITH samp AS (
        SELECT o_orderpriority, o_totalprice AS x
        FROM orders
        WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                   AS BIGINT) % 4 = 0
          AND o_totalprice IS NOT NULL
    ), r AS (
        SELECT o_orderpriority, x,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY x)
                   AS rnk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM samp
    ), picks AS (
        SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE), 500000),
                              (CAST(0.95 AS DOUBLE), 950000)) p(q, qm)
    )
    SELECT o_orderpriority, q,
           CAST(max(n) AS BIGINT) AS sample_n,
           max(CASE WHEN rnk = GREATEST(1, (qm * n + 999999) // 1000000)
                    THEN x END) AS est
    FROM r, picks GROUP BY o_orderpriority, q
    ORDER BY o_orderpriority, q
    """,
    doc="Per-GROUP portable quantile sketch (operators/heavy_hitters"
    ".py:sampled_quantiles_by): p50/p95 of o_totalprice per order "
    "priority from the same deterministic 1/4 md5-prefix sample — "
    "one shuffle keyed by the group columns, per-group rank picks in "
    "exact integer-micros arithmetic (both engines; float CEIL(q*n) "
    "ceils one rank too high when q*n is integral), no scalar driver "
    "stats. The oracle replays sample, ranks, and picks verbatim.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_quantile_sampled_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import heavy_hitters as HH

    o = _t(spark, sf_dir)["orders"]
    return HH.sampled_quantiles_by(
        o, "o_totalprice", "o_orderkey", ["o_orderpriority"], qs=(0.5, 0.95), d=4
    )


@register(
    "stream_sketch_quantiles",
    oracle="""
    WITH samp AS (
        SELECT l_extendedprice AS x
        FROM lineitem
        WHERE CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                            AS VARCHAR)), 1, 15))
                   AS BIGINT) % 8 = 0
          AND l_extendedprice IS NOT NULL
    ), r AS (
        SELECT x, row_number() OVER (ORDER BY x) AS rnk,
               COUNT(*) OVER () AS n
        FROM samp
    ), picks AS (
        SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE), 500000),
                              (CAST(0.95 AS DOUBLE), 950000)) p(q, qm)
    )
    SELECT q,
           CAST(max(n) AS BIGINT) AS sample_n,
           max(CASE WHEN rnk = GREATEST(1, (qm * n + 999999) // 1000000)
                    THEN x END) AS est
    FROM r, picks GROUP BY q ORDER BY q
    """,
    doc="STREAMING portable quantiles (foreachBatch): each microbatch "
    "appends its DETERMINISTIC 1/8 hash-sample rows to a store, and "
    "the drained store IS the merged sample — quantile estimates over "
    "an unbounded stream with O(n/d) state, no rescans, and the same "
    "rank picks as the batch sketch (sketch_quantile_sampled's oracle "
    "verbatim), because sample of a union == union of samples. "
    "Completes the mergeable streaming sketch family: CM (sum), HLL "
    "(max), heavy hitters (MG + recount), quantiles (concat).",
    tags=("pipeline", "streaming", "sketch"),
)
def stream_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators import heavy_hitters as HH

    li = _t(spark, sf_dir)["lineitem"]
    root = tempfile.mkdtemp(prefix="bosql_q_stream_")
    store = os.path.join(root, "sample")

    stream = (
        spark.readStream.schema(li.schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        h = F.conv(
            F.substring(
                F.md5(F.expr("l_orderkey * 10 + l_linenumber").cast("string")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        (
            batch_df.filter(F.col("l_extendedprice").isNotNull())
            .filter(F.pmod(h, F.lit(8)) == 0)
            .select(F.col("l_extendedprice").alias("x"))
            .write.mode("append")
            .parquet(store)
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    drained = spark.read.parquet(store).withColumn("_k", F.lit(1))
    # d=1: the store rows ARE the sample; the rank-pick machinery is
    # reused unchanged (value-range shards + broadcast offsets)
    return HH.sampled_quantiles(drained, "x", "_k", qs=(0.5, 0.95), d=1)


@register(
    "graph_pagerank_knn",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN vecs ve USING (vec_id)
    ), prs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ), edges AS (
        SELECT vec_id AS src, neighbor_id AS dst
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
              FROM prs)
        WHERE rnk <= 5
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS dg FROM edges GROUP BY src),
    s0 AS (SELECT node, CAST(1000000 // n AS BIGINT) AS score
           FROM nodes CROSS JOIN nn),
    s1 AS (
        SELECT nodes.node,
               CAST(150 * 1000000 // (1000 * nn.n)
                    + 850 * COALESCE(i0.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s0 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i0 ON nodes.node = i0.node
    ),
    s2 AS (
        SELECT nodes.node,
               CAST(150 * 1000000 // (1000 * nn.n)
                    + 850 * COALESCE(i1.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s1 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i1 ON nodes.node = i1.node
    ),
    s3 AS (
        SELECT nodes.node,
               CAST(150 * 1000000 // (1000 * nn.n)
                    + 850 * COALESCE(i2.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s2 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i2 ON nodes.node = i2.node
    )
    SELECT node AS vec_id, score FROM s3 ORDER BY vec_id
    """,
    doc="PageRank importance over the corpus k-NN similarity graph "
    "(operators/graph.py:pagerank on similarity.knn_graph edges): the "
    "graph step of importance-weighted sampling / seed selection / "
    "spam demotion. INTEGER fixed-point throughout (micros scores, "
    "teleport (1000-d)*10^6 DIV (1000n), per-edge score DIV outdeg, "
    "damped (d*sum) DIV 1000), so the oracle replays all 3 unrolled "
    "iterations bit-for-bit — floats would drift with sum order. "
    "Each iteration is one hash join + one groupBy (message passing; "
    "no global windows, no driver node state); lineage checkpoints "
    "every few iterations for long runs. The knn edge set has no "
    "dangling nodes by construction.",
    tags=("pipeline", "graph", "similarity"),
)
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import pagerank

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return (
        pagerank(edges, n_iter=3)
        .select(F.col("node").alias("vec_id"), "score")
        .orderBy("vec_id")
    )


@register(
    "graph_label_propagation",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN vecs ve USING (vec_id)
    ), prs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ), edges AS (
        SELECT vec_id AS src, neighbor_id AS dst
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
              FROM prs)
        WHERE rnk <= 5
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), seeds AS (
        SELECT vec_id AS node, CAST(vec_id % 3 AS BIGINT) AS lbl
        FROM vecs WHERE vec_id < 30
    ),
    l0 AS (SELECT n.node, s.lbl FROM nodes n LEFT JOIN seeds s USING (node)),
    p0 AS (
        SELECT node, lbl AS new_lbl FROM (
            SELECT v.node, v.lbl, row_number() OVER (
                PARTITION BY v.node ORDER BY v.cnt DESC, v.lbl ASC) AS rn
            FROM (SELECT e.dst AS node, c.lbl, COUNT(*) AS cnt
                  FROM edges e JOIN l0 c ON e.src = c.node
                  WHERE c.lbl IS NOT NULL
                  GROUP BY e.dst, c.lbl) v
        ) WHERE rn = 1
    ),
    l1 AS (
        SELECT n.node, COALESCE(s.lbl, p.new_lbl, c.lbl) AS lbl
        FROM nodes n
        LEFT JOIN l0 c USING (node)
        LEFT JOIN seeds s USING (node)
        LEFT JOIN p0 p USING (node)
    ),
    p1 AS (
        SELECT node, lbl AS new_lbl FROM (
            SELECT v.node, v.lbl, row_number() OVER (
                PARTITION BY v.node ORDER BY v.cnt DESC, v.lbl ASC) AS rn
            FROM (SELECT e.dst AS node, c.lbl, COUNT(*) AS cnt
                  FROM edges e JOIN l1 c ON e.src = c.node
                  WHERE c.lbl IS NOT NULL
                  GROUP BY e.dst, c.lbl) v
        ) WHERE rn = 1
    ),
    l2 AS (
        SELECT n.node, COALESCE(s.lbl, p.new_lbl, c.lbl) AS lbl
        FROM nodes n
        LEFT JOIN l1 c USING (node)
        LEFT JOIN seeds s USING (node)
        LEFT JOIN p1 p USING (node)
    )
    SELECT node AS vec_id, CAST(lbl AS BIGINT) AS label
    FROM l2 ORDER BY vec_id
    """,
    doc="Semi-supervised label propagation over the corpus k-NN graph "
    "(operators/graph.py:label_propagate): 30 seed labels (vec_id % "
    "3) spread 2 hops through the similarity structure — the weak-"
    "supervision / quality-classifier-spread step (label thousands, "
    "propagate to billions). Deterministic by construction: majority "
    "vote with MIN-label tie-break (a max_by over a (cnt, -label) "
    "struct — counts stay the shuffle unit, no per-node window), "
    "seeds clamped, no-vote nodes keep their label; the oracle "
    "replays both unrolled iterations exactly. Same message-passing "
    "scale shape as graph_pagerank_knn, checkpointed edges.",
    tags=("pipeline", "graph", "similarity"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import label_propagate

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    seeds = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("node"),
        (F.col("vec_id") % 3).cast("long").alias("label"),
    )
    return (
        label_propagate(edges, seeds, n_iter=2)
        .select(F.col("node").alias("vec_id"), "label")
        .orderBy("vec_id")
    )


@register(
    "drift_chisq_event_types",
    oracle="""
    WITH counts AS (
        SELECT event_type AS category,
               COUNT(*) FILTER (WHERE dayofweek(ts) NOT IN (0, 6)) AS n_a,
               COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS n_b
        FROM events GROUP BY event_type
    ), tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts)
    SELECT category,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN (n_a + n_b) = 0 OR ta = 0 THEN 0 ELSE CAST((n_a * (ta + tb) - (n_a + n_b) * ta) AS HUGEINT) * (n_a * (ta + tb) - (n_a + n_b) * ta) * 1000000 // (CAST((ta + tb) AS HUGEINT) * (n_a + n_b) * ta) END
                + CASE WHEN (n_a + n_b) = 0 OR tb = 0 THEN 0 ELSE CAST((n_b * (ta + tb) - (n_a + n_b) * tb) AS HUGEINT) * (n_b * (ta + tb) - (n_a + n_b) * tb) * 1000000 // (CAST((ta + tb) AS HUGEINT) * (n_a + n_b) * tb) END AS BIGINT) AS chisq_micros
    FROM counts, tot ORDER BY category
    """,
    doc="Distribution-drift detection (operators/drift.py:"
    "two_sample_chisq): Pearson two-sample chi-square of the "
    "event-type mix, weekday vs weekend — the per-snapshot check a "
    "continuously-ingested corpus runs on its source/language/"
    "quality-bucket composition. INTEGER fixed-point throughout: the "
    "contribution (a-E)^2/E is rewritten d^2 DIV (N*(a+b)*N_side) "
    "with d = a*N-(a+b)*N_side, computed in DECIMAL(38)/HUGEINT "
    "(d^2 ~ N^4 overflows int64), all-positive denominators so "
    "floor==trunc across engines — the oracle replays every "
    "contribution exactly (validated against the float formula to "
    "<= 1 micro per category). One counting groupBy + a broadcast "
    "1-row totals join; nothing else shuffles at any corpus size. "
    "Weekday split: Spark dayofweek is 1=Sun..7, DuckDB 0=Sun..6 — "
    "encoded per engine.",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_chisq_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import two_sample_chisq

    ev = _t(spark, sf_dir)["events"]
    return two_sample_chisq(ev, "event_type", F.dayofweek("ts").isin(1, 7))


def _kl_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    ln_chain = "SELECT * FROM c2"
    for x_sql, out in (
        ("n_a + 1", "_ln_a1"),
        ("n_b + 1", "_ln_b1"),
        ("_ta + _k", "_ln_aa"),
        ("_tb + _k", "_ln_bb"),
    ):
        ln_chain = duckdb_ln_select(ln_chain, x_sql, out)
    return f"""
    WITH counts AS (
        SELECT event_type AS category,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) NOT IN (0, 6)) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS BIGINT) AS n_b
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS _ta, CAST(SUM(n_b) AS BIGINT) AS _tb,
               CAST(COUNT(*) AS BIGINT) AS _k
        FROM counts
    ), c2 AS (
        SELECT category, n_a, n_b, _ta, _tb, _k FROM counts, tot
    ), c3 AS ({ln_chain})
    SELECT category, n_a, n_b,
           CAST((CAST(n_a + 1 AS HUGEINT) * (_ln_a1 - _ln_aa - _ln_b1 + _ln_bb))
                // (_ta + _k) AS BIGINT) AS kl_contrib_micros
    FROM c3 ORDER BY category
    """


@register(
    "drift_kl_event_types",
    oracle=_kl_oracle(),
    doc="Distribution-drift detection #3 (operators/drift.py:"
    "two_sample_kl, beside chi-square and KS): per-category "
    "KL(weekday || weekend) contributions of the event-type mix, "
    "exact in nat-micros — add-one-smoothed over the observed "
    "category union (the textbook guard that keeps MLE KL finite "
    "when a category is absent from one side), every ln the portable "
    "fixed-point ln applied at CATEGORY grain. KL is the expected "
    "log-likelihood ratio monitoring literature thresholds directly "
    "(chi-square approximates 2N*KL near equality but diverges under "
    "strong drift); contributions are signed (total is what's "
    ">= 0) and Spark DIV / DuckDB // both truncate toward zero, so "
    "the signed fold is still bit-replayed. Same 100 TB shape as the "
    "chisq: one counting groupBy + a broadcast 1-row totals join, "
    "nothing else shuffles.",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_kl_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import two_sample_kl

    ev = _t(spark, sf_dir)["events"]
    return two_sample_kl(ev, "event_type", F.dayofweek("ts").isin(1, 7))


def _mix_entropy_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    lc = duckdb_ln_select("SELECT * FROM pos", "_c", "_lnc")
    a1 = duckdb_ln_select(
        "SELECT * FROM agg0", "greatest(n_total, 1)", "_lnn"
    )
    a2 = duckdb_ln_select(
        "SELECT * FROM a1", "greatest(n_categories, 1)", "_lnk"
    )
    return f"""
    WITH counts AS (
        SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ), pos AS (
        SELECT n AS _c FROM counts WHERE n >= 1
    ), lc AS ({lc}
    ), agg0 AS (
        SELECT CAST(SUM(_c) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_categories,
               SUM(CAST(_c AS HUGEINT) * _lnc) AS _sum_cln
        FROM lc
    ), a1 AS ({a1}
    ), a2 AS ({a2})
    SELECT n_total, n_categories,
           CAST(_lnn - _sum_cln // greatest(n_total, 1) AS BIGINT)
               AS entropy_micros,
           CAST(CASE WHEN n_categories <= 1 THEN 0
                ELSE ((_lnn - _sum_cln // greatest(n_total, 1)) * 1000)
                     // _lnk END AS BIGINT) AS norm_entropy_permille
    FROM a2
    """


@register(
    "events_entropy_mix",
    oracle=_mix_entropy_oracle(),
    doc="Mix-entropy monitor (operators/drift.py:entropy_from_counts): "
    "Shannon entropy of the event-type composition, exact in "
    "nat-micros, with the UNIFORMITY INDEX norm = H/ln(K) in permille "
    "— the corpus-composition health number (a collapsing mix, one "
    "source flooding the corpus, drives norm toward 0 long before "
    "any single share alarms). Counts are the mergeable summary, so "
    "this is the same one-counting-groupBy shape as the chi-square/"
    "KL monitors; the entropy fold runs at category grain plus two "
    "1-row ln's. Completes the entropy family at MIX grain beside "
    "the per-document (token_entropy) and per-model "
    "(cross_entropy_lm) grains.",
    tags=("pipeline", "stats", "monitoring"),
)
def events_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import entropy_from_counts

    ev = _t(spark, sf_dir)["events"]
    counts = ev.groupBy(F.col("event_type").alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return entropy_from_counts(counts)


@register(
    "stream_entropy_mix",
    oracle=_mix_entropy_oracle(),
    doc="STREAMING mix-entropy monitor: drains the SAME mergeable "
    "(category, n_a, n_b) counts store the chi-square/KL streaming "
    "monitors append to (one store shape serves every count-based "
    "statistic — n here is n_a + n_b), folds through the shared "
    "entropy_from_counts => runs events_entropy_mix's oracle "
    "VERBATIM. Continuous composition-collapse detection over an "
    "unbounded ingest with O(categories) state per microbatch.",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import entropy_from_counts

    store = _ingest_drift_counts_stream(spark, sf_dir)
    counts = _merged_drift_counts(spark, store).select(
        "category", F.expr("n_a + n_b").cast("long").alias("n")
    )
    return entropy_from_counts(counts)


@register(
    "drift_emd_quantity",
    oracle="""
    WITH counts AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'R') AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_b
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS na, CAST(SUM(n_b) AS BIGINT) AS nb
        FROM counts
    ), cum AS (
        SELECT x,
               SUM(n_a) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ca,
               SUM(n_b) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cb,
               COALESCE(LEAD(x) OVER (ORDER BY x) - x, 0) AS gap
        FROM counts
    )
    SELECT na AS n_a, nb AS n_b, CAST(COUNT(*) AS BIGINT) AS support_size,
           CAST(CASE WHEN na = 0 OR nb = 0 THEN 0 ELSE
                (SUM(ABS(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)
                     * gap) * 1000000)
                // (CAST(na AS HUGEINT) * nb) END AS BIGINT) AS emd_micros
    FROM cum, tot GROUP BY na, nb
    """,
    doc="Two-sample EARTH-MOVER (Wasserstein-1) drift of the lineitem "
    "quantity distribution, returned vs kept "
    "(operators/drift.py:emd_from_counts) — the L1 companion to "
    "drift_ks_purchase_values' sup-norm: KS sees the single worst CDF "
    "gap, EMD integrates all of it, so a shift smeared across the "
    "whole range (every value one tick heavier) that barely moves KS "
    "accumulates here, and a narrow spike does the opposite — the "
    "pair brackets the drift geometry. Integer-exact via the "
    "cum-difference identity with ONE exact division "
    "(DECIMAL(38)/HUGEINT-widened numerator, quotient <= range*1e6). "
    "Plan at scale: value-grain counts are the mergeable summary; the "
    "cum window sorts the ORDINAL SUPPORT (quantity domain, ~50 rows "
    "post-aggregate — domain-bounded, never corpus-bounded; "
    "continuous columns bucket first, the standard EMD-monitor "
    "practice).",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_emd_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import emd_from_counts

    li = _t(spark, sf_dir)["lineitem"]
    counts = (
        li.select(
            F.col("l_quantity").cast("long").alias("_x"),
            (F.col("l_returnflag") == "R").alias("_b"),
        )
        .groupBy("_x")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    return emd_from_counts(counts)


_RBO_P_MICROS = [round(0.1 * 0.9 ** (d - 1) * 1_000_000) for d in range(1, 21)]


def _rbo_oracle() -> str:
    wvals = ", ".join(
        f"({d}, {w})" for d, w in enumerate(_RBO_P_MICROS, start=1)
    )
    return f"""
    WITH counts AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) NOT IN (0, 6)) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS BIGINT) AS n_b
        FROM events GROUP BY user_id
    ), ra AS (
        SELECT user_id, r FROM (
            SELECT user_id,
                   CAST(row_number() OVER (ORDER BY n_a DESC, user_id) AS BIGINT) AS r
            FROM counts WHERE n_a > 0
        ) WHERE r <= 20
    ), rb AS (
        SELECT user_id, r FROM (
            SELECT user_id,
                   CAST(row_number() OVER (ORDER BY n_b DESC, user_id) AS BIGINT) AS r
            FROM counts WHERE n_b > 0
        ) WHERE r <= 20
    ), joined AS (
        SELECT ra.r AS r_a, rb.r AS r_b
        FROM ra JOIN rb USING (user_id)
    ), weights(d, w) AS (VALUES {wvals}),
    inter AS (
        SELECT d, w,
               CAST(COUNT(*) FILTER (WHERE r_a <= d AND r_b <= d) AS BIGINT) AS i
        FROM weights, joined GROUP BY d, w
    )
    SELECT CAST(20 AS BIGINT) AS k_depth,
           CAST(COALESCE(SUM((w * i) // d), 0) AS BIGINT) AS rbo_micros,
           CAST(COALESCE(MAX(CASE WHEN d = 20 THEN i END), 0) AS BIGINT)
               AS n_common_topk
    FROM inter
    """


@register(
    "drift_topk_churn_rbo",
    oracle=_rbo_oracle(),
    doc="HEAD-churn monitor: truncated Rank-Biased Overlap (Webber et "
    "al. 2010, p=0.9, depth 20) between the weekday and weekend "
    "top-20 users by event count — the ranked-list companion to the "
    "mix monitors: Gini/entropy watch the SHAPE of the distribution, "
    "RBO watches WHO is on top (a stable shape can hide a complete "
    "head rotation — new dominant sources with the same concentration "
    "— and RBO alarms exactly then). Integer-exact: the geometric "
    "weights (1-p)p^(d-1) are pre-rounded micros LITERALS shared by "
    "both engines, each depth contributes (w_d * |A_d intersect B_d|) "
    "DIV d, and ties rank deterministically (count DESC, id ASC), so "
    "the oracle replays every term. Max value 1 - p^k ~ 0.878e6 "
    "(truncated RBO, documented). Plan at scale: per-side top-20 is "
    "TakeOrderedAndProject over the user-count aggregate (distributed "
    "top-k, never a global sort of all users); the rank windows and "
    "the 20x20 depth sweep run over <= 20-row tables.",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_topk_churn_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir)["events"]
    counts = ev.groupBy("user_id").agg(
        F.sum(F.when(~F.dayofweek("ts").isin(1, 7), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    ).localCheckpoint(eager=False)

    def topk(side: str) -> DataFrame:
        head = (
            counts.filter(F.col(side) > 0)
            .orderBy(F.col(side).desc(), "user_id")
            .limit(20)
        )
        w = Window.orderBy(F.col(side).desc(), "user_id")
        return head.select(
            "user_id",
            F.row_number().over(w).cast("long").alias(f"r_{side[-1]}"),
        )

    joined = topk("n_a").join(topk("n_b"), "user_id").select("r_a", "r_b")
    weights = spark.createDataFrame(
        [(d, w) for d, w in enumerate(_RBO_P_MICROS, start=1)],
        "d long, w long",
    )
    inter = (
        joined.crossJoin(F.broadcast(weights))
        .groupBy("d", "w")
        .agg(
            F.sum(
                F.when((F.col("r_a") <= F.col("d")) & (F.col("r_b") <= F.col("d")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("i")
        )
    )
    out = inter.agg(
        F.coalesce(F.expr("SUM((w * i) DIV d)"), F.lit(0))
        .cast("long")
        .alias("rbo_micros"),
        F.coalesce(F.max(F.expr("CASE WHEN d = 20 THEN i END")), F.lit(0))
        .cast("long")
        .alias("n_common_topk"),
    )
    return out.select(
        F.lit(20).cast("long").alias("k_depth"), "rbo_micros", "n_common_topk"
    )


_GINI_ORACLE = """
    WITH counts AS (
        SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    ), pos AS (
        SELECT n AS _c FROM counts WHERE n >= 1
    ), ranked AS (
        SELECT _c, CAST(row_number() OVER (ORDER BY _c) AS BIGINT) AS _i
        FROM pos
    ), agg AS (
        SELECT CAST(SUM(_c) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_categories,
               SUM(CAST(_i AS HUGEINT) * _c) AS _s1
        FROM ranked
    )
    SELECT COALESCE(n_total, 0) AS n_total, n_categories,
           CAST(CASE WHEN COALESCE(n_total, 0) = 0 THEN 0
                ELSE ((2 * _s1 - CAST(n_categories + 1 AS HUGEINT) * n_total)
                      * 1000000)
                     // (CAST(n_categories AS HUGEINT) * n_total) END
                AS BIGINT) AS gini_micros
    FROM agg
    """


_EMB_CENTROID_ORACLE = """
    WITH ecq AS MATERIALIZED (
        SELECT label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
        FROM embeddings
    ), ecs AS MATERIALIZED (
        SELECT label, d.d AS d, SUM(CAST(qv[d.d + 1] AS HUGEINT)) AS s
        FROM ecq CROSS JOIN (SELECT unnest(range(64)) AS d) d
        GROUP BY label, d.d
    ), ecn AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM ecq GROUP BY label
    ), ecg AS (
        SELECT d, SUM(s) AS g FROM ecs GROUP BY d
    ), ecgg AS (
        SELECT SUM(g * g) AS dot_gg FROM ecg
    ), ecd AS (
        SELECT label, SUM(s * g) AS dot_lg, SUM(s * s) AS dot_ll
        FROM ecs JOIN ecg USING (d) GROUP BY label
    )
    SELECT CAST(e.label AS BIGINT) AS label, n.n_vectors,
           CASE WHEN dot_ll = 0 OR dot_gg = 0 THEN NULL
                ELSE ROUND(CAST(dot_lg AS DOUBLE)
                           / (sqrt(CAST(dot_ll AS DOUBLE))
                              * sqrt(CAST(dot_gg AS DOUBLE))),
                           6) END AS cos_to_global
    FROM ecd e JOIN ecn n USING (label), ecgg
    """


@register(
    "drift_embedding_centroid",
    oracle=_EMB_CENTROID_ORACLE,
    doc="Embedding-SPACE drift monitor (operators/drift.py:"
    "embedding_centroid_drift): per-label centroid direction vs the "
    "global centroid as exact-integer cosine of DECIMAL(38)-widened "
    "quantized sum vectors — the blind spot of every count-based "
    "monitor in the family (chi-square/KL/EMD/Gini watch category "
    "MIX; a source whose mix is stable but whose embeddings rotated — "
    "re-trained encoder, topical shift — only moves THIS one). Sum "
    "bounds documented at the operator: int64 would wrap at the "
    "global self-dot of ~60k vectors, DECIMAL(38) holds to ~1e15 "
    "per group; the oracle replays in HUGEINT. One map-side-combined "
    "groupBy; the global row is an aggregate OF the group rows "
    "broadcast back — never a second corpus pass.",
    tags=("pipeline", "similarity", "monitor"),
)
def drift_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import embedding_centroid_drift

    t = _t(spark, sf_dir)
    out = embedding_centroid_drift(t["embeddings"], "label", dims=64)
    return out.select(
        F.col("label").cast("long").alias("label"), "n_vectors", "cos_to_global"
    )


@register(
    "stream_drift_embedding_centroid",
    oracle=_EMB_CENTROID_ORACLE,
    doc="STREAMING embedding-space drift: each microbatch appends its "
    "per-label mergeable summary (operators/drift.py:"
    "embedding_group_sums — DECIMAL(38) component sums + count; "
    "partial sums from any corpus split merge by summing columns) to "
    "a store; serving column-sums the store and folds through the "
    "SAME centroid_cosines_from_sums as the batch monitor => replays "
    "drift_embedding_centroid's oracle VERBATIM, batching-independent."
    " State is labels x (dims+1) numbers — O(groups), never vectors.",
    tags=("pipeline", "streaming", "similarity", "monitor"),
)
def stream_drift_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators.drift import (
        centroid_cosines_from_sums,
        embedding_group_sums,
    )

    emb_schema = _t(spark, sf_dir)["embeddings"].schema
    root = tempfile.mkdtemp(prefix="bosql_embdrift_stream_")
    store = os.path.join(root, "sums")

    stream = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        embedding_group_sums(batch_df, "label", dims=64).write.mode(
            "append"
        ).parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dec = "decimal(38,0)"
    merged = (
        spark.read.parquet(store)
        .groupBy("grp")
        .agg(
            F.sum("n_vectors").cast("long").alias("n_vectors"),
            *[F.sum(F.col(f"s{d}")).cast(dec).alias(f"s{d}") for d in range(64)],
        )
    )
    return centroid_cosines_from_sums(merged, dims=64).select(
        F.col("grp").cast("long").alias("label"), "n_vectors", "cos_to_global"
    )


@register(
    "events_gini_mix",
    oracle=_GINI_ORACLE,
    doc="Gini concentration of the event-type mix, exact in micros "
    "(operators/drift.py:gini_from_counts): the Lorenz-curve "
    "companion to events_entropy_mix's uniformity index — a long "
    "tail of starved sources barely moves normalized entropy (each "
    "contributes ~zero mass) but stretches the Lorenz curve, so the "
    "monitor pair separates 'one source flooding' (both alarm) from "
    "'tail starving' (Gini alarms first). Sorted-rank identity keeps "
    "it window-light and integer-exact: S1 is invariant under "
    "permuting tied counts, so no tie-break is needed for "
    "value-determinism. Plan at scale: one counting aggregate; the "
    "rank window sorts K post-aggregate category rows, never events "
    "(documented bounded global window).",
    tags=("pipeline", "stats", "monitoring"),
)
def events_gini_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import gini_from_counts

    ev = _t(spark, sf_dir)["events"]
    counts = ev.groupBy(F.col("event_type").alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return gini_from_counts(counts)


@register(
    "stream_gini_mix",
    oracle=_GINI_ORACLE,
    doc="STREAMING Gini concentration monitor: drains the SAME "
    "mergeable (category, n_a, n_b) counts store the chi-square/KL/"
    "entropy streaming monitors append to (one store shape serves "
    "every count-based statistic) and folds through the shared "
    "gini_from_counts => replays events_gini_mix's oracle VERBATIM. "
    "With entropy and Gini over one drained store, the composition "
    "dashboard gets both uniformity numbers from a single O(categories)"
    " state, no rescans.",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_gini_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import gini_from_counts

    store = _ingest_drift_counts_stream(spark, sf_dir)
    counts = _merged_drift_counts(spark, store).select(
        "category", F.expr("n_a + n_b").cast("long").alias("n")
    )
    return gini_from_counts(counts)


@register(
    "graph_ppr_seeded",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN vecs ve USING (vec_id)
    ), prs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ), edges AS (
        SELECT vec_id AS src, neighbor_id AS dst
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
              FROM prs)
        WHERE rnk <= 5
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), seeds AS (SELECT DISTINCT node FROM nodes WHERE node < 8),
    ns AS (SELECT COUNT(*) AS k FROM seeds),
    deg AS (SELECT src, COUNT(*) AS dg FROM edges GROUP BY src),
    s0 AS (
        SELECT n.node,
               CAST(CASE WHEN sd.node IS NOT NULL THEN 1000000 // ns.k
                         ELSE 0 END AS BIGINT) AS score
        FROM nodes n CROSS JOIN ns LEFT JOIN seeds sd ON n.node = sd.node
    ),
    s1 AS (
        SELECT n.node,
               CAST(CASE WHEN sd.node IS NOT NULL
                         THEN 150 * 1000000 // (1000 * ns.k) ELSE 0 END
                    + 850 * COALESCE(i0.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes n CROSS JOIN ns
        LEFT JOIN seeds sd ON n.node = sd.node
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s0 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i0 ON n.node = i0.node
    ),
    s2 AS (
        SELECT n.node,
               CAST(CASE WHEN sd.node IS NOT NULL
                         THEN 150 * 1000000 // (1000 * ns.k) ELSE 0 END
                    + 850 * COALESCE(i1.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes n CROSS JOIN ns
        LEFT JOIN seeds sd ON n.node = sd.node
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s1 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i1 ON n.node = i1.node
    ),
    s3 AS (
        SELECT n.node,
               CAST(CASE WHEN sd.node IS NOT NULL
                         THEN 150 * 1000000 // (1000 * ns.k) ELSE 0 END
                    + 850 * COALESCE(i2.s, 0) // 1000 AS BIGINT) AS score
        FROM nodes n CROSS JOIN ns
        LEFT JOIN seeds sd ON n.node = sd.node
        LEFT JOIN (
            SELECT e.dst AS node, SUM(p.score // deg.dg) AS s
            FROM edges e JOIN s2 p ON e.src = p.node
                 JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) i2 ON n.node = i2.node
    )
    SELECT node AS vec_id, score FROM s3 ORDER BY vec_id
    """,
    doc="PERSONALIZED PageRank over the corpus k-NN graph: teleport "
    "mass restricted to a trusted 8-vector seed set, so scores rank "
    "the corpus by proximity to the seeds — find-more-like-this over "
    "a curated sub-corpus (seed-anchored importance sampling). Same "
    "integer fixed-point recurrence as graph_pagerank_knn with the "
    "teleport/init terms masked to the (broadcast) seed set; the "
    "oracle replays 3 unrolled iterations bit-for-bit.",
    tags=("pipeline", "graph", "similarity"),
)
def graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import pagerank

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("node")
    )
    return (
        pagerank(edges, n_iter=3, seeds=seeds)
        .select(F.col("node").alias("vec_id"), "score")
        .orderBy("vec_id")
    )


@register(
    "drift_ks_purchase_values",
    oracle="""
    WITH src AS (
        SELECT value AS x, dayofweek(ts) IN (0, 6) AS b
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT x,
               COUNT(*) FILTER (WHERE NOT b) AS a,
               COUNT(*) FILTER (WHERE b) AS bc
        FROM src GROUP BY x
    ), tot AS (SELECT SUM(a) AS na, SUM(bc) AS nb FROM counts),
    cum AS (
        SELECT x,
               SUM(a) OVER (ORDER BY x) AS ca,
               SUM(bc) OVER (ORDER BY x) AS cb
        FROM counts
    ), dev AS (
        SELECT x, ABS(ca * tot.nb - cb * tot.na) AS d FROM cum, tot
    )
    SELECT CAST(tot.na AS BIGINT) AS n_a,
           CAST(tot.nb AS BIGINT) AS n_b,
           CAST((SELECT MAX(d) FROM dev) AS BIGINT) AS d_num,
           (SELECT MIN(x) FROM dev WHERE d = (SELECT MAX(d) FROM dev))
               AS x_at_max
    FROM tot
    """,
    doc="Kolmogorov-Smirnov NUMERIC drift (operators/drift.py:"
    "two_sample_ks): the event-value distribution, weekday vs "
    "weekend — the continuous sibling of drift_chisq_event_types "
    "(doc-length / quality-score / value distribution shift). "
    "Integer-exact: the KS deviation |cum_a/N_a - cum_b/N_b| is "
    "compared via the int64 numerator |cum_a*N_b - cum_b*N_a|, so "
    "the max and its location (min-x tie-break) replay exactly; the "
    "oracle runs the textbook global cumulative window, the engine "
    "runs the value-range-shard + broadcast-offsets decomposition "
    "(no global window over corpus-sized distinct values).",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_ks_purchase_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import two_sample_ks

    ev = _t(spark, sf_dir)["events"].filter(F.col("value").isNotNull())
    return two_sample_ks(ev, "value", F.dayofweek("ts").isin(1, 7))


def _ingest_drift_counts_stream(spark: SparkSession, sf_dir: str) -> str:
    """Shared ingest leg of stream_drift_chisq / stream_drift_kl:
    events as a file stream, each microbatch appending its
    (category, n_a, n_b) counts — the mergeable summary — to a fresh
    store. Returns the store path."""
    import os
    import tempfile

    ev_schema = _t(spark, sf_dir)["events"].schema
    root = tempfile.mkdtemp(prefix="bosql_drift_stream_")
    store = os.path.join(root, "counts")

    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        (
            batch_df.select(
                F.col("event_type").alias("category"),
                F.dayofweek("ts").isin(1, 7).alias("_b"),
            )
            .groupBy("category")
            .agg(
                F.sum(F.when(~F.col("_b"), 1).otherwise(0))
                .cast("long")
                .alias("n_a"),
                F.sum(F.when(F.col("_b"), 1).otherwise(0))
                .cast("long")
                .alias("n_b"),
            )
            .write.mode("append")
            .parquet(store)
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store


def _merged_drift_counts(spark: SparkSession, store: str) -> DataFrame:
    return (
        spark.read.parquet(store)
        .groupBy("category")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
        )
    )


@register(
    "stream_drift_chisq",
    oracle="""
    WITH counts AS (
        SELECT event_type AS category,
               COUNT(*) FILTER (WHERE dayofweek(ts) NOT IN (0, 6)) AS n_a,
               COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS n_b
        FROM events GROUP BY event_type
    ), tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts)
    SELECT category,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN (n_a + n_b) = 0 OR ta = 0 THEN 0 ELSE CAST((n_a * (ta + tb) - (n_a + n_b) * ta) AS HUGEINT) * (n_a * (ta + tb) - (n_a + n_b) * ta) * 1000000 // (CAST((ta + tb) AS HUGEINT) * (n_a + n_b) * ta) END
                + CASE WHEN (n_a + n_b) = 0 OR tb = 0 THEN 0 ELSE CAST((n_b * (ta + tb) - (n_a + n_b) * tb) AS HUGEINT) * (n_b * (ta + tb) - (n_a + n_b) * tb) * 1000000 // (CAST((ta + tb) AS HUGEINT) * (n_a + n_b) * tb) END AS BIGINT) AS chisq_micros
    FROM counts, tot ORDER BY category
    """,
    doc="STREAMING drift monitor (foreachBatch): each microbatch "
    "appends its per-(category, sample) COUNTS to a store — counts "
    "are the mergeable summary (sum-merge, like the CM grid) — and "
    "the drained store folds into the same integer-exact chi-square "
    "as the batch twin (drift_chisq_event_types' oracle verbatim): "
    "continuous composition monitoring over an unbounded ingest with "
    "O(categories) state per batch and no rescans. At 100 TB the "
    "reference mix would be a pinned snapshot's counts; here both "
    "samples stream in (weekday vs weekend split).",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import chisq_from_counts

    store = _ingest_drift_counts_stream(spark, sf_dir)
    return chisq_from_counts(_merged_drift_counts(spark, store))


@register(
    "stream_drift_kl",
    oracle=_kl_oracle(),
    doc="STREAMING KL drift monitor: the same mergeable per-"
    "(category, sample) counts ingest as stream_drift_chisq (one "
    "store shape serves every count-based drift statistic), drained "
    "through the shared kl_from_counts fold — so this entry runs "
    "drift_kl_event_types' oracle VERBATIM, the served-equals-batch "
    "statement for the information-theoretic monitor. O(categories) "
    "state per microbatch, no rescans; at 100 TB the A side would be "
    "a pinned reference snapshot's counts, sum-merged identically.",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import kl_from_counts

    store = _ingest_drift_counts_stream(spark, sf_dir)
    return kl_from_counts(_merged_drift_counts(spark, store))


def _psi_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    ln_chain = "SELECT * FROM c2"
    for x_sql, out in (
        ("n_a + 1", "_ln_a1"),
        ("n_b + 1", "_ln_b1"),
        ("_ta + _k", "_ln_aa"),
        ("_tb + _k", "_ln_bb"),
    ):
        ln_chain = duckdb_ln_select(ln_chain, x_sql, out)
    return f"""
    WITH counts AS (
        SELECT event_type AS category,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) NOT IN (0, 6)) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS BIGINT) AS n_b
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS _ta, CAST(SUM(n_b) AS BIGINT) AS _tb,
               CAST(COUNT(*) AS BIGINT) AS _k
        FROM counts
    ), c2 AS (
        SELECT category, n_a, n_b, _ta, _tb, _k FROM counts, tot
    ), c3 AS ({ln_chain})
    SELECT category, n_a, n_b,
           CAST(((CAST(n_a + 1 AS HUGEINT) * (_tb + _k)
                  - CAST(n_b + 1 AS HUGEINT) * (_ta + _k))
                 * (_ln_a1 - _ln_aa - _ln_b1 + _ln_bb))
                // (CAST(_ta + _k AS HUGEINT) * (_tb + _k)) AS BIGINT)
               AS psi_contrib_micros
    FROM c3 ORDER BY category
    """


@register(
    "drift_psi_event_types",
    oracle=_psi_oracle(),
    doc="Population Stability Index of the event-type mix, weekday vs "
    "weekend (operators/drift.py:psi_from_counts) — THE drift number "
    "model-risk teams threshold (< 0.1 stable / 0.1-0.25 watch / "
    "> 0.25 act). PSI is the symmetrized KL, so it reuses the KL "
    "fold's add-one smoothing and fixed-point ln chain verbatim and "
    "computes each contribution as ONE truncated DIV of "
    "((a'B' - b'A') * ln-diff) over A'B' — DECIMAL(38)-widened "
    "(numerator reaches N^2 * 176e6; safe to ~1e14 rows per side), "
    "HUGEINT oracle, toward-zero truncation on both engines. "
    "Contributions are >= 0 up to ln rounding near p_a == p_b; total "
    "PSI is the sum. Same 100 TB shape as chi-square/KL: one counting "
    "groupBy + a broadcast 1-row totals join.",
    tags=("pipeline", "stats", "monitoring"),
)
def drift_psi_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import psi_from_counts

    ev = _t(spark, sf_dir)["events"]
    counts = (
        ev.select(
            F.col("event_type").alias("category"),
            F.dayofweek("ts").isin(1, 7).alias("_b"),
        )
        .groupBy("category")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).cast("long").alias("n_b"),
        )
    )
    return psi_from_counts(counts).orderBy("category")


@register(
    "stream_drift_psi",
    oracle=_psi_oracle(),
    doc="STREAMING PSI monitor: drains the SAME mergeable (category, "
    "n_a, n_b) counts store every count-based monitor ingests (one "
    "store shape serves chi-square/KL/entropy/Gini/PSI) through the "
    "shared psi_from_counts fold => replays drift_psi_event_types' "
    "oracle VERBATIM. At 100 TB the A side is a pinned reference "
    "snapshot's counts, sum-merged identically — the scorecard-"
    "monitoring deployment shape.",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import psi_from_counts

    store = _ingest_drift_counts_stream(spark, sf_dir)
    return psi_from_counts(_merged_drift_counts(spark, store)).orderBy("category")


@register(
    "events_anomaly_mad",
    oracle="""
    WITH counts AS (
        SELECT event_type AS grp, value AS x, CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), totals AS (
        SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY grp
    ), cum AS (
        SELECT counts.grp, x, SUM(c) OVER (PARTITION BY counts.grp ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc, n
        FROM counts JOIN totals USING (grp)
    ), med AS (
        SELECT grp, MIN(x) AS med FROM cum WHERE cumc >= (n + 1) // 2 GROUP BY grp
    ), devs AS (
        SELECT counts.grp, ABS(x - med) AS d, CAST(SUM(c) AS BIGINT) AS c
        FROM counts JOIN med USING (grp) GROUP BY 1, 2
    ), dcum AS (
        SELECT devs.grp, d, SUM(c) OVER (PARTITION BY devs.grp ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc, n
        FROM devs JOIN totals USING (grp)
    ), mad AS (
        SELECT grp, MIN(d) AS mad FROM dcum WHERE cumc >= (n + 1) // 2 GROUP BY grp
    ), flagged AS (
        SELECT devs.grp,
               CAST(SUM(CASE WHEN d > 3 * mad THEN c ELSE 0 END) AS BIGINT) AS n_outliers,
               MAX(d) AS max_dev
        FROM devs JOIN mad USING (grp) GROUP BY 1
    )
    SELECT grp, n, med, mad, n_outliers, max_dev
    FROM totals JOIN med USING (grp) JOIN mad USING (grp) JOIN flagged USING (grp)
    ORDER BY grp
    """,
    doc="Robust per-group anomaly profile (operators/drift.py:"
    "robust_group_outliers): per event type, the lower MEDIAN and MAD "
    "of event values plus the Hampel |x - med| > 3*MAD outlier count — "
    "the within-sample sibling of the two-sample drift queries. Exact "
    "across engines WITHOUT fixed-point because the statistic never "
    "sums floats: medians are order-statistic picks of actual data "
    "values (rank ceil(n/2), the percentile doctrine), |x - med| and "
    "3*mad are single correctly-rounded IEEE ops. Plan at scale: all "
    "cumulative windows run at VALUE grain — groupBy(type, value) "
    "counts first — so the per-type window sorts |distinct values| "
    "rows, never |rows|; group-grain medians broadcast back.",
    tags=("pipeline", "stats", "monitoring"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.drift import robust_group_outliers

    ev = _t(spark, sf_dir)["events"]
    return robust_group_outliers(ev, "value", "event_type")


@register(
    "stream_anomaly_mad",
    oracle="""
    WITH counts AS (
        SELECT event_type AS grp, value AS x, CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), totals AS (
        SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY grp
    ), cum AS (
        SELECT counts.grp, x, SUM(c) OVER (PARTITION BY counts.grp ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc, n
        FROM counts JOIN totals USING (grp)
    ), med AS (
        SELECT grp, MIN(x) AS med FROM cum WHERE cumc >= (n + 1) // 2 GROUP BY grp
    ), devs AS (
        SELECT counts.grp, ABS(x - med) AS d, CAST(SUM(c) AS BIGINT) AS c
        FROM counts JOIN med USING (grp) GROUP BY 1, 2
    ), dcum AS (
        SELECT devs.grp, d, SUM(c) OVER (PARTITION BY devs.grp ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc, n
        FROM devs JOIN totals USING (grp)
    ), mad AS (
        SELECT grp, MIN(d) AS mad FROM dcum WHERE cumc >= (n + 1) // 2 GROUP BY grp
    ), flagged AS (
        SELECT devs.grp,
               CAST(SUM(CASE WHEN d > 3 * mad THEN c ELSE 0 END) AS BIGINT) AS n_outliers,
               MAX(d) AS max_dev
        FROM devs JOIN mad USING (grp) GROUP BY 1
    )
    SELECT grp, n, med, mad, n_outliers, max_dev
    FROM totals JOIN med USING (grp) JOIN mad USING (grp) JOIN flagged USING (grp)
    ORDER BY grp
    """,
    doc="STREAMING anomaly monitor (foreachBatch): each microbatch "
    "appends its per-(group, value) COUNTS to a store — value-grain "
    "counts are a mergeable summary (sum-merge on (grp, x); order "
    "statistics of the union are exactly recoverable from merged "
    "counts) — and the drained store folds through the shared "
    "robust_outliers_from_counts into the SAME median/MAD/Hampel "
    "profile as the batch twin (events_anomaly_mad's oracle "
    "verbatim). Distribution-shaped streaming state: O(distinct "
    "values) per group, zero rescans — where the mergeable-median "
    "state would grow unboundedly on a true continuum, the quantile "
    "sketch family (stream_sketch_quantiles) is the bounded-state "
    "fallback; this exact form is right for discretized values "
    "(prices, scores, bucketed latencies).",
    tags=("pipeline", "streaming", "stats", "monitoring"),
)
def stream_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    ev_schema = _t(spark, sf_dir)["events"].schema
    root = tempfile.mkdtemp(prefix="bosql_mad_stream_")
    store = os.path.join(root, "counts")

    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        (
            batch_df.filter(F.col("value").isNotNull())
            .select(
                F.col("event_type").alias("grp"),
                F.col("value").cast("double").alias("_x"),
            )
            .groupBy("grp", "_x")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
            .write.mode("append")
            .parquet(store)
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from bo_sql_spark.operators.drift import robust_outliers_from_counts

    merged = (
        spark.read.parquet(store)
        .groupBy("grp", "_x")
        .agg(F.sum("_c").cast("long").alias("_c"))
    )
    return robust_outliers_from_counts(merged)


@register(
    "quality_percentile_by_lang",
    oracle="""
    WITH counts AS (
        SELECT lang, n_chars AS x, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2
    ), totals AS (
        SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY lang
    ), cum AS (
        SELECT counts.lang, x, cnt,
               SUM(cnt) OVER (PARTITION BY counts.lang ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c, n
        FROM counts JOIN totals USING (lang)
    )
    SELECT lang, CAST(x AS BIGINT) AS n_chars, cnt,
           CAST(CASE WHEN n <= 1 THEN 0
                ELSE ((c - cnt) * 1000000) // (n - 1) END AS BIGINT) AS pct_micros
    FROM cum ORDER BY lang, n_chars
    """,
    doc="Per-group percentile normalization (curriculum primitive): "
    "percent_rank of document length within each language, in integer "
    "micros — pct = ((min_rank - 1) * 1e6) DIV (n - 1), exactly the "
    "SQL percent_rank() definition with the float division replaced "
    "by a floor DIV so both engines agree bit-for-bit (min_rank for "
    "a value = preceding cumulative count + 1, ties share it). The "
    "normalization step curriculum ordering / quality-threshold "
    "selection needs: thresholds in percentile space transfer across "
    "languages with different length distributions. Emits at VALUE "
    "grain — the window sorts |distinct (lang, length)| rows, never "
    "|docs| (the MAD/KS machinery); single-member groups pin pct 0.",
    tags=("pipeline", "text", "stats"),
)
def quality_percentile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang", F.col("n_chars").alias("x")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.groupBy("lang").agg(F.sum("cnt").cast("long").alias("n"))
    w = (
        Window.partitionBy("lang")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counts.withColumn("c", F.sum("cnt").over(w).cast("long"))
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            F.col("x").cast("long").alias("n_chars"),
            "cnt",
            F.expr(
                "CAST(CASE WHEN n <= 1 THEN 0"
                " ELSE ((c - cnt) * 1000000L) DIV (n - 1) END AS BIGINT)"
            ).alias("pct_micros"),
        )
        .orderBy("lang", "n_chars")
    )


def _collocations_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    ucnt_ln = duckdb_ln_select(
        "SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM uni"
        " WHERE term <> '' GROUP BY term",
        "c",
        "ln_c",
    )
    nu_ln = duckdb_ln_select(
        "SELECT CAST(greatest(coalesce(SUM(c), 1), 1) AS BIGINT) AS nu FROM ucnt",
        "nu",
        "ln_nu",
    )
    bcnt_ln = duckdb_ln_select(
        "SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab FROM big"
        " GROUP BY bigram HAVING COUNT(*) >= 5",
        "c_ab",
        "ln_ab",
    )
    nb_ln = duckdb_ln_select(
        "SELECT CAST(greatest(COUNT(*), 1) AS BIGINT) AS nb FROM big",
        "nb",
        "ln_nb",
    )
    return f"""
    WITH toksarr AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), uni AS (
        SELECT unnest(tok) AS term FROM toksarr
    ), ucnt AS ({ucnt_ln}
    ), nu AS ({nu_ln}
    ), big AS (
        SELECT unnest(list_transform(range(1, len(tok)),
                                     i -> tok[i] || ' ' || tok[i+1])) AS bigram
        FROM toksarr
    ), bcnt AS ({bcnt_ln}
    ), nb AS ({nb_ln})
    SELECT bigram, c_ab,
           ln_ab + 2 * ln_nu - ln_nb - a.ln_c - b.ln_c AS pmi_micros
    FROM bcnt, nu, nb
    JOIN ucnt a ON a.term = string_split(bigram, ' ')[1]
    JOIN ucnt b ON b.term = string_split(bigram, ' ')[2]
    ORDER BY pmi_micros DESC, bigram LIMIT 20
    """


@register(
    "text_collocations_topk",
    oracle=_collocations_oracle(),
    doc="Collocation extraction: top-20 bigrams by TEXTBOOK log-PMI "
    "in integer micros — pmi = ln(P(ab) / (P(a)P(b))) decomposed as "
    "ln(c_ab) + 2 ln(Nu) - ln(Nb) - ln(c_a) - ln(c_b), each term via "
    "the portable fixed-point ln (functions/fixedpoint.py), so the "
    "score is the real PMI (within ~1 micro per ln term) and still "
    "bit-identical across engines with zero libm — upgraded from the "
    "r9 linear-lift surrogate (ordering-identical per pair, but its "
    "magnitude wasn't PMI; the sum form also dodges the HUGEINT "
    "c_ab*Nu^2 ceiling at ~1e13-token corpora). Min-count floor of 5 "
    "(PMI's classic rare-pair instability). The corpus-analysis "
    "primitive behind tokenizer merge candidates and stopword/"
    "boilerplate detection. Plan at scale: bigrams come from the "
    "zip_with shingle chain (array-level, zero shuffle until the "
    "count), ln runs at VOCABULARY grain (unigram/bigram count "
    "tables) never per token, the final top-20 is a "
    "TakeOrderedAndProject; the two unigram joins broadcast the "
    "vocabulary-grain count table.",
    tags=("pipeline", "text"),
)
def text_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions.fixedpoint import with_ln_micros
    from bo_sql_spark.functions.textfn import tokens

    docs = _t(spark, sf_dir)["documents"]
    toks = docs.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term")
    ).filter(F.col("term") != "")
    ucnt = with_ln_micros(
        toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c")),
        "c",
        "ln_c",
    )
    nu = with_ln_micros(
        ucnt.agg(
            F.expr("CAST(greatest(coalesce(SUM(c), 1), 1) AS BIGINT)").alias("nu")
        ),
        "nu",
        "ln_nu",
    )
    # RAW adjacent bigrams (word_shingles is per-doc DISTINCT — set
    # semantics for Jaccard; collocation counts need every occurrence):
    # one zip_with of the token array against its own 1-shifted slice,
    # zero shuffle until the count.
    tk = tokens(F.col("text"))
    n = F.size(tk)
    raw = F.slice(
        F.zip_with(
            tk,
            F.slice(tk, 2, F.greatest(n - 1, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        1,
        F.greatest(n - 1, F.lit(0)),
    )
    big = (
        docs.select(F.explode(raw).alias("bigram"))
        # a 1-token doc's slice is empty; guard empty-text "" tokens
        .filter(F.instr("bigram", " ") >= 1)
        .filter(~F.col("bigram").startswith(" ") & ~F.col("bigram").endswith(" "))
    )
    nb = with_ln_micros(
        big.agg(
            F.expr("CAST(greatest(COUNT(*), 1) AS BIGINT)").alias("nb")
        ),
        "nb",
        "ln_nb",
    )
    bcnt = with_ln_micros(
        big.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 5),
        "c_ab",
        "ln_ab",
    )
    parts = F.split("bigram", " ")
    scored = (
        bcnt.withColumn("_w1", parts.getItem(0))
        .withColumn("_w2", parts.getItem(1))
        .join(
            F.broadcast(
                ucnt.select(F.col("term").alias("_w1"), F.col("ln_c").alias("_lnca"))
            ),
            "_w1",
        )
        .join(
            F.broadcast(
                ucnt.select(F.col("term").alias("_w2"), F.col("ln_c").alias("_lncb"))
            ),
            "_w2",
        )
        .crossJoin(F.broadcast(nu.select("ln_nu")))
        .crossJoin(F.broadcast(nb.select("ln_nb")))
        .withColumn(
            "pmi_micros",
            F.expr("ln_ab + 2 * ln_nu - ln_nb - _lnca - _lncb"),
        )
    )
    return (
        scored.select("bigram", "c_ab", "pmi_micros")
        .orderBy(F.col("pmi_micros").desc(), "bigram")
        .limit(20)
    )


def _token_entropy_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    tf_ln = duckdb_ln_select("SELECT * FROM tf0", "c", "_lnc")
    pd_ln = duckdb_ln_select("SELECT * FROM pd0", "n_tokens", "_lnn")
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tf0 AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ), tf AS ({tf_ln}
    ), pd0 AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_unique_terms,
               SUM(CAST(c AS HUGEINT) * _lnc) AS _sum_cln
        FROM tf GROUP BY doc_id
    ), pd AS ({pd_ln})
    SELECT doc_id, n_tokens, n_unique_terms,
           CAST(_lnn - _sum_cln // n_tokens AS BIGINT) AS entropy_micros,
           CAST(CASE WHEN n_tokens <= 1 THEN 0
                ELSE ((_lnn - _sum_cln // n_tokens) * 1000) // _lnn END
                AS BIGINT) AS norm_entropy_permille
    FROM pd ORDER BY doc_id
    """


@register(
    "text_token_entropy",
    oracle=_token_entropy_oracle(),
    doc="Per-document unigram Shannon ENTROPY, exact in nat-micros "
    "(operators/text.py:token_entropy): H = ln(dl) - (sum c ln c) "
    "DIV dl via the portable fixed-point ln — the information-"
    "theoretic repetition signal beside the Gopher duplicate-n-gram "
    "rules (low entropy = boilerplate/keyword-stuffing), with a "
    "length-independent norm_entropy_permille = H/ln(dl) for "
    "thresholds that transfer across document lengths. The surface "
    "the r9 ROADMAP said the fixed-point ln would unlock, delivered: "
    "both engines replay every per-doc value bit-for-bit. Plan at "
    "scale: one (doc, term) counting aggregate, ln as a codegen'd "
    "integer map over the tf table (no added shuffle, no Python), "
    "one per-doc fold.",
    tags=("pipeline", "text", "stats"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.text import token_entropy

    return token_entropy(_t(spark, sf_dir)["documents"])


def _cross_entropy_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    gf_ln = duckdb_ln_select("SELECT * FROM gf0", "gf", "_lngf")
    tot_ln = duckdb_ln_select(
        "SELECT CAST(SUM(gf) AS BIGINT) AS _n_corpus FROM gf", "_n_corpus", "_lnN"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tf0 AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ), gf0 AS (
        SELECT term, CAST(SUM(c) AS BIGINT) AS gf FROM tf0 GROUP BY term
    ), gf AS ({gf_ln}
    ), tot AS ({tot_ln}
    ), pd AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               SUM(CAST(c AS HUGEINT) * _lngf) AS _s
        FROM tf0 JOIN gf USING (term) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(_lnN - _s // n_tokens AS BIGINT) AS cross_entropy_micros
    FROM pd, tot ORDER BY doc_id
    """


@register(
    "text_cross_entropy_lm",
    oracle=_cross_entropy_oracle(),
    doc="Per-document unigram-LM CROSS-ENTROPY vs the corpus MLE "
    "model, exact in nat-micros (operators/text.py:cross_entropy_lm): "
    "CE = ln(N) - (sum c_t ln gf_t) DIV dl — the perplexity-exact "
    "upgrade of text_unigram_doc_score's log-free skeleton "
    "(perplexity = e^CE; thresholds live in log space). The "
    "CCNet/Gopher-style LM quality filter: docs whose token "
    "distribution is unusual for the corpus score high. Plan at "
    "scale: ln applied at VOCABULARY grain (the global term-count "
    "table, broadcast back), so per-posting work is one multiply; "
    "corpus text never shuffles; the corpus-total ln is a 1-row "
    "aggregate consumed once.",
    tags=("pipeline", "text", "stats"),
)
def text_cross_entropy_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.text import cross_entropy_lm

    return cross_entropy_lm(_t(spark, sf_dir)["documents"])


_ENTROPY_REASONS_SQL = (
    "CASE WHEN norm_entropy_permille < 600"
    " AND cross_entropy_micros * 100 > mean_ce * 115"
    " THEN 'low_entropy,high_perplexity'"
    " WHEN norm_entropy_permille < 600 THEN 'low_entropy'"
    " WHEN cross_entropy_micros * 100 > mean_ce * 115"
    " THEN 'high_perplexity'"
    " ELSE '' END"
)


def _entropy_filter_oracle() -> str:
    return f"""
    WITH ent AS ({_token_entropy_oracle()}),
    ce AS ({_cross_entropy_oracle()}),
    m AS (
        SELECT CAST(SUM(cross_entropy_micros) // COUNT(*) AS BIGINT) AS mean_ce
        FROM ce
    )
    SELECT ent.doc_id, ent.n_tokens, ent.norm_entropy_permille,
           ce.cross_entropy_micros,
           ({_ENTROPY_REASONS_SQL}) = '' AS keep,
           {_ENTROPY_REASONS_SQL} AS drop_reasons
    FROM ent JOIN ce USING (doc_id), m
    ORDER BY ent.doc_id
    """


@register(
    "corpus_filter_entropy",
    oracle=_entropy_filter_oracle(),
    doc="Information-theoretic corpus filter (the entropy family wired "
    "into the gopher_keep keep/drop-with-reasons shape): drop "
    "'low_entropy' when the normalized per-doc entropy falls below "
    "600 permille (repetitive/boilerplate — the Shannon counterpart "
    "of the dup-n-gram rules) and 'high_perplexity' when the doc's "
    "LM cross-entropy exceeds the corpus mean by >15% (unusual token "
    "distribution, the CCNet-style LM cut) — the mean is a RELATIVE "
    "threshold, so the rule transfers across corpora without "
    "retuning. Both signals and the mean are integer-exact (shared "
    "fixed-point-ln folds), so keep decisions and reason strings "
    "replay bit-for-bit. Plan at scale: ONE corpus tokenization "
    "(doc_term_freq, checkpointed) feeds both per-doc folds — the "
    "one-consumer rule at doc grain: the pre-r11 composition "
    "re-derived the (doc,term,tf) table inside each operator, i.e. "
    "two full corpus scans for one keep/drop decision; the ce table "
    "is likewise checkpointed because the mean and the join both "
    "consume it. The broadcast 1-row mean keeps the threshold "
    "relative without a second pass over anything doc-sized.",
    tags=("pipeline", "text", "filter", "stats"),
)
def corpus_filter_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.text import doc_term_freq

    docs = _t(spark, sf_dir)["documents"]
    return _entropy_filter_from_tf(doc_term_freq(docs))


def _entropy_filter_from_tf(tf: DataFrame) -> DataFrame:
    """The keep/drop-with-reasons fold over a (doc_id, term, c) table —
    the shared tail of the batch filter (in-query tokenization) and
    the streaming twin (drained postings-count store). tf and the
    per-doc ce table are checkpointed here because each is consumed
    twice (tf by both folds; ce by the mean and the join) — the
    one-consumer rule at doc grain."""
    from bo_sql_spark.operators.text import (
        cross_entropy_from_tf,
        token_entropy_from_tf,
    )

    tf = tf.localCheckpoint(eager=False)
    ent = token_entropy_from_tf(tf).select(
        "doc_id", "n_tokens", "norm_entropy_permille"
    )
    ce = (
        cross_entropy_from_tf(tf)
        .select("doc_id", "cross_entropy_micros")
        .localCheckpoint(eager=False)
    )
    m = ce.agg(
        F.expr(
            "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
        ).alias("mean_ce")
    )
    # _ENTROPY_REASONS_SQL is div-free, so the text is valid in both
    # engines verbatim
    reasons = _ENTROPY_REASONS_SQL
    return (
        ent.join(ce, "doc_id")
        .crossJoin(F.broadcast(m))
        .select(
            "doc_id",
            "n_tokens",
            "norm_entropy_permille",
            "cross_entropy_micros",
            F.expr(f"({reasons}) = ''").alias("keep"),
            F.expr(reasons).alias("drop_reasons"),
        )
        .orderBy("doc_id")
    )


@register(
    "stream_corpus_filter_entropy",
    oracle=_entropy_filter_oracle(),
    doc="STREAMING twin of corpus_filter_entropy (foreachBatch): "
    "documents arrive as a file stream and each microbatch appends "
    "its (doc, term, c) counts — doc_term_freq is doc-LOCAL, so the "
    "drained store equals the batch tokenization under ANY batching "
    "(the postings-ingest invariant) — then the identical "
    "_entropy_filter_from_tf fold replays the batch oracle verbatim. "
    "The per-doc entropy signal is decidable at ARRIVAL (doc-local); "
    "the perplexity cut is relative to the corpus-mean CE, which "
    "this bounded replay folds at drain — a production deployment "
    "would pin the mean (and the ln(gf) model) from the previous "
    "corpus snapshot to decide in-flight, same counts store either "
    "way. Completes the batch+streaming pairing the chisq/KL/entropy "
    "monitors already have, for the FILTER family. State per batch "
    "is O(batch vocabulary); the corpus text never re-scans.",
    tags=("pipeline", "text", "filter", "stats", "streaming"),
)
def stream_corpus_filter_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators.text import doc_term_freq

    docs_schema = _t(spark, sf_dir)["documents"].schema
    root = tempfile.mkdtemp(prefix="bosql_entfilter_stream_")
    store = os.path.join(root, "tf")

    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        doc_term_freq(batch_df).write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _entropy_filter_from_tf(spark.read.parquet(store))


def _entropy_filter_served_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    gf_ln = duckdb_ln_select("SELECT * FROM gf0", "gf + 1", "_lngf1")
    tot_ln = duckdb_ln_select(
        "SELECT CAST(SUM(gf) AS BIGINT) AS n_corpus,"
        " CAST(COUNT(*) AS BIGINT) AS n_vocab FROM gf0",
        "n_corpus + n_vocab",
        "_lnNV",
    )
    tf_ln = duckdb_ln_select("SELECT * FROM tfa0", "c", "_lnc")
    pd_ln = duckdb_ln_select("SELECT * FROM pd0", "n_tokens", "_lnn")
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tfall AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ), tfm AS (
        SELECT * FROM tfall WHERE doc_id % 10 <> 0
    ), tfa0 AS (
        SELECT * FROM tfall WHERE doc_id % 10 = 0
    ), gf0 AS (
        SELECT term, CAST(SUM(c) AS BIGINT) AS gf FROM tfm GROUP BY term
    ), gfl AS ({gf_ln}
    ), tot AS ({tot_ln}
    ), mpd AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl,
               SUM(CAST(c AS HUGEINT) * _lngf1) AS _s
        FROM tfm JOIN gfl USING (term) GROUP BY doc_id
    ), m AS (
        SELECT CAST(SUM(CAST(_lnNV - _s // dl AS BIGINT)) // COUNT(*)
                    AS BIGINT) AS mean_ce
        FROM mpd, tot
    ), apd AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               SUM(CAST(c AS HUGEINT) * COALESCE(_lngf1, 0)) AS _s
        FROM tfa0 LEFT JOIN gfl USING (term) GROUP BY doc_id
    ), ce AS (
        SELECT doc_id, n_tokens,
               CAST(_lnNV - _s // n_tokens AS BIGINT) AS cross_entropy_micros
        FROM apd, tot
    ), tfl AS ({tf_ln}
    ), pd0 AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               SUM(CAST(c AS HUGEINT) * _lnc) AS _sum_cln
        FROM tfl GROUP BY doc_id
    ), pd AS ({pd_ln}
    ), ent AS (
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN n_tokens <= 1 THEN 0
                    ELSE ((_lnn - _sum_cln // n_tokens) * 1000) // _lnn END
                    AS BIGINT) AS norm_entropy_permille
        FROM pd
    )
    SELECT ent.doc_id, ent.n_tokens, ent.norm_entropy_permille,
           ce.cross_entropy_micros,
           ({_ENTROPY_REASONS_SQL}) = '' AS keep,
           {_ENTROPY_REASONS_SQL} AS drop_reasons
    FROM ent JOIN ce USING (doc_id), m
    ORDER BY ent.doc_id
    """


@register(
    "corpus_filter_entropy_served",
    oracle=_entropy_filter_served_oracle(),
    doc="TRAIN->SERVE form of the entropy/perplexity corpus filter — "
    "the arrival-time decision the streaming twin's doc promises: "
    "freeze a Laplace-smoothed unigram LM (lm_smoothed_model: "
    "ln(gf+1) at vocab grain, ln(N+V) normalizer — add-one smoothing "
    "is what makes the model SERVABLE, unseen arrival terms score "
    "ln(1)=0 instead of breaking the ln) and the model corpus's mean "
    "CE under that same model (the frozen relative threshold), then "
    "score each arriving doc per-doc-locally: entropy needs nothing "
    "but the doc, CE needs one term-keyed join against the frozen "
    "vocab table (cross_entropy_served). Model = doc_id % 10 != 0, "
    "arrivals = the rest — the similarity train/serve split, for the "
    "LM filter. Integer-exact end to end, so the oracle replays "
    "every keep decision and reason string. Plan at scale: ONE "
    "corpus tokenization (checkpointed, filtered twice); model "
    "tables are vocabulary grain; arrivals never touch the model "
    "corpus again.",
    tags=("pipeline", "text", "filter", "stats"),
)
def corpus_filter_entropy_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.text import (
        cross_entropy_served,
        doc_term_freq,
        lm_smoothed_model,
    )

    docs = _t(spark, sf_dir)["documents"]
    tf_all = doc_term_freq(docs).localCheckpoint(eager=False)
    model_tf = tf_all.filter(F.expr("doc_id % 10 != 0"))
    arr_tf = tf_all.filter(F.expr("doc_id % 10 = 0"))
    terms, total = lm_smoothed_model(model_tf)
    terms = terms.localCheckpoint(eager=False)
    total = total.localCheckpoint(eager=False)
    mean = cross_entropy_served(model_tf, terms, total).agg(
        F.expr(
            "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
        ).alias("mean_ce")
    )
    return _lm_filter_decisions(arr_tf, terms, total, mean).orderBy("doc_id")


def _lm_filter_decisions(
    arr_tf: DataFrame, terms: DataFrame, total: DataFrame, mean: DataFrame
) -> DataFrame:
    """The arrival-side decision fold against a FROZEN model — shared
    by the one-shot train->serve query and the streaming server's
    per-microbatch decide: per-doc entropy (doc-local), CE via one
    term-keyed join against the model vocab, the mean-relative reason
    rule. ``mean`` is a 1-row (mean_ce) table; ``total`` carries
    ``_lnNV``."""
    from bo_sql_spark.operators.text import (
        cross_entropy_served,
        token_entropy_from_tf,
    )

    ent = token_entropy_from_tf(arr_tf).select(
        "doc_id", "n_tokens", "norm_entropy_permille"
    )
    ce = cross_entropy_served(arr_tf, terms, total).select(
        "doc_id", "cross_entropy_micros"
    )
    reasons = _ENTROPY_REASONS_SQL
    return (
        ent.join(ce, "doc_id")
        .crossJoin(F.broadcast(mean))
        .select(
            "doc_id",
            "n_tokens",
            "norm_entropy_permille",
            "cross_entropy_micros",
            F.expr(f"({reasons}) = ''").alias("keep"),
            F.expr(reasons).alias("drop_reasons"),
        )
    )


@register(
    "stream_filter_entropy_served",
    oracle=_entropy_filter_served_oracle(),
    doc="FULLY-SERVED streaming corpus filter — the production "
    "arrival-time decision the other two family members build toward: "
    "TRAIN freezes the Laplace-smoothed LM to a model STORE (vocab "
    "table + 1-row stats carrying ln(N+V) and the frozen mean-CE "
    "threshold), then documents stream in and each microbatch is "
    "DECIDED AT ARRIVAL — per-doc entropy is doc-local, CE is one "
    "term-keyed join against the frozen vocab store, keep/drop rows "
    "append to a decisions store; no drain-time fold, no state beyond "
    "the frozen model. Decisions are pure per-doc functions of the "
    "model, so the drained decision log replays the one-shot "
    "train->serve oracle verbatim under ANY batching. Completes the "
    "filter triangle: batch (corpus_filter_entropy), train->serve "
    "one-shot (corpus_filter_entropy_served), streaming-at-arrival "
    "(this). At 100 TB: the model store is vocabulary grain, arrivals "
    "cost O(batch) each, and re-training is a periodic batch job that "
    "atomically swaps the model store (snapshot_write_cas's job).",
    tags=("pipeline", "text", "filter", "stats", "streaming"),
)
def stream_filter_entropy_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    decisions = _stream_lm_decisions_store(spark, sf_dir)
    return spark.read.parquet(decisions).orderBy("doc_id")


def _stream_lm_decisions_store(spark: SparkSession, sf_dir: str) -> str:
    """Shared train + decide-at-arrival leg of stream_filter_entropy_
    served and its compaction twin: freezes the model store, streams
    the corpus, appends per-microbatch decisions; returns the
    decisions store path."""
    import os
    import tempfile

    from bo_sql_spark.operators.text import (
        cross_entropy_served,
        doc_term_freq,
        lm_smoothed_model,
    )

    docs = _t(spark, sf_dir)["documents"]
    root = tempfile.mkdtemp(prefix="bosql_lmserve_stream_")
    # TRAIN: freeze model + threshold to the store, once
    model_tf = doc_term_freq(
        docs.filter(F.expr("doc_id % 10 != 0"))
    ).localCheckpoint(eager=False)
    terms, total = lm_smoothed_model(model_tf)
    terms = terms.localCheckpoint(eager=False)
    total = total.localCheckpoint(eager=False)
    mean = cross_entropy_served(model_tf, terms, total).agg(
        F.expr(
            "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
        ).alias("mean_ce")
    )
    terms.write.mode("overwrite").parquet(root + "/model_terms")
    total.select("_lnNV").crossJoin(mean).write.mode("overwrite").parquet(
        root + "/model_stats"
    )
    # SERVE: every microbatch decides its arrivals against the store
    decisions = root + "/decisions"

    def decide(batch_df, batch_id):
        arr_tf = doc_term_freq(
            batch_df.filter(F.expr("doc_id % 10 = 0"))
        ).localCheckpoint(eager=False)
        mterms = spark.read.parquet(root + "/model_terms")
        stats = spark.read.parquet(root + "/model_stats")
        _lm_filter_decisions(
            arr_tf,
            mterms,
            stats.select("_lnNV"),
            stats.select("mean_ce"),
        ).write.mode("append").parquet(decisions)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )
    q = (
        stream.writeStream.foreachBatch(decide)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return decisions


@register(
    "stream_filter_entropy_served_compacted",
    oracle=_entropy_filter_served_oracle(),
    doc="Decision-log COMPACTION closes the served-filter maintenance "
    "loop the way stream_search_index_compacted closes the postings "
    "one: the decide-at-arrival stream appends a few files per "
    "microbatch — a year of triggers is a million tiny files and "
    "every backfill query pays listing O(history) — so the log gets "
    "the same compact_table treatment (read, re-bin by data volume, "
    "atomic swap), then REPLAYS THE SAME ORACLE from the compacted "
    "store: the equivalence proof that maintenance never changes "
    "decisions (rows are (doc, verdict) facts with no intra-file "
    "ordering contract). files_after <= files_before asserted inline "
    "— a compaction that inflates the store is a bug, not a trade.",
    tags=("pipeline", "text", "filter", "streaming", "store"),
)
def stream_filter_entropy_served_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bo_sql_spark.sinks import compact_table

    decisions = _stream_lm_decisions_store(spark, sf_dir)
    before, after = compact_table(spark, decisions, 1 << 20)
    if after > before:
        raise RuntimeError(
            f"decision-log compaction inflated the store: {before} -> {after}"
        )
    return spark.read.parquet(decisions).orderBy("doc_id")


def _lm_swap_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    reasons = _ENTROPY_REASONS_SQL

    def block(v: int, mpred: str, apred: str) -> str:
        gf_ln = duckdb_ln_select(f"SELECT * FROM gf0_{v}", "gf + 1", "_lngf1")
        tot_ln = duckdb_ln_select(
            f"SELECT CAST(SUM(gf) AS BIGINT) AS n_corpus,"
            f" CAST(COUNT(*) AS BIGINT) AS n_vocab FROM gf0_{v}",
            "n_corpus + n_vocab",
            "_lnNV",
        )
        tf_ln = duckdb_ln_select(f"SELECT * FROM tfa_{v}", "c", "_lnc")
        pd_ln = duckdb_ln_select(f"SELECT * FROM pd0_{v}", "n_tokens", "_lnn")
        return f""", tfm_{v} AS (
        SELECT * FROM tfall WHERE {mpred}
    ), tfa_{v} AS (
        SELECT * FROM tfall WHERE {apred}
    ), gf0_{v} AS (
        SELECT term, CAST(SUM(c) AS BIGINT) AS gf FROM tfm_{v} GROUP BY term
    ), gfl_{v} AS ({gf_ln}
    ), tot_{v} AS ({tot_ln}
    ), mpd_{v} AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl,
               SUM(CAST(c AS HUGEINT) * _lngf1) AS _s
        FROM tfm_{v} JOIN gfl_{v} USING (term) GROUP BY doc_id
    ), m_{v} AS (
        SELECT CAST(SUM(CAST(_lnNV - _s // dl AS BIGINT)) // COUNT(*)
                    AS BIGINT) AS mean_ce
        FROM mpd_{v}, tot_{v}
    ), apd_{v} AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               SUM(CAST(c AS HUGEINT) * COALESCE(_lngf1, 0)) AS _s
        FROM tfa_{v} LEFT JOIN gfl_{v} USING (term) GROUP BY doc_id
    ), ce_{v} AS (
        SELECT doc_id, n_tokens,
               CAST(_lnNV - _s // n_tokens AS BIGINT) AS cross_entropy_micros
        FROM apd_{v}, tot_{v}
    ), tfl_{v} AS ({tf_ln}
    ), pd0_{v} AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               SUM(CAST(c AS HUGEINT) * _lnc) AS _sum_cln
        FROM tfl_{v} GROUP BY doc_id
    ), pd_{v} AS ({pd_ln}
    ), ent_{v} AS (
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN n_tokens <= 1 THEN 0
                    ELSE ((_lnn - _sum_cln // n_tokens) * 1000) // _lnn END
                    AS BIGINT) AS norm_entropy_permille
        FROM pd_{v}
    ), dec_{v} AS (
        SELECT ent_{v}.doc_id, ent_{v}.n_tokens, ent_{v}.norm_entropy_permille,
               ce_{v}.cross_entropy_micros,
               ({reasons}) = '' AS keep,
               {reasons} AS drop_reasons,
               CAST({v} AS BIGINT) AS model_version
        FROM ent_{v} JOIN ce_{v} USING (doc_id), m_{v}
    )"""

    b1 = block(
        1,
        "doc_id % 10 IN (1, 2, 3, 4)",
        "doc_id % 10 = 0 AND (doc_id // 10) % 2 = 0",
    )
    b2 = block(
        2,
        "doc_id % 10 <> 0",
        "doc_id % 10 = 0 AND (doc_id // 10) % 2 = 1",
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tfall AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE term <> '' GROUP BY doc_id, term
    ){b1}{b2}
    SELECT * FROM dec_1 UNION ALL SELECT * FROM dec_2 ORDER BY doc_id
    """


@register(
    "store_lm_model_swap",
    oracle=_lm_swap_oracle(),
    doc="Versioned model lifecycle — the LM filter closed through the "
    "CAS snapshot store: TRAIN v1 on the early corpus slice "
    "(doc_id%10 in 1..4) and PUBLISH it as ONE snapshot table (the "
    "vocab rows with ln(N+V) and the frozen mean-CE denormalized "
    "onto them — a model is just a table, so the store's atomic "
    "commit, time travel, and multi-writer arbitration all apply "
    "verbatim); serve the first arrival wave against v1; RE-TRAIN on "
    "the full model corpus and snapshot_write_cas the v2 swap — old "
    "readers keep v1 (old-until-published), new serves read v2; "
    "serve the second wave. Every decision row carries "
    "model_version, the provenance a production filter needs for "
    "backfills ('which model dropped this doc?'). Fully "
    "deterministic: versions are 1 and 2 on a fresh store, waves "
    "split by (doc_id DIV 10) parity, so the oracle replays both "
    "models, both waves, and every reason string. At 100 TB: "
    "re-training is the periodic batch job; the swap is one CAS "
    "commit; decisions are append-only with the version column.",
    tags=("pipeline", "text", "filter", "store", "stats"),
)
def store_lm_model_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.text import (
        cross_entropy_served,
        doc_term_freq,
        lm_smoothed_model,
    )
    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    docs = _t(spark, sf_dir)["documents"]
    root = tempfile.mkdtemp(prefix="bosql_lm_swap_") + "/model"

    def train(model_pred: str) -> DataFrame:
        tf = doc_term_freq(docs.filter(F.expr(model_pred))).localCheckpoint(
            eager=False
        )
        terms, total = lm_smoothed_model(tf)
        terms = terms.localCheckpoint(eager=False)
        total = total.localCheckpoint(eager=False)
        mean = cross_entropy_served(tf, terms, total).agg(
            F.expr(
                "CAST(SUM(cross_entropy_micros) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_ce")
        )
        return terms.crossJoin(F.broadcast(total.select("_lnNV"))).crossJoin(
            F.broadcast(mean)
        )

    def serve(version: int, arr_pred: str) -> DataFrame:
        model = snapshot_read(spark, root, version=version).localCheckpoint(
            eager=False
        )
        arr_tf = doc_term_freq(docs.filter(F.expr(arr_pred))).localCheckpoint(
            eager=False
        )
        return _lm_filter_decisions(
            arr_tf,
            model.select("term", "_lngf1"),
            model.select("_lnNV").limit(1),
            model.select("mean_ce").limit(1),
        ).withColumn("model_version", F.lit(version).cast("long"))

    v1 = snapshot_write_cas(spark, train("doc_id % 10 IN (1, 2, 3, 4)"), root)
    d1 = serve(v1, "doc_id % 10 = 0 AND (doc_id DIV 10) % 2 = 0")
    v2 = snapshot_write_cas(spark, train("doc_id % 10 != 0"), root)
    d2 = serve(v2, "doc_id % 10 = 0 AND (doc_id DIV 10) % 2 = 1")
    return d1.unionByName(d2).orderBy("doc_id")


def _ivf_swap_oracle() -> str:
    """The IVF lifecycle oracle: two (train -> index -> probe -> serve)
    blocks over different training slices and arrival waves, replayed
    entirely in SQL — same fixed-point centroid means and expanded-L2
    op order as the similarity_ivf_train* oracles."""

    def block(v: int, train_pred: str, wave_pred: str) -> str:
        return f""", a_{v} AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN seeds WHERE {train_pred} GROUP BY vec_id
    ), bd_{v} AS (
        SELECT a_{v}.cell, generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
        FROM a_{v} JOIN vecs e USING (vec_id)
    ), dm_{v} AS (
        SELECT cell, pos, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sm, COUNT(*) AS n FROM bd_{v} GROUP BY cell, pos
    ), c_{v} AS (
        SELECT cell AS c_id, array_agg(CAST(FLOOR(sm / n + 0.5) AS BIGINT) / 1000000.0 ORDER BY pos) AS cv
        FROM dm_{v} GROUP BY cell
    ), idx_{v} AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN c_{v} WHERE vec_id % 10 <> 0 GROUP BY vec_id
    ), q_{v} AS (
        SELECT vec_id AS qid, v AS qv FROM vecs WHERE {wave_pred}
    ), p_{v} AS (
        SELECT qid, cell, qv FROM (
            SELECT q.qid, c.c_id AS cell, q.qv,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                       list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.cv)
                       + list_dot_product(c.cv, c.cv), c.c_id) AS rn
            FROM q_{v} q CROSS JOIN c_{v} c
        ) WHERE rn <= 2
    ), sc_{v} AS (
        SELECT p.qid, i.vec_id,
               list_dot_product(e.v, p.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS sim
        FROM p_{v} p
        JOIN idx_{v} i ON i.cell = p.cell
        JOIN vecs e ON e.vec_id = i.vec_id
    ), r_{v} AS (
        SELECT qid AS query_id, vec_id, ROUND(sim, 6) AS cos_sim,
               CAST({v} AS BIGINT) AS index_version
        FROM (
            SELECT qid, vec_id, sim,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
            FROM sc_{v}
        ) WHERE rn <= 10
    )"""

    b1 = block(
        1,
        "vec_id % 10 IN (1, 2, 3, 4)",
        "vec_id % 10 = 0 AND (vec_id // 10) % 2 = 0",
    )
    b2 = block(
        2,
        "vec_id % 10 <> 0",
        "vec_id % 10 = 0 AND (vec_id // 10) % 2 = 1",
    )
    return f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), seeds AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ){b1}{b2}
    SELECT * FROM r_1 UNION ALL SELECT * FROM r_2
    ORDER BY index_version, query_id, vec_id
    """


@register(
    "store_ivf_model_swap",
    oracle=_ivf_swap_oracle(),
    doc="Versioned ANN index lifecycle — store_lm_model_swap's story "
    "for the similarity family (verdict r11 #4): TRAIN v1 centroids "
    "(one fixed-point Lloyd step, seeds = vec_id<16) on the early "
    "corpus slice (vec_id%10 in 1..4), assign the servable corpus "
    "(vec_id%10<>0), and PUBLISH assignment + centroid rows as ONE "
    "snapshot version partitioned by (kind, cell) — the index is just "
    "a table, so CAS commit, time travel, and vacuum apply verbatim, "
    "and the cell layout survives inside each version dir so serving "
    "keeps its PartitionFilters pruning across swaps. Serve arrival "
    "wave 1 (vec_id%10=0, even DIV-10 parity) against v1 through the "
    "shared batch path (probe top-2 cells in-engine, pruned join, "
    "per-qid top-10); RE-TRAIN on the full drifted corpus, CAS-swap "
    "v2 (readers of v1 are untouched — old-until-published), serve "
    "wave 2. Every result row carries index_version — 'which "
    "centroids served this neighbor?', the backfill provenance the LM "
    "swap established for filters. At 100 TB: retrain is the periodic "
    "batch job, the swap is one CAS commit, and a version dir is "
    "immutable so in-flight queries never see a half-swapped index.",
    tags=("pipeline", "similarity", "approx", "store"),
)
def store_ivf_model_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    emb = _t(spark, sf_dir)["embeddings"]
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    seeds = vecs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    corpus = vecs.filter(F.expr("vec_id % 10 != 0"))
    root = tempfile.mkdtemp(prefix="bosql_ivf_swap_") + "/index"

    def train(pred: str) -> DataFrame:
        step = S.ivf_train_step(vecs.filter(F.expr(pred)), seeds)
        return step.select(
            F.col("cell").alias("c_id"), F.col("centroid").alias("c_vec")
        )

    def publish(cents: DataFrame) -> DataFrame:
        assigned = S.ivf_assign(corpus, cents)
        a = assigned.select(
            "vec_id",
            F.col("embedding").alias("vec"),
            F.lit("a").alias("kind"),
            F.col("cell").cast("long").alias("cell"),
        )
        c = cents.select(
            F.col("c_id").cast("long").alias("vec_id"),
            F.col("c_vec").alias("vec"),
            F.lit("c").alias("kind"),
            F.col("c_id").cast("long").alias("cell"),
        )
        return a.unionByName(c)

    def serve(version: int, wave_pred: str) -> DataFrame:
        store = snapshot_read(spark, root, version=version)
        cents = store.filter(F.col("kind") == "c").select(
            F.col("cell").cast("long").alias("c_id"), F.col("vec").alias("c_vec")
        )
        idx = store.filter(F.col("kind") == "a").select(
            "vec_id", F.col("vec").alias("embedding"), "cell"
        )
        qs = vecs.filter(F.expr(wave_pred)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        return S.ivf_batch_topk_from_store(
            idx, qs, cents, n_probe=2, k=10, exclude_qid_matches=False
        ).withColumn("index_version", F.lit(version).cast("long"))

    v1 = snapshot_write_cas(
        spark, publish(train("vec_id % 10 IN (1, 2, 3, 4)")), root,
        partition_by=["kind", "cell"],
    )
    d1 = serve(v1, "vec_id % 10 = 0 AND (vec_id DIV 10) % 2 = 0")
    v2 = snapshot_write_cas(
        spark, publish(train("vec_id % 10 != 0")), root,
        partition_by=["kind", "cell"],
    )
    d2 = serve(v2, "vec_id % 10 = 0 AND (vec_id DIV 10) % 2 = 1")
    return d1.unionByName(d2).orderBy("index_version", "query_id", "vec_id")


def _zipf_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    ln_chain = duckdb_ln_select(
        duckdb_ln_select("SELECT * FROM ranked", "rank", "_x"), "c", "_y"
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), ucnt AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE term <> '' GROUP BY term
    ), ranked AS (
        SELECT * FROM (
            SELECT term, c,
                   CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT) AS rank
            FROM ucnt
        ) WHERE rank <= 1000
    ), lns AS ({ln_chain}
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(_x) AS BIGINT) AS sx,
               CAST(SUM(_y) AS BIGINT) AS sy,
               CAST(SUM(_x * _y) AS BIGINT) AS sxy,
               CAST(SUM(_x * _x) AS BIGINT) AS sxx
        FROM lns
    )
    SELECT n AS n_terms_fit,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
                // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                AS BIGINT) AS slope_micros,
           CAST((sy - CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
                           // (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                           AS BIGINT) * sx // 1000000) // n
                AS BIGINT) AS intercept_micros
    FROM s
    """


@register(
    "corpus_zipf_slope",
    oracle=_zipf_oracle(),
    doc="Zipf's-law fit of the corpus frequency spectrum, exact in "
    "integer micros: least-squares slope of ln(count) on ln(rank) "
    "over the top-1000 head ranks — slope ~ -1 is the healthy "
    "natural-language signature; departures flag boilerplate floods, "
    "template spam, or tokenizer damage in an ingested crawl (the "
    "corpus-health dashboard number, now computable without libm "
    "because both ln's are the fixed-point step list and the "
    "normal-equation products run in DECIMAL(38)/HUGEINT — signed "
    "DIVs truncate identically in both engines). Plan at scale: one "
    "vocabulary-grain count aggregate; the rank window sorts "
    "|vocab| POST-AGGREGATE rows (never tokens) and the fit "
    "consumes <= 1000 of them into a 1-row normal-equation fold.",
    tags=("pipeline", "text", "stats"),
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bo_sql_spark.functions.fixedpoint import with_ln_micros

    docs = _t(spark, sf_dir)["documents"]
    toks = docs.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term")
    ).filter(F.col("term") != "")
    ucnt = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy(F.col("c").desc(), "term")
    ranked = (
        ucnt.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 1000)
    )
    ranked = with_ln_micros(ranked, "rank", "_x")
    ranked = with_ln_micros(ranked, "c", "_y")
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x").cast("long").alias("sx"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum(F.expr("_x * _y")).cast("long").alias("sxy"),
        F.sum(F.expr("_x * _x")).cast("long").alias("sxx"),
    )
    slope = (
        "CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
        " * 1000000"
        " DIV (CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
        " AS BIGINT)"
    )
    return s.select(
        F.col("n").alias("n_terms_fit"),
        F.expr(slope).alias("slope_micros"),
        F.expr(
            f"CAST((sy - CAST({slope} AS DECIMAL(38,0)) * sx DIV 1000000) DIV n"
            " AS BIGINT)"
        ).alias("intercept_micros"),
    )


_SEARCH_TERMS = ("dup", "merge", "vector")


@register(
    "text_keyword_search",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), hits AS (
        SELECT doc_id FROM toks
        WHERE term IN ('{_SEARCH_TERMS[0]}', '{_SEARCH_TERMS[1]}', '{_SEARCH_TERMS[2]}')
        GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3
    )
    SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN hits USING (doc_id)
    """,
    doc="Inverted-index conjunctive search (operators/search.py:"
    "conjunctive_search): documents containing ALL query terms, as "
    "posting-list algebra — the posting list is the distinct "
    "(term, doc_id) relation, the AND is one doc-grain aggregate with "
    "HAVING count(distinct term) = k (no k-way self-join). The term "
    "filter applies at token grain BEFORE anything shuffles, so "
    "shuffled bytes are proportional to the query terms' selectivity, "
    "never the corpus; against a term-partitioned materialized store "
    "the same filter becomes partition pruning (the text twin of the "
    "served IVF index). Joined back to documents for the hit rows.",
    tags=("pipeline", "text", "search"),
)
def text_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import conjunctive_search

    docs = _t(spark, sf_dir)["documents"]
    hits = conjunctive_search(docs, list(_SEARCH_TERMS))
    return hits.join(docs, "doc_id").select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "text_search_served",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        WHERE term IN ('{_SEARCH_TERMS[0]}', '{_SEARCH_TERMS[1]}', '{_SEARCH_TERMS[2]}')
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms_hit,
           CAST(SUM(tf) AS BIGINT) AS tf_sum
    FROM tf GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3
    """,
    doc="SERVED conjunctive search (operators/search.py:"
    "materialize_inverted_index + search_served) — the text twin of "
    "similarity_ivf_served: posting lists at (term, doc_id, tf) grain "
    "materialized ONCE, partitioned by pmod(xxhash64(term), 64), then "
    "the query's term filter lands on the partition column and the "
    "scan touches only the probed term buckets (PartitionFilters, "
    "plan-pinned in test_scale_ops). At 100 TB the corpus is "
    "tokenized once per index (re)build, amortized over every query; "
    "each query reads O(terms/buckets) of the index instead of "
    "rescanning text. Hash bucketing keeps directory count fixed and "
    "spreads hot terms within a bucket.",
    tags=("pipeline", "text", "search"),
)
def text_search_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.search import (
        materialize_inverted_index,
        search_served,
    )

    docs = _t(spark, sf_dir)["documents"]
    path = tempfile.mkdtemp(prefix="bosql_invidx_") + "/index"
    materialize_inverted_index(docs, path)
    return search_served(spark, path, list(_SEARCH_TERMS))


_PHRASE_ORACLE = """
    WITH arrs AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
        FROM documents
    ), toks AS (
        SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS term FROM arrs
    ), hits AS (
        SELECT doc_id, pos - idx AS anchor, idx
        FROM toks JOIN (VALUES ('hash', 0), ('join', 1)) AS q(term, idx) USING (term)
    ), anchors AS (
        SELECT doc_id, anchor FROM hits
        GROUP BY doc_id, anchor HAVING COUNT(DISTINCT idx) = 2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM anchors GROUP BY doc_id
    """


@register(
    "text_phrase_search",
    oracle=_PHRASE_ORACLE,
    doc="Exact-phrase search (operators/search.py:phrase_search) for "
    "'hash join' via POSITIONAL postings and the anchor trick: word i "
    "at position p contributes anchor p - i, so a (doc, anchor) group "
    "holding all k distinct word-indices is a phrase match — a plain "
    "aggregate, never a k-way positional self-join. One corpus scan "
    "(the phrase-word map is a broadcast k-row join, repeated words "
    "handled naturally); only query-word hits shuffle, each one "
    "(id, anchor, idx). Oracle replays positions via "
    "generate_subscripts — 1-based vs Spark's 0-based posexplode "
    "cancels in the anchor GROUPING (output is doc-grain counts).",
    tags=("pipeline", "text", "search"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import phrase_search

    docs = _t(spark, sf_dir)["documents"]
    return phrase_search(docs, ["hash", "join"])


@register(
    "store_snapshot_timetravel",
    oracle="""
    WITH v1 AS (
        SELECT COUNT(*) AS n, SUM(n_chars) AS chars FROM documents WHERE doc_id % 2 = 0
    ), v2 AS (
        SELECT COUNT(*) AS n, SUM(n_chars) AS chars FROM documents
    )
    SELECT CAST(1 AS BIGINT) AS version, CAST(n AS BIGINT) AS n_docs,
           CAST(chars AS BIGINT) AS sum_chars,
           CAST(0 AS BIGINT) AS n_added
    FROM v1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(v2.n AS BIGINT), CAST(v2.chars AS BIGINT),
           CAST(v2.n - v1.n AS BIGINT)
    FROM v1, v2
    """,
    doc="Snapshot-store time travel, driver-graded (sinks.py:"
    "snapshot_write_cas/snapshot_read): commit two versions of the "
    "documents table through the multi-writer CAS protocol (claim "
    "marker -> immutable v=<n> dir -> commit marker), then read BOTH "
    "versions back — v1 while v2 already exists (time travel) — and "
    "emit per-version profiles plus the added-row delta. The oracle "
    "computes the same profiles straight from the source table, so a "
    "store that lost, duplicated, or mixed rows across versions "
    "hash-mismatches. The maintenance layer every incremental store "
    "in this repo (SemDeDup, IVF, inverted index) would sit on at "
    "100 TB: immutable versions + atomic publication, readers never "
    "see partial writes.",
    tags=("pipeline", "store"),
)
def store_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.sinks import snapshot_read, snapshot_write_cas

    docs = _t(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="bosql_snap_") + "/tbl"
    v1 = snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
    v2 = snapshot_write_cas(spark, docs, root)

    def profile(version: int, prev_n) -> DataFrame:
        d = snapshot_read(spark, root, version)
        return d.agg(
            F.lit(version).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )

    p1 = profile(v1, None)
    p2 = profile(v2, None)
    n1 = p1.select("n_docs")
    return (
        p1.withColumn("n_added", F.lit(0).cast("long"))
        .unionByName(
            p2.crossJoin(
                F.broadcast(n1.select(F.col("n_docs").alias("_n1")))
            ).select(
                "version",
                "n_docs",
                "sum_chars",
                (F.col("n_docs") - F.col("_n1")).cast("long").alias("n_added"),
            )
        )
    )


@register(
    "store_snapshot_vacuum_lifecycle",
    oracle="""
    WITH v2 AS (
        SELECT COUNT(*) AS n, SUM(n_chars) AS c FROM documents WHERE doc_id % 2 = 0
    ), v3 AS (
        SELECT COUNT(*) AS n, SUM(n_chars) AS c FROM documents
    )
    SELECT CAST(1 AS BIGINT) AS version, 'removed' AS status,
           CAST(0 AS BIGINT) AS n_docs, CAST(0 AS BIGINT) AS sum_chars
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'kept', CAST(n AS BIGINT), CAST(c AS BIGINT) FROM v2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'kept', CAST(n AS BIGINT), CAST(c AS BIGINT) FROM v3
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'removed', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'removed', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY version
    """,
    doc="Snapshot-store RETENTION lifecycle, driver-graded (sinks.py:"
    "snapshot_vacuum — the r9 post-rehearsal commit, now under the "
    "rehearsal gate): commit three versions through the CAS protocol, "
    "plant both crashed-writer shapes (a claim with NO data — crash "
    "between claim and data write — and a stale claim WITH data but "
    "no commit), then vacuum with keep=2 and age 0. The vacuum must "
    "remove exactly {v1 (committed, beyond retention), v4 (dataless "
    "stale claim), v5 (uncommitted stale claim)} and leave v2/v3 "
    "readable and intact — the emitted rows are the ACTUAL vacuum "
    "return plus per-survivor profiles re-read from the store, so a "
    "vacuum that deletes a kept version, spares an orphan, or "
    "corrupts survivors hash-mismatches against the oracle's "
    "source-derived expectation. Driver-side list handling is "
    "metadata-grain (the documented scalar edge: a handful of "
    "version numbers, never data).",
    tags=("pipeline", "store"),
)
def store_snapshot_vacuum_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark import fsutil
    from bo_sql_spark.sinks import (
        _COMMITS_DIR,
        _marker_versions,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write_cas,
    )

    docs = _t(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="bosql_vac_") + "/tbl"
    snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 3 == 0), root)
    snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
    snapshot_write_cas(spark, docs, root)
    # crash between claim and data: dataless claim marker v4
    fsutil.create_atomic(spark, root + "/_claims/v-4", "4")
    # crash between data and commit: claim + data, no commit marker v5
    fsutil.create_atomic(spark, root + "/_claims/v-5", "5")
    docs.limit(10).write.parquet(root + "/v=5")
    removed = snapshot_vacuum(spark, root, keep=2, claim_min_age_s=0)
    survivors = sorted(_marker_versions(spark, root, _COMMITS_DIR))
    removed_df = spark.createDataFrame(
        [(v,) for v in removed], "version long"
    ).select(
        "version",
        F.lit("removed").alias("status"),
        F.lit(0).cast("long").alias("n_docs"),
        F.lit(0).cast("long").alias("sum_chars"),
    )
    profiles = [
        snapshot_read(spark, root, v).agg(
            F.lit(v).cast("long").alias("version"),
            F.lit("kept").alias("status"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        for v in survivors
    ]
    out = removed_df
    for p in profiles:
        out = out.unionByName(p)
    return out.orderBy("version")


@register(
    "store_snapshot_retention_horizon",
    oracle="""
    WITH v3 AS (
        SELECT COUNT(*) AS n FROM documents WHERE doc_id % 2 = 0
    ), v4 AS (
        SELECT COUNT(*) AS n FROM documents
    )
    SELECT CAST(1 AS BIGINT) AS version, 'young_retained' AS phase1,
           'removed' AS phase2, CAST(0 AS BIGINT) AS n_docs
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'young_retained', 'removed', CAST(0 AS BIGINT)
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'young_retained', 'kept', CAST(n AS BIGINT) FROM v3
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'young_retained', 'kept', CAST(n AS BIGINT) FROM v4
    ORDER BY version
    """,
    doc="Retention POLICY on the snapshot store (verdict r11 #6): an "
    "append-only decision/postings log compacts into new versions "
    "forever, so vacuum needs BOTH rails — keep the last N versions "
    "AND everything newer than the time horizon T (sinks.py:"
    "snapshot_vacuum's min_age_s, Delta's retention period). Commit "
    "four versions; phase 1 vacuums with keep=2 but a far horizon — "
    "NOTHING may be removed even though v1/v2 are beyond the count "
    "window, because every commit is younger than T (the rail that "
    "protects a long-running reader of a just-superseded version); "
    "phase 2 vacuums with the horizon at 0 — exactly v1/v2 go, v3/v4 "
    "stay readable and intact (profiles re-read from the store). A "
    "vacuum that ignores the horizon, removes a kept version, or "
    "corrupts a survivor hash-mismatches. The concurrent-reader race "
    "itself is pinned by tests/test_sinks.py:"
    "test_vacuum_concurrent_reader_of_retained_version.",
    tags=("pipeline", "store"),
)
def store_snapshot_retention_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.sinks import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_write_cas,
    )

    docs = _t(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="bosql_ret_") + "/tbl"
    snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 5 == 0), root)
    snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 3 == 0), root)
    snapshot_write_cas(spark, docs.filter(F.col("doc_id") % 2 == 0), root)
    snapshot_write_cas(spark, docs, root)

    # phase 1: count window says drop v1/v2, the horizon says all four
    # commits are younger than a week — nothing may go
    removed_1 = snapshot_vacuum(
        spark, root, keep=2, claim_min_age_s=0, min_age_s=7 * 86400
    )
    if removed_1:
        raise RuntimeError(
            f"horizon ignored: vacuum removed {removed_1} inside min_age_s"
        )
    phase1 = {v: "young_retained" for v in (1, 2, 3, 4)}

    # phase 2: horizon at 0 — the count window alone decides
    removed_2 = set(snapshot_vacuum(spark, root, keep=2, claim_min_age_s=0))
    rows = []
    for v in (1, 2, 3, 4):
        rows.append((v, phase1[v], "removed" if v in removed_2 else "kept"))
    base = spark.createDataFrame(rows, "version long, phase1 string, phase2 string")
    profiles = None
    for v in sorted({1, 2, 3, 4} - removed_2):
        p = snapshot_read(spark, root, v).agg(
            F.lit(v).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        profiles = p if profiles is None else profiles.unionByName(p)
    return (
        base.join(profiles, "version", "left")
        .select(
            "version", "phase1", "phase2",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("version")
    )


_PROXIMITY_ORACLE = """
    WITH arrs AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
        FROM documents
    ), toks AS (
        SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS term FROM arrs
    ), hits AS (
        SELECT doc_id, pos, CASE term WHEN 'dup' THEN 1 WHEN 'vector' THEN 2 END AS m
        FROM toks WHERE term IN ('dup', 'vector')
    ), masked AS (
        SELECT doc_id, bit_or(m) OVER (PARTITION BY doc_id ORDER BY pos
                   RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS mask
        FROM hits
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM masked WHERE mask = 3 GROUP BY doc_id
    """


@register(
    "text_proximity_search",
    oracle=_PROXIMITY_ORACLE,
    doc="Proximity search (operators/search.py:proximity_search): "
    "'dup' and 'vector' within a 12-token span, any order — the "
    "between-phrase-and-AND retrieval primitive. Term i contributes "
    "bit 1<<i at its positions and a RANGE-frame sliding window "
    "(11 PRECEDING..CURRENT over token position) OR-folds the bits; "
    "an all-ones frame mask means every term is in the span, and "
    "checking only windows ENDING at a hit is exhaustive (a covering "
    "span shrinks to one ending at its last hit). The per-doc window "
    "runs over QUERY-TERM HITS only — selectivity-bound like "
    "conjunctive_search, never the token stream. 1-based vs 0-based "
    "positions cancel in the RANGE offsets (both engines span 12 "
    "consecutive positions).",
    tags=("pipeline", "text", "search"),
)
def text_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import proximity_search

    docs = _t(spark, sf_dir)["documents"]
    return proximity_search(docs, ["dup", "vector"], window=12)


@register(
    "text_phrase_served",
    oracle=_PHRASE_ORACLE,
    doc="SERVED exact-phrase search (operators/search.py:"
    "phrase_served): the positional index completes the served family "
    "— each posting carries its sorted positions array, so the phrase "
    "query reads ONLY the phrase words' term buckets (partition "
    "pruning), explodes positions per pruned hit, and runs the same "
    "anchor aggregate as the one-shot scanner (shared _phrase_fold => "
    "identical matches by construction; this entry runs "
    "text_phrase_search's oracle VERBATIM). At 100 TB: phrase queries "
    "without tokenizing a single document at query time.",
    tags=("pipeline", "text", "search"),
)
def text_phrase_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.search import (
        materialize_inverted_index,
        phrase_served,
    )

    docs = _t(spark, sf_dir)["documents"]
    path = tempfile.mkdtemp(prefix="bosql_posidx_") + "/index"
    materialize_inverted_index(docs, path)
    return phrase_served(spark, path, ["hash", "join"])


@register(
    "text_proximity_served",
    oracle=_PROXIMITY_ORACLE,
    doc="SERVED proximity search (operators/search.py:"
    "proximity_served): pruned positional hits from the index feed "
    "the same bitmask RANGE-window fold as the one-shot scanner "
    "(shared _proximity_fold => text_proximity_search's oracle "
    "VERBATIM). With conjunctive, BM25, phrase, and proximity all "
    "serving from ONE term-bucket-partitioned store, the index build "
    "amortizes across every retrieval mode.",
    tags=("pipeline", "text", "search"),
)
def text_proximity_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.search import (
        materialize_inverted_index,
        proximity_served,
    )

    docs = _t(spark, sf_dir)["documents"]
    path = tempfile.mkdtemp(prefix="bosql_posidx_") + "/index"
    materialize_inverted_index(docs, path)
    return proximity_served(spark, path, ["dup", "vector"], window=12)


def _bm25_ctes(idf_sql: str) -> str:
    """The WITH-body of the DuckDB bm25_fold replay up to per-doc
    scores (CTE ``bmdoc``: doc_id, bm25_micros, n_terms_hit) — shared
    by the ranked-retrieval oracle and the hybrid-RRF oracle so the
    fold text exists exactly once. Parameterized by the idf expression
    source (log via the fixed-point ln step list, or the historical
    linear surrogate); every stage mirrors the Spark fold op-for-op
    (HUGEINT where Spark widens to DECIMAL(38,0))."""
    return f"""toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), t2 AS (
        SELECT doc_id, term FROM toks WHERE term <> ''
    ), dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t2 GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t2
        WHERE term IN ('{_SEARCH_TERMS[0]}', '{_SEARCH_TERMS[1]}', '{_SEARCH_TERMS[2]}')
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t2
        WHERE term IN ('{_SEARCH_TERMS[0]}', '{_SEARCH_TERMS[1]}', '{_SEARCH_TERMS[2]}')
        GROUP BY term
    ), idf AS ({idf_sql}
    ), scored AS (
        SELECT tf.doc_id,
               CAST(CAST(idf_micros AS HUGEINT)
                    * CAST(CAST(tf AS HUGEINT) * 2200000 * 1000000
                           // (tf * 1000000 + 300000
                               + (900000 * CAST(CAST(dl AS HUGEINT) * 1000000 * n_docs
                                                // sum_dl AS BIGINT)) // 1000000)
                           AS BIGINT)
                    // 1000000 AS BIGINT) AS term_score
        FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
    ), bmdoc AS (
        SELECT doc_id,
               CAST(SUM(term_score) AS BIGINT) AS bm25_micros,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM scored GROUP BY doc_id
    )"""


def _bm25_oracle(idf_sql: str) -> str:
    return f"""
    WITH {_bm25_ctes(idf_sql)}
    SELECT doc_id, bm25_micros, n_terms_hit
    FROM bmdoc
    ORDER BY bm25_micros DESC, doc_id LIMIT 20
    """


def _bm25_log_idf_sql() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    inner = duckdb_ln_select(
        duckdb_ln_select(
            "SELECT term, df, n_docs FROM dfreq CROSS JOIN corpus",
            "2 * n_docs + 2",
            "_ln_n",
        ),
        "2 * df + 1",
        "_ln_df",
    )
    return f"SELECT term, _ln_n - _ln_df AS idf_micros FROM ({inner})"


_BM25_ORACLE = _bm25_oracle(_bm25_log_idf_sql())
_BM25_ORACLE_LINEAR = _bm25_oracle(
    "SELECT term, (n_docs * 1000000) // df AS idf_micros FROM dfreq CROSS JOIN corpus"
)


@register(
    "text_bm25_topdocs",
    oracle=_BM25_ORACLE,
    doc="TEXTBOOK fixed-point BM25 ranked retrieval (operators/"
    "search.py:bm25_topk): top-20 documents for a 3-term OR query, "
    "scored with the BM25 formula (k1=1.2, b=0.75, Robertson & "
    "Walker '94) in exact integer micros — the idf is the Lucene "
    "log form ln(1 + (N-df+0.5)/(df+0.5)) = ln(2N+2) - ln(2df+1), "
    "computed with the portable fixed-point ln (functions/"
    "fixedpoint.py: argument reduction + atanh series, <= 1 micro "
    "from math.log, bit-identical across engines), so multi-term "
    "sums order EXACTLY as the textbook score — the r9 linear "
    "surrogate's one divergence, closed (kept as "
    "text_bm25_topdocs_linear). tf saturation and length "
    "normalization are rational in (tf, dl, avgdl), every DIV "
    "floor-on-positives; the dl-ratio and tf numerators run "
    "DECIMAL(38)/HUGEINT so nothing wraps at 100 TB doc counts. "
    "Plan at scale: term filter before any shuffle; df and corpus "
    "length stats are tiny broadcast aggregates and the ln steps "
    "run at TERM grain (|query terms| rows), never per posting; "
    "final top-20 is a TakeOrderedAndProject with a doc_id "
    "tie-break, never a global sort.",
    tags=("pipeline", "text", "search"),
)
def text_bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import bm25_topk

    docs = _t(spark, sf_dir)["documents"]
    return bm25_topk(docs, list(_SEARCH_TERMS), k=20)


@register(
    "text_bm25_topdocs_linear",
    oracle=_BM25_ORACLE_LINEAR,
    doc="The rounds-1-9 LINEAR-idf BM25 variant, kept as an explicit "
    "named form (idf = (N*1e6) DIV df — monotone in 1/df per term, "
    "zero libm, but multi-term sums can order differently from "
    "log-idf when df ratios are large; text_bm25_topdocs is the "
    "textbook-faithful default). Same shared bm25_fold, same plan "
    "shape; only the term-grain idf table differs.",
    tags=("pipeline", "text", "search"),
)
def text_bm25_topdocs_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import bm25_topk

    docs = _t(spark, sf_dir)["documents"]
    return bm25_topk(docs, list(_SEARCH_TERMS), k=20, idf_mode="linear")


@register(
    "text_bm25_served",
    oracle=_BM25_ORACLE,
    doc="SERVED BM25 (operators/search.py:bm25_served): the ranked "
    "twin of text_search_served — tf and dl are posting columns, "
    "(n_docs, sum_dl) is the tiny stats table written at build time, "
    "and per-term df is computed from the PRUNED postings (exact: "
    "pruning keeps every posting of the query terms), so a ranked "
    "query reads O(query term buckets) of the index and never "
    "touches corpus text. Scores are bit-identical to the one-shot "
    "bm25_topk by construction (shared bm25_fold), which is why this "
    "entry runs against text_bm25_topdocs' oracle VERBATIM — the "
    "strongest served-equals-batch statement the registry can make.",
    tags=("pipeline", "text", "search"),
)
def text_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.operators.search import (
        bm25_served,
        materialize_inverted_index,
    )

    docs = _t(spark, sf_dir)["documents"]
    path = tempfile.mkdtemp(prefix="bosql_bm25idx_") + "/index"
    materialize_inverted_index(docs, path)
    return bm25_served(spark, path, list(_SEARCH_TERMS), k=20)


_SERVED_CONJ_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        WHERE term IN ('{_SEARCH_TERMS[0]}', '{_SEARCH_TERMS[1]}', '{_SEARCH_TERMS[2]}')
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms_hit,
           CAST(SUM(tf) AS BIGINT) AS tf_sum
    FROM tf GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3
    """


def _ingest_postings_stream(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64
) -> str:
    """Shared streaming-ingest leg of stream_search_index_ingest and
    stream_search_index_compacted: documents as a file stream, each
    microbatch appending its postings to a fresh term-bucket-
    partitioned store. Returns the store path."""
    import os
    import tempfile

    from bo_sql_spark.operators.search import append_postings

    docs_schema = _t(spark, sf_dir)["documents"].schema
    root = tempfile.mkdtemp(prefix="bosql_idx_stream_")
    store = os.path.join(root, "index")

    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        # the contract append path: postings appended, _stats
        # sum-merged, any stale _terms idf table invalidated
        append_postings(batch_df, store, n_term_buckets=n_buckets)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store


def _hybrid_rrf_oracle() -> str:
    return f"""
    WITH {_bm25_ctes(_bm25_log_idf_sql())},
    lex AS (
        SELECT doc_id, r_lex FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25_micros DESC, doc_id) AS r_lex
            FROM bmdoc
        ) WHERE r_lex <= 50
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    sims AS (
        SELECT vec_id,
               list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS sim
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id <> 0)
        CROSS JOIN qv
    ),
    sem AS (
        SELECT vec_id AS doc_id, r_sem FROM (
            SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r_sem
            FROM sims
        ) WHERE r_sem <= 50
    )
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           CAST(lex.r_lex AS BIGINT) AS bm25_rank,
           CAST(sem.r_sem AS BIGINT) AS cos_rank,
           CAST(COALESCE(1000000 // (60 + lex.r_lex), 0)
                + COALESCE(1000000 // (60 + sem.r_sem), 0) AS BIGINT) AS rrf_micros
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf_micros DESC, doc_id LIMIT 20
    """


@register(
    "search_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(),
    doc="HYBRID retrieval via Reciprocal Rank Fusion (Cormack et al. "
    "SIGIR'09, k=60): fuse the BM25 lexical top-50 over documents "
    "with the exact-cosine semantic top-50 over the aligned "
    "embeddings table (doc_id == vec_id domains) as rrf = sum over "
    "sources of 1e6 DIV (60 + rank) — rank fusion works on RANKS, so "
    "the fused score is pure integer arithmetic and bit-replayable "
    "even though one leg is float cosine (ordering is all that "
    "crosses the boundary; tie-broken by id). This is the retrieval "
    "architecture every modern RAG/search stack runs — lexical "
    "recall + semantic recall, fused without score calibration — "
    "composed entirely from this repo's existing legs (shared "
    "bm25_fold; the similarity_topk cosine). Plan at scale: each leg "
    "is selectivity-bound (term-filtered postings / brute-force scan "
    "that the served IVF and term-bucket indexes both replace "
    "drop-in), the rank windows run over <= 50 post-aggregate rows, "
    "and the fusion is a 50x50 full outer join on id.",
    tags=("pipeline", "text", "search", "similarity"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bo_sql_spark.operators.search import bm25_topk

    t = _t(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    lex = bm25_topk(docs, list(_SEARCH_TERMS), k=50)
    wl = Window.orderBy(F.col("bm25_micros").desc(), "doc_id")
    lex_r = lex.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("bm25_rank")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(50)
        # no-op aggregate on the unique key: marks the 50-row bound for
        # the plan-lint window whitelist (post-aggregation global
        # windows are bounded by construction)
        .groupBy("vec_id")
        .agg(F.max("sim").alias("sim"))
    )
    ws = Window.orderBy(F.col("sim").desc(), "vec_id")
    sem_r = sem.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(ws).cast("long").alias("cos_rank"),
    )
    fused = lex_r.join(sem_r, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(F.expr("1000000L DIV (60 + bm25_rank)"), F.lit(0))
            + F.coalesce(F.expr("1000000L DIV (60 + cos_rank)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micros"),
    )
    return fused.orderBy(F.col("rrf_micros").desc(), "doc_id").limit(20)


def _hybrid_rrf_served_oracle() -> str:
    return f"""
    WITH {_bm25_ctes(_bm25_log_idf_sql())},
    lex AS (
        SELECT doc_id, r_lex FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25_micros DESC, doc_id) AS r_lex
            FROM bmdoc
        ) WHERE r_lex <= 50
    ),
    cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), pruned AS (
        SELECT a.vec_id,
               list_dot_product(e.v, q.v)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS sim
        FROM assigned a
        JOIN vecs e USING (vec_id)
        CROSS JOIN (SELECT v FROM vecs WHERE vec_id = 0) q
        WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 0)
          AND a.vec_id <> 0
        ORDER BY sim DESC, a.vec_id LIMIT 50
    ),
    sem AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY ROUND(sim, 6) DESC, vec_id) AS r_sem
        FROM pruned
    )
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           CAST(lex.r_lex AS BIGINT) AS bm25_rank,
           CAST(sem.r_sem AS BIGINT) AS cos_rank,
           CAST(COALESCE(1000000 // (60 + lex.r_lex), 0)
                + COALESCE(1000000 // (60 + sem.r_sem), 0) AS BIGINT) AS rrf_micros
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf_micros DESC, doc_id LIMIT 20
    """


@register(
    "search_hybrid_rrf_served",
    oracle=_hybrid_rrf_served_oracle(),
    doc="SERVED hybrid retrieval — the 100 TB form of "
    "search_hybrid_rrf, BOTH legs answered from materialized "
    "partition-pruned indexes: lexical = bm25_served off the "
    "term-bucket postings store (bit-identical to the one-shot fold, "
    "so the oracle's lexical leg is unchanged), semantic = "
    "ivf_topk_served off the cell-partitioned assignment (the probed "
    "cell's directory only — the oracle replays the SAME cell "
    "restriction, so the approximation is graded, not hidden; "
    "recall-vs-probes economics in SCALE.md's ANN ledger). Fusion is "
    "the identical integer RRF fold. A query pays O(query-term "
    "buckets) + O(probed cells) of the stores and never touches "
    "corpus text or the full vector set — the drop-in-index claim "
    "the one-shot entry's doc makes, demonstrated end to end.",
    tags=("pipeline", "text", "search", "similarity"),
)
def search_hybrid_rrf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window

    from bo_sql_spark.operators.search import (
        bm25_served,
        materialize_inverted_index,
    )

    t = _t(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    ipath = tempfile.mkdtemp(prefix="bosql_hyb_idx_") + "/index"
    materialize_inverted_index(docs, ipath)
    lex = bm25_served(spark, ipath, list(_SEARCH_TERMS), k=50)
    wl = Window.orderBy(F.col("bm25_micros").desc(), "doc_id")
    lex_r = lex.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("bm25_rank")
    )
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    apath = tempfile.mkdtemp(prefix="bosql_hyb_ivf_") + "/assignment"
    S.materialize_ivf_assignment(emb, cents, apath)
    assigned = spark.read.parquet(apath)
    qrow = assigned.filter(F.col("vec_id") == 0).first()
    sem = (
        S.ivf_topk_served(
            spark,
            apath,
            [float(x) for x in qrow["embedding"]],
            query_cells=[qrow["cell"]],
            k=50,
            exclude_id=0,
        )
        # no-op aggregate on the unique key: bounded-window lint marker
        .groupBy("vec_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    ws = Window.orderBy(F.col("cos_sim").desc(), "vec_id")
    sem_r = sem.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(ws).cast("long").alias("cos_rank"),
    )
    fused = lex_r.join(sem_r, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(F.expr("1000000L DIV (60 + bm25_rank)"), F.lit(0))
            + F.coalesce(F.expr("1000000L DIV (60 + cos_rank)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf_micros"),
    )
    return fused.orderBy(F.col("rrf_micros").desc(), "doc_id").limit(20)


@register(
    "stream_search_index_ingest",
    oracle=_SERVED_CONJ_ORACLE,
    doc="STREAMING index maintenance (foreachBatch): documents arrive "
    "as a file stream and each microbatch APPENDS its postings to the "
    "term-bucket-partitioned store — postings are per-doc-local "
    "(tokenize + count within the doc), so the drained store is "
    "byte-identical to a batch build under ANY batching, and serving "
    "(search_served, partition-pruned) equals text_search_served's "
    "oracle verbatim. The freshness story the IVF/minhash incremental "
    "ingests tell, for text search: new corpus batches become "
    "searchable at ingest cost O(batch), no index rebuild; per-term "
    "stats (df) and corpus stats (n_docs, sum_dl) stay exact at serve "
    "time because df comes from the postings themselves and the "
    "stats counts are sum-mergeable.",
    tags=("pipeline", "text", "search", "streaming"),
)
def stream_search_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import search_served

    store = _ingest_postings_stream(spark, sf_dir, n_buckets=64)
    return search_served(spark, store, list(_SEARCH_TERMS), n_term_buckets=64)


@register(
    "stream_bm25_served_appended",
    oracle=_BM25_ORACLE,
    doc="RANKED retrieval served from a STREAMING-MAINTAINED index — "
    "the upgrade append_postings bought (r12): the microbatch ingest "
    "now sum-merges the 1-row (n_docs, sum_dl) stats table on every "
    "append (per-doc-local facts, so the drained store's stats equal "
    "a batch build's under ANY batching), which makes bm25_served's "
    "fallback path TOTAL on streaming stores: per-term df from the "
    "pruned postings (exact — pruning keeps every posting of the "
    "query terms), corpus stats from the maintained table, scores "
    "bit-identical to the one-shot bm25_topk (shared fold). Runs "
    "against text_bm25_topdocs' oracle VERBATIM — ranked "
    "serve-equals-batch, now across the streaming maintenance path "
    "too (the conjunctive twin is stream_search_index_ingest). The "
    "precomputed-idf table is deliberately absent here: idf is a "
    "global ratio, not mergeable, so appends invalidate it and the "
    "periodic materialize_inverted_index rebuild restores the "
    "amortized path.",
    tags=("pipeline", "text", "search", "streaming"),
)
def stream_bm25_served_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import bm25_served

    store = _ingest_postings_stream(spark, sf_dir, n_buckets=64)
    return bm25_served(spark, store, list(_SEARCH_TERMS), k=20, n_term_buckets=64)


@register(
    "stream_search_index_compacted",
    oracle=_SERVED_CONJ_ORACLE,
    doc="Postings-store COMPACTION closes the streaming-ingest loop "
    "(operators/search.py:compact_postings_store -> sinks.py:"
    "compact_table): ingest the corpus through the microbatch "
    "appender, compact the term-bucket store (per-tb-partition "
    "rewrite — partition dirs preserved so serving's pruning keeps "
    "working, per-partition bin keys so no bucket funnels into one "
    "task), then SERVE FROM THE COMPACTED STORE against the same "
    "oracle as serve-before-compact (stream_search_index_ingest) — "
    "the equivalence proof that maintenance never changes answers. "
    "The query also asserts files_after <= files_before inline (a "
    "compaction that inflates the store is a bug, not a trade). At "
    "100 TB this is the difference between a served query paying "
    "O(history) listing calls and O(data/target) — the lakehouse "
    "OPTIMIZE loop, for text search.",
    tags=("pipeline", "text", "search", "streaming", "store"),
)
def stream_search_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.search import (
        compact_postings_store,
        search_served,
    )

    store = _ingest_postings_stream(spark, sf_dir, n_buckets=64)
    before, after = compact_postings_store(spark, store, target_rows_per_file=1 << 20)
    if after > before:
        raise RuntimeError(
            f"postings compaction inflated the store: {before} -> {after} files"
        )
    return search_served(spark, store, list(_SEARCH_TERMS), n_term_buckets=64)


@register(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Fact-to-filtered-fact join under RUNTIME BLOOM-FILTER pruning "
    "(SPARK-32268, InjectRuntimeFilter): lineitem joined to the "
    "~0.7%-selective urgent-1995Q1 orders slice with broadcast "
    "DISABLED — the both-sides-too-big regime where the only built-in "
    "defense against shuffling 99% dead fact rows is the Bloom filter "
    "Spark builds from the selective side at runtime and pushes into "
    "the fact scan (plan-pinned: might_contain on the lineitem side, "
    "tests/test_plans.py). Confs are applied per-QUERY via "
    "plans.pin_plan_with_confs — the filter is ON by default in "
    "Spark 3.4+; only its 10GB application-side scan floor is lowered "
    "because sf fixtures are MBs (a 100 TB fact table clears the "
    "default by itself), plus the broadcast disable that models the "
    "regime. Measured at sf0.1: 0.9% of the fact shuffle survives "
    "(SCALE.md, tools_bloom_join.py). Integer-cents revenue keeps the "
    "oracle hash-exact.",
    tags=("pipeline", "join", "bloom"),
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.plans import pin_plan_with_confs

    t = _t(spark, sf_dir)

    def build() -> DataFrame:
        li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
        sel = (
            t["orders"]
            .filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderdate") >= F.lit("1995-01-01"))
                & (F.col("o_orderdate") < F.lit("1995-04-01"))
            )
            .select("o_orderkey", "o_orderpriority")
        )
        return (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
                F.sum(
                    F.expr(
                        "CAST(FLOOR(l_extendedprice * (1.0 - l_discount)"
                        " * 100 + 0.5) AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("rev_cents"),
            )
            .orderBy("o_orderpriority")
        )

    return pin_plan_with_confs(
        spark,
        {
            # the 10GB default exists for exactly the 100 TB case; the
            # fixture is MBs, so lower ONLY for this query's planning
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "100KB",
            # model the both-sides-big regime: no broadcast escape hatch
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
        build,
    )


# ----------------------------------------------- corpus quality filters
# Gopher/C4-family rules (operators/corpus_filters.py). No reference
# counterpart — beyond-reference training-data surface (SURVEY.md §2.3).

_TOKS_SQL = "string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')"
_NORM_SQL = "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"


def _gopher_sql(src: str, prefix: str = "", rules: dict | None = None) -> str:
    """CTE chain replaying gopher_keep over ``src``, ending in
    ``{prefix}r (doc_id, n_words, ..., drop_reasons)`` — shared by
    text_gopher_filter's oracle and the e2e-v2 pipeline oracle so the
    rule SQL can never drift between them. ``rules`` overrides
    thresholds exactly like gopher_keep's parameter."""
    r_ = dict(CF.GOPHER_RULES, **(rules or {}))
    p = prefix
    return f"""{p}n AS (
        SELECT doc_id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks
        FROM {src}
    ), {p}g AS (
        SELECT doc_id, norm, toks,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE []::VARCHAR[] END AS bg,
               length(replace(norm, ' ', '')) AS chars
        FROM {p}n
    ), {p}s AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) > 0
                    THEN ROUND(chars::DOUBLE / len(toks), 6) ELSE 0.0 END AS mean_word_len,
               CASE WHEN len(toks) > 0
                    THEN ROUND((length(norm) - length(regexp_replace(norm, '[#…]', '', 'g')))::DOUBLE
                               / len(toks), 6) ELSE 0.0 END AS symbol_word_ratio,
               CAST(len(list_filter(list_distinct(toks),
                    x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT)
                    AS stopword_hits,
               CASE WHEN len(bg) > 0
                    THEN ROUND(1 - len(list_distinct(bg))::DOUBLE / len(bg), 6)
                    ELSE 0.0 END AS dup_bigram_frac
        FROM {p}g
    ), {p}r AS (
        SELECT *,
               -- COALESCE guards DuckDB's array_to_string([]) = NULL
               -- (a doc passing every rule must read '', like Spark's
               -- concat_ws) — latent until a corpus/rule combination
               -- actually passed a doc (found by the e2e-v2 oracle)
               COALESCE(array_to_string(list_filter([
                   CASE WHEN NOT (n_words >= {r_["min_words"]} AND n_words <= {r_["max_words"]}) THEN 'word_count' END,
                   CASE WHEN NOT (mean_word_len >= {r_["min_mean_word_len"]} AND mean_word_len <= {r_["max_mean_word_len"]}) THEN 'mean_word_len' END,
                   CASE WHEN NOT (symbol_word_ratio <= {r_["max_symbol_word_ratio"]}) THEN 'symbol_ratio' END,
                   CASE WHEN NOT (stopword_hits >= {r_["min_stopword_hits"]}) THEN 'stopwords' END,
                   CASE WHEN NOT (dup_bigram_frac <= {r_["max_dup_bigram_frac"]}) THEN 'repetition' END
               ], x -> x IS NOT NULL), ','), '') AS drop_reasons
        FROM {p}s
    )"""


@register(
    "text_gopher_filter",
    oracle=f"""
    WITH {_gopher_sql("documents")}
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, stopword_hits,
           dup_bigram_frac, drop_reasons = '' AS keep, drop_reasons
    FROM r
    """,
    doc="Gopher-style rule filter (word count, mean word length, "
    "symbol ratio, stopword presence, duplicate-bigram repetition) "
    "with per-doc keep/drop + reasons. Pure narrow map — zero shuffle, "
    "zero Python: the whole rule set runs inside codegen during the "
    "scan, pruning the corpus before anything downstream shuffles.",
    tags=("pipeline", "text", "filter"),
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return CF.gopher_keep(t["documents"]).select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "stopword_hits", "dup_bigram_frac", "keep", "drop_reasons",
    )


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, {_NORM_SQL} AS norm, {_TOKS_SQL} AS toks
        FROM documents
    ), sig AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) >= 2 THEN
                   ROUND(1 - len(list_distinct(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])))::DOUBLE
                         / (len(toks) - 1), 6)
                   ELSE 0.0 END AS dup_bigram_frac,
               CASE WHEN len(toks) >= 3 THEN
                   ROUND(1 - len(list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))::DOUBLE
                         / (len(toks) - 2), 6)
                   ELSE 0.0 END AS dup_trigram_frac,
               length(replace(norm, ' ', '')) AS chars
        FROM n
    ), t AS (
        SELECT doc_id, unnest(toks) AS tok FROM n
    ), c AS (
        SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY doc_id, tok
    ), top AS (
        SELECT doc_id, tok AS top_word, cnt AS top_word_count
        FROM (SELECT doc_id, tok, cnt,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY cnt DESC, tok DESC) AS rn
              FROM c)
        WHERE rn = 1
    )
    SELECT s.doc_id, s.n_words, s.dup_bigram_frac, s.dup_trigram_frac,
           top.top_word,
           CAST(top.top_word_count AS BIGINT) AS top_word_count,
           CASE WHEN s.chars > 0
                THEN ROUND((top.top_word_count * length(top.top_word))::DOUBLE
                           / s.chars, 6)
                ELSE NULL END AS top_word_char_frac
    FROM sig s JOIN top ON s.doc_id = top.doc_id
    """,
    doc="Per-document repetition profile: duplicate bigram/trigram "
    "occurrence fractions (array expressions, no shuffle) + top-word "
    "dominance (explode -> map-side-combined (doc, token) counts -> "
    "per-doc max-struct; shuffle volume is distinct (doc, token) "
    "pairs, not tokens). Tie-break: max count, then max token.",
    tags=("pipeline", "text"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return CF.repetition_signals(t["documents"]).select(
        "doc_id", "n_words", "dup_bigram_frac", "dup_trigram_frac",
        "top_word", "top_word_count", "top_word_char_frac",
    )


@register(
    "text_chunk_documents",
    oracle="""
    SELECT doc_id,
           CAST((u.pos - 1) // 120 AS BIGINT)               AS chunk_idx,
           CAST(u.pos AS BIGINT)                            AS chunk_start,
           substr(text, u.pos, 160)                         AS chunk_text,
           CAST(length(substr(text, u.pos, 160)) AS BIGINT) AS chunk_len
    FROM documents, UNNEST(range(1, length(text) + 1, 120)) AS u(pos)
    """,
    doc="Overlapping fixed-size character chunks (size 160, stride "
    "120): the RAG / context-window packing primitive. sequence + "
    "posexplode + substring, all codegen; fan-out ~len/stride rows "
    "per doc is inherent to chunking. NULL/empty docs yield no chunks.",
    tags=("pipeline", "text", "chunk"),
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return CF.chunk_documents(t["documents"], size=160, stride=120)


@register(
    "jsonl_roundtrip_docs",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS BIGINT) AS text_len,
           CAST(strftime(DATE '2024-01-01' + CAST(doc_id % 365 AS INTEGER),
                         '%Y%m%d') AS BIGINT) AS day
    FROM documents
    """,
    doc="JSONL ingest contract (sources/jsonl_source.py): the corpus "
    "is written to newline-delimited JSON — the format training data "
    "actually arrives in — and loaded back with schema inference plus "
    "the ISO-date post-pass (one aggregate job types every candidate "
    "column at once). The result must equal reading the parquet "
    "directly: ids/counts re-typed as longs, text byte-identical "
    "through JSON escaping, and the derived yyyy-MM-dd string column "
    "restored to a real DATE. Beyond-reference surface: the reference "
    "loads CSV only (src/storage/csv_loader.cpp).",
    tags=("pipeline", "source"),
)
def jsonl_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from bo_sql_spark.sources import load_jsonl, write_jsonl

    t = _t(spark, sf_dir)
    staged = t["documents"].withColumn(
        "day",
        F.date_format(
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("doc_id") % 365).cast("int"),
            ),
            "yyyy-MM-dd",
        ),
    )
    path = tempfile.mkdtemp(prefix="bosql_jsonl_") + "/docs"
    write_jsonl(staged, path)
    loaded = load_jsonl(spark, path)
    # The contract under test: the written yyyy-MM-dd STRING came back a
    # real DATE. (Graded output re-encodes it as yyyymmdd BIGINT — raw
    # DATE columns fetch as pandas object on the Spark side vs
    # datetime64 from DuckDB, the same dtype-kind trap as HUGEINT.)
    from pyspark.sql.types import DateType

    assert isinstance(loaded.schema["day"].dataType, DateType), loaded.schema
    return loaded.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").cast("long").alias("text_len"),
        F.date_format("day", "yyyyMMdd").cast("long").alias("day"),
    )


# ------------------------------------------- mergeable quantile sketch
@register(
    "quantile_sketch_monthly",
    # The oracle replicates the ALGORITHM, not just the answer: every
    # step (ntile build, integer-midpoint re-bucket merge, interpolated
    # evaluation) is deterministic integer/exact-double arithmetic over
    # a total order, so two engines produce bit-identical centroids and
    # estimates — a sketch you can hash-compare, unlike
    # percentile_approx (rows-only by necessity).
    oracle="""
    WITH base AS (
        SELECT CAST(strftime(l_shipdate, '%Y%m') AS BIGINT)  AS month,
               CAST(strftime(l_shipdate, '%Y%m%d') AS BIGINT) AS ship_day,
               l_orderkey % 4                                 AS shard,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem
    ), tiled AS (
        SELECT month, ship_day, shard, cents,
               ntile(32) OVER (PARTITION BY month, ship_day, shard
                               ORDER BY cents, l_orderkey, l_linenumber) AS b
        FROM base
    ), daily AS (
        SELECT month, ship_day, shard, b,
               SUM(cents) AS s, COUNT(*) AS w
        FROM tiled GROUP BY 1, 2, 3, 4
    ), ordered AS (
        SELECT month, s, w,
               SUM(w) OVER (PARTITION BY month
                            ORDER BY CAST(s AS DOUBLE)/w, ship_day, shard, b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
               SUM(w) OVER (PARTITION BY month) AS tw
        FROM daily
    ), merged AS (
        SELECT month, ((2*cumw - w) * 32) // (2*tw) AS b,
               SUM(s) AS s, SUM(w) AS w
        FROM ordered GROUP BY 1, 2
    ), m2 AS (
        SELECT month, b, s, w,
               SUM(w) OVER (PARTITION BY month ORDER BY CAST(s AS DOUBLE)/w, b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
               SUM(w) OVER (PARTITION BY month) AS tw,
               ROW_NUMBER() OVER (PARTITION BY month ORDER BY CAST(s AS DOUBLE)/w, b) AS rn
        FROM merged
    ), c AS (
        SELECT month, CAST(s AS DOUBLE)/w AS mean, 2*cumw - w AS mid2, tw, rn,
               LEAD(CAST(s AS DOUBLE)/w) OVER (PARTITION BY month ORDER BY CAST(s AS DOUBLE)/w, b) AS next_mean,
               LEAD(2*cumw - w)          OVER (PARTITION BY month ORDER BY CAST(s AS DOUBLE)/w, b) AS next_mid2
        FROM m2
    )
    SELECT month, q,
           -- floor(x*1e4+0.5)/1e4, NOT ROUND: engines disagree on
           -- ROUND(double) at the half boundary (decimal-expansion
           -- HALF_UP vs float rounding); floor is exact on the
           -- bit-identical doubles both sides compute.
           floor(CASE
             WHEN (rn = 1 AND q * 2 * tw < mid2) OR next_mid2 IS NULL THEN mean
             ELSE mean + (q * 2 * tw - mid2) / (next_mid2 - mid2) * (next_mean - mean)
           END / 100 * 10000 + 0.5) / 10000 AS est_price
    FROM c CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) AS qv(q)
    WHERE (rn = 1 AND q * 2 * tw < mid2)
       OR (mid2 <= q * 2 * tw AND (next_mid2 IS NULL OR q * 2 * tw < next_mid2))
    """,
    doc="Mergeable quantile sketch end-to-end: per-(day, shard) "
    "equi-depth sketches (32 centroids) over lineitem price cents, "
    "merged per month with integer midpoint-rank arithmetic, then "
    "p50/p95 by t-digest-style interpolation. The 100 TB percentile "
    "path: one partitioned sort builds the sketches, every later step "
    "runs on O(days x shards x 32) tiny rows — months, quarters, years "
    "roll up by re-merging centroids, never rescanning. Fully "
    "deterministic (integral sums, total-order ntile), so this is an "
    "oracle-HASHED approximate sketch; accuracy vs exact percentiles "
    "is asserted in tests/test_operators.py.",
    tags=("pipeline", "sketch", "aggregate"),
)
def quantile_sketch_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import quantile_sketch as Q

    t = _t(spark, sf_dir)
    base = t["lineitem"].select(
        F.date_format("l_shipdate", "yyyyMM").cast("long").alias("month"),
        F.date_format("l_shipdate", "yyyyMMdd").cast("long").alias("ship_day"),
        (F.col("l_orderkey") % 4).alias("shard"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    daily = Q.build_sketch(
        base,
        "cents",
        tie_cols=["l_orderkey", "l_linenumber"],
        group_cols=["month", "ship_day", "shard"],
        buckets=32,
    )
    monthly = Q.merge_sketches(
        daily, ["month"], tie_cols=["ship_day", "shard", "_b"], buckets=32
    )
    return Q.sketch_quantiles(monthly, ["month"], [0.5, 0.95]).select(
        "month",
        "q",
        # floor-based round: mirrors the oracle bit-for-bit (see oracle
        # comment) — F.round would HALF_UP the decimal expansion and
        # can flip the 4th decimal vs DuckDB on half-boundary doubles.
        (F.floor(F.col("est") / 100 * 10000 + 0.5) / 10000).alias("est_price"),
    )


@register(
    "multimodal_decode_png",
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 64 + 1 AS BIGINT) AS width,
           CAST(doc_id % 48 + 1 AS BIGINT)  AS height,
           CAST((n_chars % 64 + 1) * (doc_id % 48 + 1) AS BIGINT) AS n_pixels,
           CAST(list_sum(list_transform(
                range(0, (n_chars % 64 + 1) * (doc_id % 48 + 1)),
                i -> (doc_id + i) % 256)) AS BIGINT) AS pixel_sum,
           CAST(list_min(list_transform(
                range(0, (n_chars % 64 + 1) * (doc_id % 48 + 1)),
                i -> (doc_id + i) % 256)) AS BIGINT) AS pixel_min,
           CAST(list_max(list_transform(
                range(0, (n_chars % 64 + 1) * (doc_id % 48 + 1)),
                i -> (doc_id + i) % 256)) AS BIGINT) AS pixel_max
    FROM documents
    """,
    doc="REAL image decode, no stub: each doc gets a stdlib-encoded "
    "8-bit grayscale PNG (zlib DEFLATE, scanline filter type cycling "
    "through all five PNG filters) with closed-form pixel content "
    "pixel[i]=(doc_id+i)%256; decode_png_stats walks chunks, checks "
    "CRCs, inflates, unfilters, and reports per-image pixel stats. "
    "The oracle recomputes width/height/sum/min/max from the pixel "
    "formula alone, so encoder and decoder must JOINTLY preserve "
    "every pixel byte for the value hash to match. Both encode and "
    "decode are Arrow-batched mapInPandas — the partition-parallel "
    "codec-leaf slot a Pillow/ffmpeg codec drops into.",
    tags=("pipeline", "multimodal"),
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_png_blob_df(t["documents"])
    return M.decode_png_stats(blobs)


@register(
    "multimodal_decode_wav",
    oracle="""
    SELECT doc_id,
           CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
           CAST(n_chars % 256 + 16 AS BIGINT)         AS n_samples,
           CAST((n_chars % 256 + 16) * 1000000 // (8000 + (doc_id % 4) * 4000) AS BIGINT)
                                                      AS duration_us,
           CAST(list_sum(list_transform(
                range(0, n_chars % 256 + 16),
                i -> (doc_id * 31 + i * 17) % 65536 - 32768)) AS BIGINT) AS amp_sum,
           CAST(list_min(list_transform(
                range(0, n_chars % 256 + 16),
                i -> (doc_id * 31 + i * 17) % 65536 - 32768)) AS BIGINT) AS amp_min,
           CAST(list_max(list_transform(
                range(0, n_chars % 256 + 16),
                i -> (doc_id * 31 + i * 17) % 65536 - 32768)) AS BIGINT) AS amp_max
    FROM documents
    """,
    doc="REAL audio decode, no stub: each doc gets a stdlib-encoded "
    "16-bit mono PCM WAV (RIFF container, fmt validation, word-aligned "
    "chunk walk) with closed-form samples sample[i]=(doc_id*31+i*17)"
    "%65536-32768; decode_wav_stats parses the container and reports "
    "rate/duration/amplitude stats. The oracle recomputes everything "
    "from the sample formula alone, so encoder and decoder must "
    "jointly preserve every 16-bit sample. Arrow-batched mapInPandas "
    "on both sides — the slot a torchaudio/ffmpeg codec drops into.",
    tags=("pipeline", "multimodal"),
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_wav_blob_df(t["documents"])
    return M.decode_wav_stats(blobs)


@register(
    "multimodal_image_dhash",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               n_chars % 64 + 1 AS w,
               doc_id % 48 + 1  AS h
        FROM documents
    ), rc AS (
        SELECT doc_id, w, h, r.r, c.c
        FROM g,
             (SELECT unnest(range(8)) AS r) r,
             (SELECT unnest(range(7)) AS c) c
    ), bits AS (
        SELECT doc_id,
               CASE WHEN (doc_id + ((r * h) // 8) * w + (c * w) // 8) % 256
                       < (doc_id + ((r * h) // 8) * w + ((c + 1) * w) // 8) % 256
                    THEN CAST(1 AS BIGINT) << (r * 7 + c)
                    ELSE 0 END AS bit
        FROM rc
    )
    SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS dhash
    FROM bits GROUP BY doc_id
    """,
    doc="Image perceptual hash (operators/multimodal.py:decode_png_dhash "
    "+ dhash_bits): decode every doc's REAL grayscale PNG and compute "
    "the classic 56-bit difference hash — nearest-neighbor 8x8 grid, "
    "bit = sign of the horizontal gradient — the IMAGE near-duplicate "
    "signature (re-encoded/rescaled copies collide within a few bits; "
    "band like SimHash for corpus-scale candidate pairs — planted "
    "near-copy semantics pinned in tests/test_operators.py since the "
    "fixture's synthetic gradients would make pair counts "
    "degenerate). Integer-exact floor-grid sampling, so the oracle "
    "replays every bit from the closed-form pixels; the decode is the "
    "same hash-gated stdlib codec as multimodal_decode_png.",
    tags=("pipeline", "multimodal", "dedup"),
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_png_blob_df(t["documents"])
    return M.decode_png_dhash(blobs)


def _image_neardup_oracle_sql() -> str:
    """Full DuckDB replay of the image near-dup pipeline WITHOUT any
    image codec: the fixture pixels are a counter-based
    multiply-xorshift (multimodal.py:_noise_pixels) and the dHash
    samples a floor-mapped 8x8 grid — both closed-form integers — so
    the oracle regenerates exactly the 64 SAMPLED pixels per image
    (never the full bitmap) and folds them into the 56-bit dHash.
    Returns the CTE chain ending at ``dh (img_id, dhash)`` and
    ``dbands`` — shared by the pairs query (banding self-join +
    bit_count verify) and the hash-values query. Because
    the Spark side hashes pixels that went through a REAL PNG
    encode/decode roundtrip, a hash match here jointly gates the
    codec's losslessness on every sampled byte. uint64 wrap-around:
    xor/shift run on UBIGINT; the two multiplies run in HUGEINT via
    32-bit split (hi*M*2^32 + lo*M, both < 2^97) mod 2^64 — DuckDB
    UBIGINT multiplication raises on overflow instead of wrapping."""
    m1, m2 = 2654435761, 2246822519
    two64 = 1 << 64

    def mulmod(x: str, m: int) -> str:
        return (
            f"(({x} // 4294967296) * {m} % {two64} * 4294967296"
            f" + ({x} % 4294967296) * {m}) % {two64}"
        )

    return f"""imdocs AS (
        SELECT doc_id AS d FROM documents WHERE doc_id < 1500
    ), imgs AS (
        SELECT d, CAST(d AS BIGINT) AS img_id, 0 AS kind FROM imdocs
        UNION ALL
        SELECT d, d + {M.NEARDUP_BRIGHT_OFF}, 1 FROM imdocs WHERE d % 7 = 0
        UNION ALL
        SELECT d, d + {M.NEARDUP_SCALE_OFF}, 2 FROM imdocs WHERE d % 7 = 0
    ), grid AS (
        SELECT img_id, d, kind, 32 + d % 17 AS w, 24 + d % 13 AS h, gr.r, gc.c
        FROM imgs,
             (SELECT unnest(range(0, 8)) AS r) gr,
             (SELECT unnest(range(0, 8)) AS c) gc
    ), pos AS (
        -- sampled pixel index in the BASE w x h bitmap: the bright
        -- variant shares the base geometry; the 2x nearest-neighbor
        -- upscale maps its floor-grid samples back to base pixels
        SELECT img_id, d, kind, r, c,
               CASE WHEN kind <= 1
                    THEN ((r * h) // 8) * w + (c * w) // 8
                    ELSE (((r * 2 * h) // 8) // 2) * w
                         + (((c * 2 * w) // 8) // 2)
               END AS i
        FROM grid
    ), mx1 AS (
        SELECT img_id, kind, r, c,
               (CAST(i AS HUGEINT) + (d % 4294967296)) % {two64} AS x0
        FROM pos
    ), mx2 AS (
        SELECT img_id, kind, r, c, {mulmod('x0', m1)} AS x1 FROM mx1
    ), mx3 AS (
        SELECT img_id, kind, r, c,
               CAST(xor(CAST(x1 AS UBIGINT), CAST(x1 // 32768 AS UBIGINT)) AS HUGEINT) AS x2
        FROM mx2
    ), mx4 AS (
        SELECT img_id, kind, r, c, {mulmod('x2', m2)} AS x3 FROM mx3
    ), pxs AS (
        SELECT img_id, r, c,
               CAST((CAST(xor(CAST(x3 AS UBIGINT), CAST(x3 // 8192 AS UBIGINT)) AS HUGEINT)
                     // 256) % 201 AS BIGINT)
               + CASE WHEN kind = 1 THEN 30 ELSE 0 END AS px
        FROM mx4
    ), dh AS (
        SELECT img_id,
               CAST(SUM(CASE WHEN c < 7 AND px < nxt
                             THEN CAST(1 AS BIGINT) << (r * 7 + c)
                             ELSE 0 END) AS BIGINT) AS dhash
        FROM (SELECT img_id, r, c, px,
                     LEAD(px) OVER (PARTITION BY img_id, r ORDER BY c) AS nxt
              FROM pxs)
        GROUP BY img_id
    ), dbands AS (
        SELECT img_id, dhash, gb.band,
               (dhash >> CAST(gb.band * 14 AS BIGINT)) & 16383 AS slice
        FROM dh, (SELECT unnest(range(0, 4)) AS band) gb
    )"""


@register(
    "multimodal_image_neardup_pairs",
    oracle=f"""
    WITH {_image_neardup_oracle_sql()}
    SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM dbands a JOIN dbands b
      ON a.band = b.band AND a.slice = b.slice AND a.img_id < b.img_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    """,
    doc="IMAGE near-duplicate candidate pairs at corpus scale "
    "(operators/multimodal.py:make_png_neardup_blob_df + "
    "decode_png_dhash + dhash_near_pairs): a non-degenerate noise-"
    "image corpus (counter-xorshift pixels; the gradient fixture made "
    "every dHash collide) where each doc_id % 7 == 0 plants a "
    "brightness (+30, non-clipping) and a 2x nearest-neighbor rescale "
    "variant — both dHash-invariant by construction, so the expected "
    "output is EXACTLY the 3 pairwise pairs per planted triple at "
    "hamming 0, and nothing else (unrelated noise images sit ~28 bits "
    "apart). Pipeline: real PNG encode -> Arrow-batched decode+dHash "
    "-> 14-bit band buckets -> exact bit_count(xor) verify; the "
    "banding self-join shuffles tiny (id, hash) rows, never all "
    "pairs. ORACLE-CHECKED since r13: the pixels and the dHash's "
    "floor-grid samples are closed-form integers, so DuckDB "
    "regenerates the 64 sampled pixels per image (HUGEINT split-"
    "multiply mod 2^64 + UBIGINT xor replays the uint64 mix), folds "
    "the same 56-bit hash, and replays banding + verify — which also "
    "jointly gates the PNG codec roundtrip on every sampled byte.",
    tags=("pipeline", "multimodal", "dedup"),
)
def multimodal_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    # cap the image corpus: the graded row is about the BANDING join
    # and the planted-pair semantics, not stdlib-codec throughput (the
    # all-five-filters PNG codec is deliberately exercised per blob
    # and is the known Python-leaf cost; at sf0.1 an uncapped corpus
    # made the row codec-bound at ~9s)
    # (r14-opt) scan spreading for the Python codec stages now lives in
    # make_png_neardup_blob_df itself (parallel.spread_scan — scale-
    # adaptive, replacing the hard-coded .repartition(32) local-core
    # constant that used to sit here)
    docs = t["documents"].filter(F.col("doc_id") < 1500)
    blobs = M.make_png_neardup_blob_df(docs)
    hashes = M.decode_png_dhash(blobs)
    return M.dhash_near_pairs(hashes, max_hamming=6, bands=4).orderBy(
        "id_a", "id_b"
    )


@register(
    "multimodal_image_dhash_noise",
    oracle=f"""
    WITH {_image_neardup_oracle_sql()}
    SELECT img_id AS doc_id, dhash FROM dh
    """,
    doc="The 56-bit perceptual dHash VALUES over the NOISE near-dup "
    "fixture (base noise images + planted brightness/rescale "
    "variants), hash-gated per image: real PNG encode -> Arrow-"
    "batched stdlib decode -> floor-grid 8x8 difference hash, against "
    "the closed-form pixel replay (same CTE chain as "
    "multimodal_image_neardup_pairs' oracle, cut at the hash stage). "
    "Grades the signature function DIRECTLY — a banding-join bug and "
    "a hash bug are separable failures — and pins that every sampled "
    "byte survives the codec roundtrip for every image, not just the "
    "ones that surface in a candidate pair.",
    tags=("pipeline", "multimodal", "dedup"),
)
def multimodal_image_dhash_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    # (r14-opt) spreading moved into make_png_neardup_blob_df
    docs = t["documents"].filter(F.col("doc_id") < 1500)
    blobs = M.make_png_neardup_blob_df(docs)
    return M.decode_png_dhash(blobs)


_VAD_WIN = 8


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH s0 AS (
        SELECT doc_id, unnest(range(0, n_chars % 256 + 16)) AS i
        FROM documents
    ), s AS (
        SELECT doc_id, i,
               (doc_id * 31 + i * 17) % 65536 - 32768 AS samp
        FROM s0
    )
    SELECT doc_id,
           CAST(i // {_VAD_WIN} AS BIGINT) AS win_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ABS(samp)) AS BIGINT) AS energy,
           CAST(MAX(ABS(samp)) AS BIGINT) AS peak
    FROM s GROUP BY doc_id, i // {_VAD_WIN}
    """,
    doc="Audio energy-window segmentation (operators/multimodal.py:"
    "decode_wav_energy_windows): decode every clip's REAL PCM16 WAV "
    "and emit per-8-sample frames (win_idx, n, energy=sum|s|, "
    "peak=max|s|) — the decode -> window -> score dataflow of VAD / "
    "silence trimming / segment extraction; a model-based scorer "
    "drops into the same Arrow-batched mapInPandas slot. Integer "
    "outputs let the oracle regenerate every frame from the fixture's "
    "closed-form waveform, so the container walk, 16-bit decode, and "
    "framing are all jointly hash-gated.",
    tags=("pipeline", "multimodal"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_wav_blob_df(t["documents"])
    return M.decode_wav_energy_windows(blobs, window=_VAD_WIN)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or +1-555-'
                    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from ' || CAST(doc_id % 223 + 1 AS VARCHAR)
                    || '.0.113.' || CAST(doc_id % 256 AS VARCHAR) AS text2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text2, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text2, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text2, '{_PII_IPV4}')) AS BIGINT)  AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(text2,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IPV4>', 'g'))                             AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(text2,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IPV4>', 'g')) AS BIGINT)                  AS redacted_len
    FROM aug
    """,
    doc="PII scrubbing (operators/text.py:redact_pii): count + redact "
    "emails, phones, and IPv4s with pure JVM regex — the scan-stage "
    "shape of a corpus scrub at 100 TB (no UDF, no shuffle). The "
    "synthetic corpus contains no PII, so the query deterministically "
    "injects one of each per doc first; the oracle replays the same "
    "injection and the SAME regexes in DuckDB (RE2) and compares the "
    "md5 of the redacted text — both engines must find byte-identical "
    "spans. Patterns stay in the Java-regex/RE2 common subset.",
    tags=("pipeline", "text"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.text import redact_pii

    docs = _t(spark, sf_dir)["documents"]
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from "),
            (F.col("doc_id") % 223 + 1).cast("string"),
            F.lit(".0.113."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return redact_pii(aug).select(
        "doc_id",
        F.col("n_email").cast("long"),
        F.col("n_phone").cast("long"),
        F.col("n_ipv4").cast("long"),
        F.md5(F.col("redacted")).alias("redacted_md5"),
        F.length("redacted").cast("long").alias("redacted_len"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks WHERE term <> '' GROUP BY term
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ((SELECT n_docs FROM n) * 1000000 // df.df) AS score
        FROM tf JOIN df USING (term)
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score
    FROM ranked WHERE rn <= 3
    """,
    doc="Per-document salient terms: tf * linear-idf top-3. The idf "
    "factor is the INTEGER (n_docs * 1e6) // df — monotone in 1/df "
    "like ln(n/df) but exact BIGINT arithmetic, so ranking and hash "
    "compare can never flake on libm ln() ULP differences between "
    "engines. Plan shape at scale: explode -> two partial+final aggs "
    "(term-grain df is vocabulary-sized, broadcast back), per-doc "
    "window for top-3 (WindowGroupLimit trims below the shuffle).",
    tags=("pipeline", "text"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf", "df",
            (F.col("tf") * F.expr("(n_docs * 1000000L) DIV df"))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


_SESS_GAP_US = 600 * 1_000_000  # 10 minutes


@register(
    "events_sessionize_batch",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS tsu,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN prev IS NULL OR tsu - prev > {_SESS_GAP_US} THEN 1 ELSE 0 END AS is_new
        FROM seq
    ), numbered AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT)  AS session_idx,
           CAST(MIN(tsu) AS BIGINT)     AS session_start_us,
           CAST(MAX(tsu) AS BIGINT)     AS session_end_us,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           ROUND(SUM(value), 2)         AS sum_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
    doc="Batch sessionization (the batch twin of stream_session_windows' "
    "session_window): per user, a new session starts when the gap to "
    "the previous event exceeds 10 minutes; session_idx is the per-user "
    "running count of session starts. Gap math runs on exact integer "
    "microseconds (ts_ns DIV 1000), so both engines cut sessions on "
    "identical boundaries. Two per-user windows (lag + running sum) "
    "then one groupBy — everything partitions by user_id, the natural "
    "key at 100 TB; no global sort.",
    tags=("pipeline", "events"),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir)["events"].select(
        "user_id", "event_id", "value",
        # integer DIV: ts_ns exceeds 2^53, float division is off-by-1us
        F.expr("ts_ns DIV 1000").alias("tsu"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("tsu").over(w).isNull()
            | (F.col("tsu") - F.lag("tsu").over(w) > _SESS_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx"))
        .agg(
            F.min("tsu").cast("long").alias("session_start_us"),
            F.max("tsu").cast("long").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "similarity_pq_adc",
    oracle="""
    WITH seeds AS (
        SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 16
    ), subs AS (
        SELECT unnest(range(0, 8)) AS sub
    ), cb AS (
        SELECT sub, code, list_slice(v, sub*8 + 1, sub*8 + 8) AS c_vec
        FROM seeds CROSS JOIN subs
    ), q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), lut AS (
        SELECT sub, code,
               CAST(FLOOR((list_dot_product(qs, qs) - 2*list_dot_product(qs, c_vec)
                           + list_dot_product(c_vec, c_vec)) * 1000000 + 0.5) AS BIGINT) AS pd_micro
        FROM (SELECT sub, code, c_vec, list_slice(qv, sub*8 + 1, sub*8 + 8) AS qs
              FROM cb CROSS JOIN q)
    ), parts AS (
        SELECT e.vec_id, s.sub,
               list_slice(CAST(e.embedding AS DOUBLE[]), s.sub*8 + 1, s.sub*8 + 8) AS sv
        FROM embeddings e CROSS JOIN subs s
    ), best AS (
        SELECT p.vec_id, p.sub,
               (min({'d': list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.c_vec)
                          + list_dot_product(c.c_vec, c.c_vec), 'c': c.code})).c AS code
        FROM parts p JOIN cb c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), adc AS (
        SELECT b.vec_id, CAST(SUM(l.pd_micro) AS BIGINT) AS adc_d2_micro
        FROM best b JOIN lut l USING (sub, code)
        GROUP BY b.vec_id
    )
    SELECT vec_id, adc_d2_micro FROM adc
    ORDER BY adc_d2_micro, vec_id LIMIT 10
    """,
    doc="Product quantization end-to-end (operators/similarity.py:"
    "pq_encode/pq_adc_topk): 64-d vectors compress to 8 subspace codes "
    "(seeded codebooks; production refines them with ivf_train per "
    "subspace), then a query is answered by ADC — a broadcast (sub, "
    "code)->partial-distance LUT summed per encoded vector, never "
    "touching the original vectors. The 16-32x index compression that "
    "keeps a 100 TB ANN index resident. Partial distances are exact "
    "fixed-point micros so the BIGINT sums are order-independent; the "
    "oracle replays codebooks, encode argmin, LUT, and the ADC sum.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    m, dsub = 8, 8
    cb = S.pq_codebooks_from_seeds(emb, m=m, dsub=dsub, ks=16)
    codes = S.pq_encode(emb, cb, m=m, dsub=dsub)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return S.pq_adc_topk(codes, cb, qvec, m=m, dsub=dsub, k=10)


@register(
    "similarity_ivfpq_adc",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id,
               list_dot_product(v, v) - 2*list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), resid AS (
        SELECT a.vec_id, a.cell,
               list_transform(range(1, 65), i -> ve.v[i] - c.cv[i]) AS r
        FROM assigned a
        JOIN vecs ve USING (vec_id)
        JOIN cents c ON a.cell = c.c_id
    ), subs AS (
        SELECT unnest(range(0, 8)) AS sub
    ), cb AS (
        -- residual codebooks seed PAST the centroid ids (their own
        -- residuals are zero vectors): ids 16..31, codes 0..15
        SELECT s.sub, r.vec_id - 16 AS code, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS c_vec
        FROM resid r CROSS JOIN subs s WHERE r.vec_id >= 16 AND r.vec_id < 32
    ), best AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.c_vec)
               + list_dot_product(c.c_vec, c.c_vec), 'c': c.code})).c AS code
        FROM (SELECT r.vec_id, s.sub, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS sv
              FROM resid r CROSS JOIN subs s) p
        JOIN cb c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), q AS (
        SELECT v AS qv FROM vecs WHERE vec_id = 0
    ), probed AS (
        SELECT c_id AS cell, cv
        FROM cents CROSS JOIN q
        ORDER BY list_dot_product(qv, qv) - 2*list_dot_product(qv, cv) + list_dot_product(cv, cv), c_id
        LIMIT 2
    ), qres AS (
        SELECT p.cell, s.sub,
               list_slice(list_transform(range(1, 65), i -> q.qv[i] - p.cv[i]),
                          s.sub*8 + 1, s.sub*8 + 8) AS qs
        FROM probed p CROSS JOIN q CROSS JOIN subs s
    ), lut AS (
        SELECT qr.cell, qr.sub, c.code,
               CAST(FLOOR((list_dot_product(qr.qs, qr.qs) - 2*list_dot_product(qr.qs, c.c_vec)
                           + list_dot_product(c.c_vec, c.c_vec)) * 1000000 + 0.5) AS BIGINT) AS pd_micro
        FROM qres qr JOIN cb c ON c.sub = qr.sub
    ), cands AS (
        SELECT b.vec_id, a.cell, b.sub, b.code
        FROM best b JOIN assigned a USING (vec_id)
        WHERE a.cell IN (SELECT cell FROM probed)
    ), adc AS (
        SELECT ca.vec_id, CAST(SUM(l.pd_micro) AS BIGINT) AS adc_d2_micro
        FROM cands ca JOIN lut l USING (cell, sub, code)
        GROUP BY ca.vec_id
    )
    SELECT vec_id, adc_d2_micro FROM adc
    ORDER BY adc_d2_micro, vec_id LIMIT 10
    """,
    doc="IVF-PQ end-to-end (operators/similarity.py:ivfpq_encode/"
    "ivfpq_adc_topk) — the production ANN architecture: vectors store "
    "a coarse cell + 8 PQ codes of their RESIDUAL (v - centroid), and "
    "a query probes its 2 nearest cells with a per-cell residual ADC "
    "lookup table. Probe selection is in-engine (top-2 centroids -> "
    "broadcast joins, no driver collect); LUT partials are exact "
    "fixed-point micros. The oracle replays assignment, residuals, "
    "residual codebooks, encode argmin, probe choice, per-cell LUT, "
    "and the ADC sum. 64-d embeddings, m=8 subspaces of 8 dims.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    m, dsub = 8, 8
    encoded, cb = S.ivfpq_encode(emb, cents, m=m, dsub=dsub, ks=16)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return S.ivfpq_adc_topk(
        encoded, cb, cents, qvec, m=m, dsub=dsub, n_probe=2, k=10
    )


@register(
    "similarity_ivfpq_trained",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id,
               list_dot_product(v, v) - 2*list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), resid AS (
        SELECT a.vec_id, a.cell,
               list_transform(range(1, 65), i -> ve.v[i] - c.cv[i]) AS r
        FROM assigned a
        JOIN vecs ve USING (vec_id)
        JOIN cents c ON a.cell = c.c_id
    ), subs AS (
        SELECT unnest(range(0, 8)) AS sub
    ), dims AS (
        SELECT unnest(range(1, 9)) AS pos
    ), cb0 AS (
        SELECT s.sub, r.vec_id - 16 AS code, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS c_vec
        FROM resid r CROSS JOIN subs s WHERE r.vec_id >= 16 AND r.vec_id < 32
    ), partsr AS (
        SELECT r.vec_id, s.sub, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS sv
        FROM resid r CROSS JOIN subs s
    ), a0 AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.c_vec)
               + list_dot_product(c.c_vec, c.c_vec), 'c': c.code})).c AS code
        FROM partsr p JOIN cb0 c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), cb AS (
        SELECT sub, code,
               array_agg(CAST(FLOOR(s_micro / n + 0.5) AS BIGINT) / 1000000.0
                         ORDER BY pos) AS c_vec
        FROM (
            SELECT a.sub, a.code, d.pos,
                   SUM(CAST(FLOOR(p.sv[d.pos] * 1000000 + 0.5) AS BIGINT)) AS s_micro,
                   COUNT(*) AS n
            FROM a0 a
            JOIN partsr p ON a.vec_id = p.vec_id AND a.sub = p.sub
            CROSS JOIN dims d
            GROUP BY a.sub, a.code, d.pos
        )
        GROUP BY sub, code
    ), best AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.c_vec)
               + list_dot_product(c.c_vec, c.c_vec), 'c': c.code})).c AS code
        FROM partsr p JOIN cb c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), q AS (
        SELECT v AS qv FROM vecs WHERE vec_id = 0
    ), probed AS (
        SELECT c_id AS cell, cv
        FROM cents CROSS JOIN q
        ORDER BY list_dot_product(qv, qv) - 2*list_dot_product(qv, cv) + list_dot_product(cv, cv), c_id
        LIMIT 2
    ), qres AS (
        SELECT p.cell, s.sub,
               list_slice(list_transform(range(1, 65), i -> q.qv[i] - p.cv[i]),
                          s.sub*8 + 1, s.sub*8 + 8) AS qs
        FROM probed p CROSS JOIN q CROSS JOIN subs s
    ), lut AS (
        SELECT qr.cell, qr.sub, c.code,
               CAST(FLOOR((list_dot_product(qr.qs, qr.qs) - 2*list_dot_product(qr.qs, c.c_vec)
                           + list_dot_product(c.c_vec, c.c_vec)) * 1000000 + 0.5) AS BIGINT) AS pd_micro
        FROM qres qr JOIN cb c ON c.sub = qr.sub
    ), cands AS (
        SELECT b.vec_id, a.cell, b.sub, b.code
        FROM best b JOIN assigned a USING (vec_id)
        WHERE a.cell IN (SELECT cell FROM probed)
    ), adc AS (
        SELECT ca.vec_id, CAST(SUM(l.pd_micro) AS BIGINT) AS adc_d2_micro
        FROM cands ca JOIN lut l USING (cell, sub, code)
        GROUP BY ca.vec_id
    )
    SELECT vec_id, adc_d2_micro FROM adc
    ORDER BY adc_d2_micro, vec_id LIMIT 10
    """,
    doc="IVF-PQ with TRAINED residual codebooks — the full production "
    "recipe: coarse assignment, residuals, seed residual codebooks "
    "refined by one in-engine Lloyd step (pq_train_step over the "
    "residual column: fixed-point means, deterministic argmin), "
    "re-encode, then probe + per-cell residual ADC. Closes the "
    "training loop for the IVF-PQ family the way "
    "similarity_pq_trained/_pq_trained256 do for flat PQ; the oracle "
    "replays every stage including the residual-space Lloyd step. "
    "Same broadcast-only plan shape as similarity_ivfpq_adc.",
    tags=("pipeline", "similarity", "training", "approx"),
)
def similarity_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    m, dsub = 8, 8
    encoded, cb = S.ivfpq_encode(
        emb, cents, m=m, dsub=dsub, ks=16, train_steps=1
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return S.ivfpq_adc_topk(
        encoded, cb, cents, qvec, m=m, dsub=dsub, n_probe=2, k=10
    )


@register(
    "similarity_ivfpq_served",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id,
               list_dot_product(v, v) - 2*list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), resid AS (
        SELECT a.vec_id, a.cell,
               list_transform(range(1, 65), i -> ve.v[i] - c.cv[i]) AS r
        FROM assigned a
        JOIN vecs ve USING (vec_id)
        JOIN cents c ON a.cell = c.c_id
    ), subs AS (
        SELECT unnest(range(0, 8)) AS sub
    ), cb AS (
        SELECT s.sub, r.vec_id - 16 AS code, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS c_vec
        FROM resid r CROSS JOIN subs s WHERE r.vec_id >= 16 AND r.vec_id < 32
    ), best AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.c_vec)
               + list_dot_product(c.c_vec, c.c_vec), 'c': c.code})).c AS code
        FROM (SELECT r.vec_id, s.sub, list_slice(r.r, s.sub*8 + 1, s.sub*8 + 8) AS sv
              FROM resid r CROSS JOIN subs s) p
        JOIN cb c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), queries AS (
        SELECT CAST(vec_id AS BIGINT) AS qid, v AS qv FROM vecs WHERE vec_id IN (0, 1)
    ), probed AS (
        SELECT qid, cell, cv FROM (
            SELECT q.qid, c.c_id AS cell, c.cv,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                       list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, c.cv)
                       + list_dot_product(c.cv, c.cv), c.c_id) AS rn
            FROM queries q CROSS JOIN cents c
        ) WHERE rn <= 2
    ), qres AS (
        SELECT p.qid, p.cell, s.sub,
               list_slice(list_transform(range(1, 65), i -> q.qv[i] - p.cv[i]),
                          s.sub*8 + 1, s.sub*8 + 8) AS qs
        FROM probed p JOIN queries q USING (qid) CROSS JOIN subs s
    ), lut AS (
        SELECT qr.qid, qr.cell, qr.sub, c.code,
               CAST(FLOOR((list_dot_product(qr.qs, qr.qs) - 2*list_dot_product(qr.qs, c.c_vec)
                           + list_dot_product(c.c_vec, c.c_vec)) * 1000000 + 0.5) AS BIGINT) AS pd_micro
        FROM qres qr JOIN cb c ON c.sub = qr.sub
    ), cands AS (
        SELECT p.qid, b.vec_id, a.cell, b.sub, b.code
        FROM best b
        JOIN assigned a USING (vec_id)
        JOIN probed p ON p.cell = a.cell
    ), adc AS (
        SELECT qid, vec_id, CAST(SUM(pd_micro) AS BIGINT) AS adc_d2_micro
        FROM cands JOIN lut USING (qid, cell, sub, code)
        GROUP BY qid, vec_id
    ), ranked AS (
        SELECT qid, vec_id, adc_d2_micro,
               row_number() OVER (PARTITION BY qid ORDER BY adc_d2_micro, vec_id) AS rn
        FROM adc
    )
    SELECT qid AS query_id, vec_id, adc_d2_micro FROM ranked WHERE rn <= 10
    """,
    doc="IVF-PQ SERVING path (operators/similarity.py:"
    "materialize_ivfpq_index/ivfpq_topk_served): the residual PQ codes "
    "are encoded ONCE to parquet partitioned by cell, and two "
    "different query vectors (vec_id 0 and 1) are answered from that "
    "one index build. Probe selection stays in-engine, and the "
    "broadcast probe join lands on the partition column, so Spark "
    "applies DYNAMIC PARTITION PRUNING — each query's scan reads only "
    "its probed cells' directories of the compressed code store "
    "(dynamicpruningexpression pinned in tests/test_scale_ops.py). "
    "The amortized per-query cost at 100 TB: |probed codes| * m "
    "integer adds, no corpus scan, no driver collect.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivfpq_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    m, dsub = 8, 8
    base = tempfile.mkdtemp(prefix="bosql_ivfpq_idx_")
    S.materialize_ivfpq_index(emb, cents, base, m=m, dsub=dsub, ks=16)
    parts = []
    for qid in (0, 1):
        qrow = emb.filter(F.col("vec_id") == qid).select("embedding").first()
        qvec = [float(x) for x in qrow["embedding"]]
        parts.append(
            S.ivfpq_topk_served(
                spark, base, cents, qvec, m=m, dsub=dsub, n_probe=2, k=10
            ).select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col("vec_id").cast("long").alias("vec_id"),
                "adc_d2_micro",
            )
        )
    return parts[0].unionAll(parts[1])


@register(
    "decontaminate_overlap_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), sh AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       CASE WHEN len(tok) <= 5 THEN [1]
                            ELSE range(1, len(tok) - 5 + 2) END,
                       i -> array_to_string(tok[i:i+4], ' ')))) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> ''
    ), ev AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 25 = 0
    ), scored AS (
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM sh s LEFT JOIN ev e USING (shingle)
        WHERE s.doc_id % 25 <> 0
        GROUP BY s.doc_id
    )
    SELECT doc_id, n_shingles, n_hits,
           CAST(FLOOR(n_hits * 1000 / n_shingles) AS BIGINT) AS contamination_permille
    FROM scored
    """,
    doc="Contamination RATIO per train doc (operators/dedup.py:"
    "contamination_ratio): |5-word shingles shared with the doc_id%25 "
    "eval set| / |doc shingles|, as integer per-mille — the graded "
    "refinement of boolean decontamination (pipelines drop at a "
    "threshold instead of on any single hit). Same scale shape as "
    "decontaminate: broadcast eval shingles, one corpus scan, map-side "
    "combinable counts.",
    tags=("pipeline", "dedup", "training"),
)
def decontaminate_overlap_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    train = docs.filter(F.col("doc_id") % 25 != 0)
    evalset = docs.filter(F.col("doc_id") % 25 == 0)
    return D.contamination_ratio(train, evalset, k=5)


@register(
    "similarity_ivf_incremental",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id,
               list_dot_product(v, v) - 2*list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    )
    SELECT a.vec_id, ROUND(
               list_dot_product(e.v, q.v)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim
    FROM assigned a
    JOIN vecs e USING (vec_id)
    CROSS JOIN (SELECT v FROM vecs WHERE vec_id = 0) q
    WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 0)
      AND a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id LIMIT 10
    """,
    doc="Incremental IVF index maintenance (operators/similarity.py:"
    "append_ivf_assignment): the base corpus (vec_id >= 50) is indexed "
    "and materialized once; the new batch (vec_id < 50) is assigned "
    "alone and APPENDED into the cell-partitioned store — no rebuild, "
    "no touch of existing files. The query then serves from the "
    "combined store. Because coarse assignment is per-row independent, "
    "the result must equal a full re-index — the oracle computes the "
    "full-corpus assignment directly, so any divergence between "
    "append-path and rebuild-path fails the hash.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    base = emb.filter(F.col("vec_id") >= 50)
    batch = emb.filter(F.col("vec_id") < 50)
    path = tempfile.mkdtemp(prefix="bosql_ivf_incr_") + "/assignment"
    S.materialize_ivf_assignment(base, cents, path)
    S.append_ivf_assignment(batch, cents, path)
    assigned = spark.read.parquet(path)
    qrow = assigned.filter(F.col("vec_id") == 0).first()
    return S.ivf_topk_served(
        spark, path,
        [float(x) for x in qrow["embedding"]],
        query_cells=[qrow["cell"]],
        k=10,
        exclude_id=0,
    ).select("vec_id", "cos_sim")


@register(
    "similarity_ivf_stream_ingest",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id,
               list_dot_product(v, v) - 2*list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    )
    SELECT a.vec_id, ROUND(
               list_dot_product(e.v, q.v)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim
    FROM assigned a
    JOIN vecs e USING (vec_id)
    CROSS JOIN (SELECT v FROM vecs WHERE vec_id = 0) q
    WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 0)
      AND a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id LIMIT 10
    """,
    doc="STREAMING IVF ingest: embeddings arrive as a bounded file "
    "stream and each microbatch's coarse assignment is APPENDED to the "
    "cell-partitioned store via foreachBatch (availableNow drain; "
    "maxFilesPerTrigger=1, so a multi-file landing directory ingests "
    "one file per microbatch — the graded single-file fixture drains "
    "in one batch, and the multi-batch path is unit-tested against a "
    "full rebuild) — the arrival path of a live ANN index; serving "
    "(ivf_topk_served) is unchanged. Because "
    "assignment is per-row independent and append-only, the drained "
    "store must equal a full re-index regardless of how rows were "
    "batched — the oracle computes the full-corpus assignment "
    "directly, so batching artifacts fail the hash.",
    tags=("pipeline", "similarity", "streaming"),
)
def similarity_ivf_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    emb_batch = _t(spark, sf_dir)["embeddings"]
    cents = emb_batch.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = tempfile.mkdtemp(prefix="bosql_ivf_stream_") + "/assignment"

    stream = (
        spark.readStream.schema(emb_batch.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        S.append_ivf_assignment(batch_df, cents, path)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option(
            "checkpointLocation",
            os.path.join(os.path.dirname(path), "checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assigned = spark.read.parquet(path)
    qrow = assigned.filter(F.col("vec_id") == 0).first()
    return S.ivf_topk_served(
        spark, path,
        [float(x) for x in qrow["embedding"]],
        query_cells=[qrow["cell"]],
        k=10,
        exclude_id=0,
    ).select("vec_id", "cos_sim")


# One oracle body serves every trained-PQ codebook size: __KS__ is the
# only axis (ks=16 keeps the historical CORRECTNESS key; ks=256 is the
# standard 8-bit PQ the recall table grades).
_PQ_TRAINED_ORACLE = """
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), subs AS (
        SELECT unnest(range(0, 8)) AS sub
    ), dims AS (
        SELECT unnest(range(1, 9)) AS pos
    ), cb0 AS (
        SELECT s.sub, ve.vec_id AS code, list_slice(ve.v, s.sub*8 + 1, s.sub*8 + 8) AS cw
        FROM vecs ve CROSS JOIN subs s WHERE ve.vec_id < __KS__
    ), parts AS (
        SELECT ve.vec_id, s.sub, list_slice(ve.v, s.sub*8 + 1, s.sub*8 + 8) AS sv
        FROM vecs ve CROSS JOIN subs s
    ), a0 AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.cw)
               + list_dot_product(c.cw, c.cw), 'c': c.code})).c AS code
        FROM parts p JOIN cb0 c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), cb1 AS (
        SELECT sub, code,
               array_agg(CAST(FLOOR(s_micro / n + 0.5) AS BIGINT) / 1000000.0
                         ORDER BY pos) AS cw
        FROM (
            SELECT a.sub, a.code, d.pos,
                   SUM(CAST(FLOOR(p.sv[d.pos] * 1000000 + 0.5) AS BIGINT)) AS s_micro,
                   COUNT(*) AS n
            FROM a0 a
            JOIN parts p ON a.vec_id = p.vec_id AND a.sub = p.sub
            CROSS JOIN dims d
            GROUP BY a.sub, a.code, d.pos
        )
        GROUP BY sub, code
    ), enc AS (
        SELECT p.vec_id, p.sub, (min({'d':
               list_dot_product(p.sv, p.sv) - 2*list_dot_product(p.sv, c.cw)
               + list_dot_product(c.cw, c.cw), 'c': c.code})).c AS code
        FROM parts p JOIN cb1 c USING (sub)
        GROUP BY p.vec_id, p.sub
    ), q AS (
        SELECT v AS qv FROM vecs WHERE vec_id = 0
    ), lut AS (
        SELECT c.sub, c.code,
               CAST(FLOOR((list_dot_product(qs, qs) - 2*list_dot_product(qs, c.cw)
                           + list_dot_product(c.cw, c.cw)) * 1000000 + 0.5) AS BIGINT) AS pd_micro
        FROM (SELECT sub, code, cw, list_slice(qv, sub*8 + 1, sub*8 + 8) AS qs
              FROM cb1 CROSS JOIN q) c
    ), adc AS (
        SELECT e.vec_id, CAST(SUM(l.pd_micro) AS BIGINT) AS adc_d2_micro
        FROM enc e JOIN lut l USING (sub, code)
        GROUP BY e.vec_id
    )
    SELECT vec_id, adc_d2_micro FROM adc
    ORDER BY adc_d2_micro, vec_id LIMIT 10
    """


def _pq_trained(spark: SparkSession, sf_dir: str, ks: int) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    m, dsub = 8, 8
    cb0 = S.pq_codebooks_from_seeds(emb, m=m, dsub=dsub, ks=ks)
    # checkpoint the trained codebook: it is consumed THREE times
    # (driver arrays for the arrow encode, the ADC lookup table, and
    # its own derivation) and is broadcast-sized by construction
    cb1 = (
        S.pq_train_step(emb, cb0, m=m, dsub=dsub)
        .select("sub", "code", "c_vec")
        .localCheckpoint(eager=True)
    )
    codes = S.pq_encode(emb, cb1, m=m, dsub=dsub)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return S.pq_adc_topk(codes, cb1, qvec, m=m, dsub=dsub, k=10)


@register(
    "similarity_pq_trained",
    oracle=_PQ_TRAINED_ORACLE.replace("__KS__", "16"),
    doc="PQ with IN-ENGINE trained codebooks (operators/similarity.py:"
    "pq_train_step): seed codebooks take one Lloyd step — slices "
    "assign to nearest codewords (broadcast argmin), new codewords are "
    "per-(sub, code, dim) fixed-point means so both engines feed "
    "the encode bit-identical books — then the corpus is encoded with "
    "the trained books and a query answered by ADC. Closes the "
    "training loop the seed-codebook queries leave open (SCALE.md "
    "measures what it buys); all m subspaces train in ONE plan with "
    "(sub, code) keys, shuffling only tiny per-dim partials.",
    tags=("pipeline", "similarity", "training", "approx"),
)
def similarity_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_trained(spark, sf_dir, ks=16)


@register(
    "similarity_pq_trained256",
    oracle=_PQ_TRAINED_ORACLE.replace("__KS__", "256"),
    doc="Standard 8-bit PQ: the same one-plan Lloyd train -> encode -> "
    "ADC pipeline as similarity_pq_trained but at ks=256 codewords per "
    "subspace — the config every production PQ index uses and the one "
    "the recall table grades (recall@10 0.40 at ks=256 vs 0.14 at "
    "ks=16 on the sf0.1 fixture, SCALE.md; floor asserted in "
    "tests/test_scale_ops.py). Codebooks stay broadcast-sized (m * ks "
    "= 2048 rows of 8 doubles); corpus-side cost is unchanged in shape "
    "— the argmin fan-out is ks per (vec, sub), still map-side against "
    "a broadcast table, so the plan scales exactly like ks=16.",
    tags=("pipeline", "similarity", "training", "approx"),
)
def similarity_pq_trained256(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_trained(spark, sf_dir, ks=256)


def _opq_oracle() -> str:
    """The trained-ks=256 PQ oracle over OPQ-ROTATED vectors. The
    rotation matrix is a pure function of its seed (Pythagorean-triple
    Givens composition, no libm — operators/similarity.py:
    seeded_rotation_micro), so the SAME integer-micro entries are
    embedded as literals here and in the Spark plan: y = R_int * v_int
    is a sum of 64 integer products < 2^53, exact in any engine in any
    accumulation order, and y/1e12 is the identical double everywhere
    — cross-engine parity by construction, no trig replay needed."""
    from bo_sql_spark.operators.similarity import seeded_rotation_micro

    rot = seeded_rotation_micro()
    vals = ", ".join(
        f"({i}, [{', '.join(str(v) for v in row)}])"
        for i, row in enumerate(rot)
    )
    prefix = f"""rotm AS (
        SELECT * FROM (VALUES {vals}) t(i, rv)
    ), vint AS (
        SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS vi
        FROM embeddings
    ), rotated AS (
        SELECT vec_id,
               array_agg(CAST(list_dot_product(rm.rv, vt.vi) AS DOUBLE) / 1e12
                         ORDER BY rm.i) AS v
        FROM vint vt CROSS JOIN rotm rm GROUP BY vec_id
    ), """
    body = _PQ_TRAINED_ORACLE.replace("__KS__", "256").replace(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        "SELECT vec_id, v FROM rotated",
    )
    return body.replace("WITH vecs AS (", "WITH " + prefix + "vecs AS (")


@register(
    "similarity_knn_graph",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN vecs ve USING (vec_id)
    ), pairs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    )
    SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
        FROM pairs
    ) WHERE rnk <= 5
    """,
    doc="Corpus-wide approximate k-NN GRAPH (operators/similarity.py:"
    "knn_graph): every vector's top-5 cosine neighbors within its IVF "
    "cell — the artifact semantic clustering, graph dedup, and "
    "label-propagation pipelines start from (SemDeDup's published "
    "pipeline builds exactly this per-cluster neighbor structure). "
    "Same scale shape as dedup_semantic: checkpointed broadcast-argmin "
    "assignment (both join sides consume it), self-join keyed ON the "
    "cell (pair space O(n^2/cells), nothing crosses cells), and the "
    "per-id rank window plans WindowGroupLimit so ~k rows per id "
    "survive below the shuffle (pinned). Cluster count is the "
    "published lever; the 1-probe own-cell restriction is the standard "
    "recall trade with cosine_topk as the exact per-query twin.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    return S.knn_graph(emb, cents, k=5)


@register(
    "similarity_knn_clusters",
    oracle="""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(v, (x, i) ->
                   x * (CAST(1 AS DOUBLE)
                        + CAST(0.0002 AS DOUBLE) * ((i - 1 + vec_id) % 5)))
        FROM base WHERE vec_id % 7 = 0
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM base WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM aug CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN aug ve USING (vec_id)
    ), pairs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ), knn AS (
        SELECT vec_id, neighbor_id, ROUND(sim, 6) AS cos_sim
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
            FROM pairs
        ) WHERE rnk <= 5
    ), edges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM knn WHERE cos_sim >= 0.95
        UNION
        SELECT neighbor_id, vec_id FROM knn WHERE cos_sim >= 0.95
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    ), canon AS (
        SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT g.vec_id, COALESCE(c.cluster_id, g.vec_id) AS cluster_id
    FROM (SELECT vec_id FROM aug) g
    LEFT JOIN canon c ON g.vec_id = c.node
    """,
    doc="Semantic CLUSTERING from the k-NN graph (knn_graph -> "
    "threshold -> connected_components): edges are graph neighbors "
    "with cosine >= 0.95, components collapse by pointer-doubling "
    "min-label propagation, and every vector gets a cluster id "
    "(singletons keep their own) — the cluster artifact "
    "diversity-sampling and stratified-split pipelines consume, and "
    "the graph-native sibling of dedup_clusters (which clusters LSH "
    "text pairs the same way). Planted near-copies (the dedup_semantic "
    "construction, replayed closed-form by the oracle including the "
    "recursive-CTE closure) make the clusters non-trivial on the "
    "random fixture. Scale: knn edges are O(k*n) tiny rows, CC "
    "shuffles only the edge list, O(log diameter) rounds.",
    tags=("pipeline", "similarity", "iterative"),
)
def similarity_knn_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.0002) * ((i + F.col("vec_id")) % 5).cast("double")
            ),
        ).alias("embedding"),
    )
    aug = emb.unionAll(planted)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    g = S.knn_graph(aug, cents, k=5)
    edges = g.filter(F.col("cos_sim") >= 0.95).select(
        F.col("vec_id").alias("id_a"), F.col("neighbor_id").alias("id_b")
    )
    canon = D.connected_components(edges)
    return (
        aug.select("vec_id")
        .join(canon, aug.vec_id == canon.node, "left")
        .select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
        )
    )


@register(
    "similarity_opq_adc",
    oracle=_opq_oracle(),
    doc="OPQ-style rotation before trained PQ (operators/similarity.py:"
    "seeded_rotation_micro + rotate_embeddings; Ge et al. CVPR'13, "
    "seeded-rotation baseline of Jegou 2011): a deterministic "
    "orthogonal transform — 256 seeded Givens rotations with "
    "Pythagorean-triple (cos, sin) rationals, pairs forced across PQ "
    "subspace boundaries, composed once and rounded to integer micros "
    "— is applied with EXACT cross-engine arithmetic (BIGINT "
    "dot-products < 2^53, then /1e12), and the unchanged ks=256 "
    "Lloyd-train -> encode -> ADC pipeline runs on the rotated "
    "vectors. Same bytes/vec as similarity_pq_trained256; measured "
    "recall@10 0.368 vs 0.338 unrotated on the (near-isotropic) "
    "fixture, and 0.55 vs 0.35 on an anisotropic variant — the regime "
    "the transform exists for (SCALE.md ledger). The rotation is one "
    "nested-literal expression in the scan stage: no shuffle, no UDF, "
    "no driver collect.",
    tags=("pipeline", "similarity", "training", "approx"),
)
def similarity_opq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    rot = S.rotate_embeddings(emb, S.seeded_rotation_micro())
    m, dsub, ks = 8, 8, 256
    cb0 = S.pq_codebooks_from_seeds(rot, m=m, dsub=dsub, ks=ks)
    cb1 = (
        S.pq_train_step(rot, cb0, m=m, dsub=dsub)
        .select("sub", "code", "c_vec")
        .localCheckpoint(eager=True)
    )
    codes = S.pq_encode(rot, cb1, m=m, dsub=dsub)
    qrow = rot.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow["embedding"]]
    return S.pq_adc_topk(codes, cb1, qvec, m=m, dsub=dsub, k=10)


@register(
    "multimodal_resize_png",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(n_chars % 64 + 1 AS BIGINT) AS w,
               CAST(doc_id % 48 + 1 AS BIGINT)  AS h
        FROM documents
    ), sized AS (
        SELECT doc_id, w, h,
               greatest(1, (w * 16 + greatest(w, h) - 1) // greatest(w, h)) AS nw,
               greatest(1, (h * 16 + greatest(w, h) - 1) // greatest(w, h)) AS nh
        FROM dims
    )
    SELECT doc_id, w AS width, h AS height,
           CAST(nw AS BIGINT) AS new_width, CAST(nh AS BIGINT) AS new_height,
           CAST(list_sum(list_transform(range(0, nw * nh),
                i -> (doc_id + ((i // nw) * h // nh) * w + ((i % nw) * w // nw)) % 256))
                AS BIGINT) AS pixel_sum,
           CAST(list_min(list_transform(range(0, nw * nh),
                i -> (doc_id + ((i // nw) * h // nh) * w + ((i % nw) * w // nw)) % 256))
                AS BIGINT) AS pixel_min,
           CAST(list_max(list_transform(range(0, nw * nh),
                i -> (doc_id + ((i // nw) * h // nh) * w + ((i % nw) * w // nw)) % 256))
                AS BIGINT) AS pixel_max
    FROM sized
    """,
    doc="REAL image resize (operators/multimodal.py:resize_png): decode "
    "the actual PNG, nearest-neighbor resample the longest side to 16 "
    "px (aspect-preserving integer-ceil dims), report stats of the "
    "RESAMPLED pixels — src(r,c) = pixels[(r*h)//nh * w + (c*w)//nw]. "
    "The oracle recomputes every resampled pixel from the closed-form "
    "source formula, so decode + resample must both be byte-exact; "
    "this upgrades multimodal_resize (dimension math only) to a full "
    "pixel-path operation.",
    tags=("pipeline", "multimodal"),
)
def multimodal_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    blobs = M.make_png_blob_df(t["documents"])
    return M.resize_png(blobs, max_side=16)


@register(
    "dedup_semantic",
    oracle="""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(v, (x, i) ->
                   x * (CAST(1 AS DOUBLE)
                        + CAST(0.0002 AS DOUBLE) * ((i - 1 + vec_id) % 5)))
        FROM base WHERE vec_id % 7 = 0
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM aug WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM aug CROSS JOIN cents GROUP BY vec_id
    ), dups AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a
        JOIN assigned b ON a.cell = b.cell AND a.vec_id > b.vec_id
        JOIN aug va ON va.vec_id = a.vec_id
        JOIN aug vb ON vb.vec_id = b.vec_id
        WHERE list_dot_product(va.v, vb.v)
              / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) >= 0.95
    )
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell
    FROM assigned a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)
    """,
    doc="SemDeDup (operators/dedup.py:semantic_dedup): cluster "
    "embeddings to 16 fixed centroids, then within each cluster drop "
    "every vector with a lower-id cosine-0.95 neighbor — the published "
    "cluster-then-pairwise semantic dedup (Abbas et al. 2023), whose "
    "within-cluster self-join shuffles only on the cell key (cluster "
    "count scales with the corpus so |cell| stays bounded; no global "
    "O(n^2)). The synthetic embeddings have no natural semantic dups "
    "(max within-cell cos ~0.49), so the query plants one near-copy "
    "per vec_id%7 doc in closed form — per-dim scaling by "
    "1 + 0.0002*((i+vec_id)%5), identical double math in both engines "
    "— and the survivors must be exactly the originals plus any "
    "copies that landed in a different cell (asserted in "
    "tests/test_operators.py).",
    tags=("pipeline", "dedup", "similarity"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.0002)
                * ((i + F.col("vec_id")) % 5).cast("double")
            ),
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionAll(planted)
    cents = aug.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    return D.semantic_dedup(aug, cents, threshold=0.95)


@register(
    "dedup_semantic_threshold_sweep",
    oracle="""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(v, (x, i) ->
                   x * (CAST(1 AS DOUBLE)
                        + CAST(0.0002 AS DOUBLE) * ((i - 1 + vec_id) % 5)))
        FROM base WHERE vec_id % 7 = 0
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM aug WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM aug CROSS JOIN cents GROUP BY vec_id
    ), pairs AS (
        SELECT a.vec_id AS ida,
               list_dot_product(va.v, vb.v)
               / (sqrt(list_dot_product(va.v, va.v))
                  * sqrt(list_dot_product(vb.v, vb.v))) AS cos
        FROM assigned a
        JOIN assigned b ON a.cell = b.cell AND a.vec_id > b.vec_id
        JOIN aug va ON va.vec_id = a.vec_id
        JOIN aug vb ON vb.vec_id = b.vec_id
    ), grid AS (
        SELECT unnest([300, 350, 400, 450, 500, 950, 990]) AS threshold_permille
    )
    SELECT CAST(threshold_permille AS BIGINT) AS threshold_permille,
           CAST(COUNT(*) FILTER (WHERE cos >= threshold_permille / 1000.0)
                AS BIGINT) AS n_dup_pairs,
           CAST(COUNT(DISTINCT CASE WHEN cos >= threshold_permille / 1000.0
                                    THEN ida END) AS BIGINT) AS n_dropped_docs
    FROM grid, pairs GROUP BY threshold_permille ORDER BY threshold_permille
    """,
    doc="Threshold CALIBRATION sweep for SemDeDup "
    "(operators/dedup.py:semantic_pair_cosines): before committing a "
    "cosine cutoff over 100 TB, sweep a threshold grid over exactly "
    "the candidate-pair population the dedup scores — the within-cell "
    "pairs (cross-cell pairs are unreachable by construction, so "
    "including them would calibrate against pairs the operator can "
    "never drop). Emits per grid point (n_dup_pairs, n_dropped_docs): "
    "the drop-rate curve an operator reads before picking epsilon. "
    "Pairs are computed ONCE (cell-keyed self-join, the dedup's own "
    "shape) and the grid is a broadcast 7-row table, so the sweep "
    "costs one pairwise pass regardless of grid size. On this corpus "
    "the curve separates cleanly: natural within-cell cosines top out "
    "~0.49 (the low grid points count them) while the planted "
    "near-copies (same closed form as dedup_semantic) sit above "
    "0.99 — the wide flat gap IS the evidence 0.95 is a safe cutoff.",
    tags=("pipeline", "dedup", "similarity", "monitoring"),
)
def dedup_semantic_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.0002)
                * ((i + F.col("vec_id")) % 5).cast("double")
            ),
        ).alias("embedding"),
    )
    aug = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionAll(planted)
    cents = aug.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    pairs = D.semantic_pair_cosines(aug, cents)
    grid = spark.createDataFrame(
        [(t,) for t in (300, 350, 400, 450, 500, 950, 990)],
        "threshold_permille long",
    )
    hit = F.col("cos") >= F.col("threshold_permille") / 1000.0
    return (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("threshold_permille")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_dup_pairs"),
            F.count_distinct(F.when(hit, F.col("ida")))
            .cast("long")
            .alias("n_dropped_docs"),
        )
        .orderBy("threshold_permille")
    )


@register(
    "similarity_sq8_topk",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dims AS (
        SELECT unnest(range(1, 65)) AS pos
    ), stats AS (
        SELECT pos, MIN(v[pos]) AS mn, MAX(v[pos]) AS mx
        FROM vecs CROSS JOIN dims GROUP BY pos
    ), codes AS (
        SELECT vec_id, pos,
               CASE WHEN mx = mn THEN 0 ELSE
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR((v[pos] - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)))
               END AS c
        FROM vecs CROSS JOIN dims JOIN stats USING (pos)
    ), dec AS (
        SELECT vec_id, pos,
               CAST(FLOOR((mn + c * (mx - mn) / 255) * 1000000 + 0.5) AS BIGINT) AS dm
        FROM codes JOIN stats USING (pos)
    ), q AS (
        SELECT pos, dm AS qm FROM dec WHERE vec_id = 0
    )
    SELECT vec_id, CAST(SUM(dm * qm) AS BIGINT) AS sq_score
    FROM dec JOIN q USING (pos)
    WHERE vec_id <> 0
    GROUP BY vec_id
    ORDER BY sq_score DESC, vec_id
    LIMIT 10
    """,
    doc="Int8 scalar-quantization ANN (operators/similarity.py:"
    "sq8_stats/sq8_encode/sq8_topk): per-dim min/max codebook (one "
    "map-side-combinable agg, broadcast back), 8-bit codes from a "
    "closed-form clamp (pure zip_with, no shuffle, no UDF), then "
    "top-10 by dot product of DECODED vectors in micro fixed point — "
    "decode-then-score is how FAISS's scalar quantizer works (raw "
    "code-dot is not a dot estimate: min-max codes rescale every dim "
    "differently; measured recall 0.0), and micros keep the score an "
    "exact BIGINT so it can never flake cross-engine. The 4x-vs-"
    "float32 compression tier between raw cosine (1x) and PQ (32x): "
    "at 100 TB the code table is what the serving fleet holds in RAM, "
    "decode runs in the scan stage, and scoring feeds "
    "TakeOrderedAndProject. Recall@10 vs exact dot is asserted >= 0.9 "
    "in tests/test_operators.py.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.parallel import lineage_cut

    emb = _t(spark, sf_dir)["embeddings"]
    # r15-opt (§5 one-consumer rule): stats feeds the encode AND the
    # topk decode; codes feeds the query row AND the corpus side — the
    # r15 scan audit read 5 parquet scans of embeddings in this ONE
    # executed plan (stats subtree re-planned per consumer). Cut both:
    # one stats pass + one encode pass per run.
    stats = lineage_cut(S.sq8_stats(emb))
    codes = lineage_cut(S.sq8_encode(emb, stats))
    qcodes = codes.filter(F.col("vec_id") == 0)
    return S.sq8_topk(
        codes.filter(F.col("vec_id") != 0), qcodes, stats, k=10
    )


def _rp_oracle() -> str:
    from bo_sql_spark.operators.sampling import portable_hash_sql

    from bo_sql_spark.operators.sampling import PORTABLE_PRIME

    mix = portable_hash_sql("j * 64 + d")
    p = PORTABLE_PRIME
    return f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), proj AS (
        SELECT vec_id,
               list_transform(range(0, 16), j ->
                   list_dot_product(v, list_transform(
                       list_transform(range(0, 64), d -> {mix}),
                       h -> CASE WHEN (h * h) % {p} * 2 >= {p}
                                 THEN CAST(-1 AS DOUBLE)
                                 ELSE CAST(1 AS DOUBLE) END))) AS p
        FROM vecs
    ), q AS (
        SELECT p AS qp FROM proj WHERE vec_id = 0
    )
    SELECT vec_id, ROUND(sim, 6) AS proj_cos
    FROM (
        SELECT vec_id,
               list_dot_product(p, qp)
               / (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(qp, qp))) AS sim
        FROM proj CROSS JOIN q WHERE vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """


@register(
    "similarity_random_projection",
    oracle=_rp_oracle(),
    doc="JL random projection ANN (operators/similarity.py:"
    "random_projection): 64 -> 16 dims via Achlioptas's +-1 sign "
    "matrix, signs drawn per (out_dim, in_dim) cell from the engine-"
    "portable integer mix — no stored matrix, no RNG, the projection "
    "is a pure map-side higher-order expression in the scan stage. "
    "Top-10 by cosine in the PROJECTED space (4x fewer multiplies and "
    "4x fewer shuffle bytes per vector than full-dim scoring; JL "
    "preserves pairwise geometry within ~1/sqrt(16)). Recall vs full-"
    "dim exact cosine is measured in tests/test_operators.py. Both "
    "engines build the identical matrix from the same mix and run the "
    "same sequential-order dot products.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    proj = S.random_projection(emb, out_dim=16, in_dim=64)
    qp = proj.filter(F.col("vec_id") == 0).select(F.col("proj").alias("_qp"))
    return (
        proj.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qp))
        .select(
            "vec_id",
            cosine_similarity(F.col("proj"), F.col("_qp")).alias("_cos"),
        )
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 6).alias("proj_cos"))
    )


def _bpe_oracle(n_merges: int = 6, final: str = "merges") -> str:
    """Unrolled BPE training replay: the merge loop becomes n chained
    (pair-count -> argmax -> replace) CTE stages. Generated, not
    handwritten, so the step count stays in lockstep with the Spark
    builders below. ``final='merges'`` emits the merge table
    (text_bpe_train); ``final='doc_tokens'`` segments every word under
    the trained merges and emits per-doc subword token counts
    (text_bpe_token_count)."""
    s = "\x1f"
    s2 = s + s
    sql = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents
    ), doctok AS (
        SELECT doc_id, w || '_' AS w FROM toks WHERE w <> ''
    ), wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM doctok GROUP BY 1
    ), s0 AS (
        SELECT w, '{s}' || array_to_string(string_split(w, ''), '{s2}') || '{s}' AS seq, freq
        FROM wf
    )"""
    for k in range(1, n_merges + 1):
        sql += f""", p{k} AS (
        SELECT sy[i] AS a, sy[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(range(1, len(sy))) AS i, sy, freq
            FROM (SELECT string_split(trim(seq, '{s}'), '{s2}') AS sy, freq FROM s{k - 1})
        ) GROUP BY 1, 2
    ), m{k} AS (
        SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
    ), s{k} AS (
        SELECT w, replace(seq,
                   COALESCE('{s}' || m.a || '{s2}' || m.b || '{s}', '{s}{s}{s}'),
                   COALESCE('{s}' || m.a || m.b || '{s}', '{s}{s}{s}')) AS seq, freq
        FROM s{k - 1} LEFT JOIN m{k} m ON TRUE
    )"""
    if final == "doc_tokens":
        return sql + f""", seg AS (
        SELECT w, CAST(len(string_split(trim(seq, '{s}'), '{s2}')) AS BIGINT) AS n_pieces
        FROM s{n_merges}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_bpe_tokens
    FROM doctok JOIN seg USING (w)
    GROUP BY doc_id"""
    steps = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, a, b, cnt FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return sql + f" SELECT step, a, b, cnt FROM ({steps})"


@register(
    "text_bpe_train",
    oracle=_bpe_oracle(6),
    doc="BPE tokenizer training (operators/text.py:bpe_train), the "
    "Sennrich et al. 2016 algorithm end to end: 6 iterations of "
    "count-adjacent-pairs -> argmax -> merge, ties broken (cnt desc, "
    "a, b). The corpus is scanned ONCE into the distinct-word "
    "frequency table; every iteration after that is vocab-sized "
    "(millions of rows at 100 TB, not the corpus), the argmax joins "
    "back by broadcast (the driver never sees a row), and merge "
    "application is a map-side string replace over the SEP-wrapped "
    "symbol encoding — chosen precisely so the loop stays SQL-"
    "expressible and the oracle replays ALL 6 stages as generated "
    "CTEs. Exact-match validated against a pure-python BPE reference "
    "in tests/test_operators.py.",
    tags=("pipeline", "text"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return T.bpe_train(docs, n_merges=6)


@register(
    "text_unigram_doc_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tk AS (
        SELECT doc_id, term FROM toks WHERE term <> ''
    ), gf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS gf FROM tk GROUP BY term
    )
    SELECT tk.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(gf.gf) AS BIGINT) AS sum_freq,
           CAST(SUM(gf.gf) // COUNT(*) AS BIGINT) AS mean_tok_freq
    FROM tk JOIN gf USING (term)
    GROUP BY tk.doc_id
    """,
    doc="Unigram-LM document quality proxy: per-doc mean corpus "
    "frequency of its tokens — the log-free skeleton of a unigram "
    "log-prob score (docs made of rare/garbage tokens score low, "
    "stopword-heavy boilerplate scores high; pipelines cut both "
    "tails). Two vocab-keyed aggregations: global term counts "
    "(map-side combinable) broadcast back onto the token stream, then "
    "one per-doc agg — corpus text never shuffles. All-integer "
    "(BIGINT sums, DIV mean) so the score is exact in both engines.",
    tags=("pipeline", "text"),
)
def text_unigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions.textfn import tokens

    docs = _t(spark, sf_dir)["documents"]
    tk = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    gf = tk.groupBy("term").agg(F.count(F.lit(1)).alias("gf"))
    return (
        tk.join(F.broadcast(gf), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("gf").alias("sum_freq"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long"),
            F.col("sum_freq").cast("long"),
            F.expr("sum_freq DIV n_tokens").alias("mean_tok_freq"),
        )
    )


def _rp_rerank_oracle() -> str:
    from bo_sql_spark.operators.sampling import PORTABLE_PRIME, portable_hash_sql

    mix = portable_hash_sql("j * 64 + d")
    p = PORTABLE_PRIME
    return f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), proj AS (
        SELECT vec_id,
               list_transform(range(0, 16), j ->
                   list_dot_product(v, list_transform(
                       list_transform(range(0, 64), d -> {mix}),
                       h -> CASE WHEN (h * h) % {p} * 2 >= {p}
                                 THEN CAST(-1 AS DOUBLE)
                                 ELSE CAST(1 AS DOUBLE) END))) AS p
        FROM vecs
    ), q AS (
        SELECT p AS qp FROM proj WHERE vec_id = 0
    ), cand AS (
        SELECT vec_id
        FROM proj CROSS JOIN q
        WHERE vec_id <> 0
        ORDER BY list_dot_product(p, qp)
              / (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(qp, qp))) DESC,
              vec_id
        LIMIT 100
    ), qv AS (
        SELECT v AS qvec FROM vecs WHERE vec_id = 0
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT e.vec_id,
               list_dot_product(e.v, qv.qvec)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.qvec, qv.qvec))) AS sim
        FROM cand JOIN vecs e USING (vec_id) CROSS JOIN qv
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """


@register(
    "similarity_rp_rerank",
    oracle=_rp_rerank_oracle(),
    doc="Coarse-to-fine ANN: rank ALL vectors by 16-dim projected "
    "cosine (4x cheaper per row, TakeOrderedAndProject keeps the top "
    "100), then exact 64-dim cosine reranks only those 100 — the "
    "classic two-stage retrieval every production vector store runs "
    "(coarse scan in the compressed space, exact math on a bounded "
    "candidate set). The candidate set joins back to the full vectors "
    "by broadcast, so the full-dim table is probed, never scanned. "
    "Measured recall@10 vs exact is asserted in tests/"
    "test_operators.py — candidates=100 recovers most of what raw "
    "16-dim top-10 loses on the near-isotropic fixture.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_rp_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    proj = S.random_projection(emb, out_dim=16, in_dim=64)
    qp = proj.filter(F.col("vec_id") == 0).select(F.col("proj").alias("_qp"))
    cand = (
        proj.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qp))
        .select(
            "vec_id",
            cosine_similarity(F.col("proj"), F.col("_qp")).alias("_pcos"),
        )
        .orderBy(F.col("_pcos").desc(), "vec_id")
        .limit(100)
        .select("vec_id")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("_qv")).alias("_cos"),
        )
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 6).alias("cos_sim"))
    )


@register(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
        FROM documents
    ), tk AS (
        SELECT term FROM toks WHERE term <> ''
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tk
    ), c AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY term
    )
    SELECT term, cnt FROM c, n WHERE cnt * 200 >= total
    """,
    doc="Distributed heavy hitters (operators/heavy_hitters.py): all "
    "tokens with >= 0.5% global frequency, found via per-partition "
    "Misra-Gries summaries (Arrow-batched mapInPandas, m=400 counters, "
    "vectorized mergeable-summaries trim) + exact recount of the "
    "broadcast candidate union. Only <= m rows per partition shuffle — "
    "never the full key space — which is the 100 TB shape when keys "
    "are corpus-sized (URLs, n-grams). The weighted-average pigeonhole "
    "+ MG retention bound make the candidate set a guaranteed superset "
    "under ANY partitioning, so the recounted, threshold-filtered "
    "output is exact and layout-independent — which is exactly what "
    "lets a declarative DuckDB oracle check a sketch-based operator.",
    tags=("pipeline", "text", "approx"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions.textfn import tokens
    from bo_sql_spark.operators.heavy_hitters import heavy_hitters

    docs = _t(spark, sf_dir)["documents"]
    # r14-opt: spread_scan was tried here and LOST in every instrument
    # (bench pairs 1.24x/1.54x, interleaved A/Bs 1.7-2.1x): each extra
    # partition emits its own MG candidate superset, so the recount
    # join grows with the spread width while the tokenize map is too
    # cheap to amortize the exchange.
    tk = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    return heavy_hitters(tk, "term", ratio_denom=200)


@register(
    "dedup_semantic_incremental",
    oracle="""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), corpus AS (
        SELECT vec_id, v FROM base WHERE vec_id < 400
    ), batch AS (
        SELECT vec_id, v FROM base WHERE vec_id >= 400
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(v, (x, i) ->
                   x * (CAST(1 AS DOUBLE)
                        + CAST(0.0002 AS DOUBLE) * ((i - 1 + vec_id) % 5)))
        FROM base WHERE vec_id % 7 = 0 AND vec_id < 400
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM base WHERE vec_id < 16
    ), cassign AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM corpus CROSS JOIN cents GROUP BY vec_id
    ), bassign AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM batch CROSS JOIN cents GROUP BY vec_id
    ), cross_dups AS (
        SELECT DISTINCT b.vec_id
        FROM bassign b JOIN cassign c ON b.cell = c.cell
        JOIN batch vb ON vb.vec_id = b.vec_id
        JOIN corpus vc ON vc.vec_id = c.vec_id
        WHERE list_dot_product(vb.v, vc.v)
              / (sqrt(list_dot_product(vb.v, vb.v)) * sqrt(list_dot_product(vc.v, vc.v))) >= 0.95
    ), internal AS (
        SELECT DISTINCT a.vec_id
        FROM bassign a JOIN bassign b2 ON a.cell = b2.cell AND a.vec_id > b2.vec_id
        JOIN batch va ON va.vec_id = a.vec_id
        JOIN batch vb2 ON vb2.vec_id = b2.vec_id
        WHERE list_dot_product(va.v, vb2.v)
              / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb2.v, vb2.v))) >= 0.95
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell
    FROM bassign
    WHERE vec_id NOT IN (SELECT vec_id FROM cross_dups)
      AND vec_id NOT IN (SELECT vec_id FROM internal)
    """,
    doc="Incremental SemDeDup (operators/dedup.py:"
    "semantic_dedup_incremental): a new batch (vec_id >= 400 plus "
    "planted closed-form near-copies of corpus docs) probes the "
    "EXISTING corpus assignment — per-batch cost O(batch x cell), the "
    "corpus is never re-paired. Corpus members always outrank the "
    "batch; batch-internal dups resolve min-id-wins. Probing the full "
    "assignment (not just survivors) is what makes the result "
    "byte-equivalent to rerunning batch SemDeDup on corpus+batch "
    "restricted to batch ids — proven in tests/test_operators.py. "
    "The semantic twin of dedup_incremental_minhash_portable and "
    "similarity_ivf_incremental.",
    tags=("pipeline", "dedup", "similarity", "incremental"),
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.filter(F.col("vec_id") < 400)
    planted = corpus.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.0002) * ((i + F.col("vec_id")) % 5).cast("double")
            ),
        ).alias("embedding"),
    )
    batch = emb.filter(F.col("vec_id") >= 400).unionAll(planted)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    corpus_assigned = S.ivf_assign(corpus, cents)
    return D.semantic_dedup_incremental(
        corpus_assigned, batch, cents, threshold=0.95
    )


@register(
    "text_bpe_token_count",
    oracle=_bpe_oracle(6, final="doc_tokens"),
    doc="Tokenizer APPLY (operators/text.py:bpe_token_counts): train "
    "the same 6 BPE merges as text_bpe_train, segment every DISTINCT "
    "word under them (vocab-sized work), and join the per-word piece "
    "counts back to the token stream by broadcast for per-doc subword "
    "counts — how a pipeline prices its corpus in tokens under its own "
    "tokenizer (packing, budgets, cost estimates key off this). The "
    "corpus is touched exactly twice; the oracle replays training, "
    "segmentation, and the final join in one generated query.",
    tags=("pipeline", "text", "training"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return T.bpe_token_counts(docs, n_merges=6)


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), bg AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       CASE WHEN len(tok) < 2 THEN [] ELSE range(1, len(tok)) END,
                       i -> tok[i] || ' ' || tok[i + 1])) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> '' AND shingle <> ' '
    ), c2 AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY shingle
    ), c1 AS (
        SELECT string_split(shingle, ' ')[1] AS w1, CAST(SUM(c2) AS BIGINT) AS c1
        FROM c2 GROUP BY 1
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c2.c2 * 1000000 // c1.c1) // COUNT(*) AS BIGINT) AS mean_bigram_score
    FROM bg
    JOIN c2 USING (shingle)
    JOIN c1 ON c1.w1 = string_split(shingle, ' ')[1]
    GROUP BY bg.doc_id
    """,
    doc="Bigram-LM document quality score: per-doc mean MLE conditional "
    "probability P(w2|w1) = c(w1 w2)/c(w1) over the corpus, in integer "
    "micros (c2*1e6 DIV c1, then DIV by bigram count) — the 2-gram "
    "upgrade of text_unigram_doc_score and the log-free skeleton of "
    "perplexity-based filtering (docs whose word transitions are "
    "unusual for the corpus score low). Bigrams come from the same "
    "zip_with shingle machinery as dedup; both count tables are "
    "vocab-scale aggregations broadcast back onto the bigram stream, "
    "so corpus text never shuffles. All-integer: bit-exact in any "
    "engine.",
    tags=("pipeline", "text"),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions.textfn import tokens

    docs = _t(spark, sf_dir)["documents"]
    # NON-distinct bigrams (word_shingles dedups — an LM counts every
    # occurrence): zip tokens with their left-shifted tail; the last
    # token pairs with the null pad and drops out.
    toks = tokens(F.col("text"))
    grams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    bg = (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .filter(F.col("shingle").contains(" "))
        .filter(~F.col("shingle").startswith(" "))
        .filter(~F.col("shingle").endswith(" "))
    )
    c2 = bg.groupBy("shingle").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.select(
        F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)).alias("w1"), "c2"
    ).groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        bg.join(F.broadcast(c2), "shingle")
        .withColumn("w1", F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(c1), "w1")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr("c2 * 1000000L DIV c1")).alias("_s"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long"),
            F.expr("_s DIV n_bigrams").cast("long").alias("mean_bigram_score"),
        )
    )


def _bigram_xent_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    c2_ln = duckdb_ln_select(
        "SELECT shingle, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY shingle",
        "c2",
        "_ln2",
    )
    c1_ln = duckdb_ln_select(
        "SELECT string_split(shingle, ' ')[1] AS w1,"
        " CAST(SUM(c2) AS BIGINT) AS c1 FROM c2t GROUP BY 1",
        "c1",
        "_ln1",
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), bg AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       CASE WHEN len(tok) < 2 THEN [] ELSE range(1, len(tok)) END,
                       i -> tok[i] || ' ' || tok[i + 1])) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> '' AND shingle <> ' '
    ), c2t AS ({c2_ln}
    ), c1t AS ({c1_ln})
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c1t._ln1 - c2t._ln2) // COUNT(*) AS BIGINT)
               AS bigram_ce_micros
    FROM bg
    JOIN c2t USING (shingle)
    JOIN c1t ON c1t.w1 = string_split(shingle, ' ')[1]
    GROUP BY bg.doc_id
    """


@register(
    "text_bigram_cross_entropy",
    oracle=_bigram_xent_oracle(),
    doc="Per-document BIGRAM cross-entropy vs the corpus 2-gram MLE "
    "model, exact in nat-micros: CE2 = -(1/B) sum over bigram "
    "occurrences of ln P(w2|w1) = (sum (ln c1 - ln c2)) DIV B — the "
    "2-gram-order completion of text_cross_entropy_lm and the exact "
    "form of text_bigram_lm_score's log-free skeleton (docs whose "
    "word TRANSITIONS are unusual score high; every term >= 0 since "
    "c1 = sum of its c2's). ln runs at bigram-vocabulary grain (the "
    "c2/c1 count tables, broadcast back), so per-occurrence work is "
    "one subtraction; corpus text never shuffles beyond the bigram "
    "counting aggregate.",
    tags=("pipeline", "text", "stats"),
)
def text_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions.fixedpoint import with_ln_micros
    from bo_sql_spark.functions.textfn import tokens

    docs = _t(spark, sf_dir)["documents"]
    toks = tokens(F.col("text"))
    grams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    bg = (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .filter(F.col("shingle").contains(" "))
        .filter(~F.col("shingle").startswith(" "))
        .filter(~F.col("shingle").endswith(" "))
    )
    c2 = with_ln_micros(
        bg.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("c2")),
        "c2",
        "_ln2",
    )
    c1 = with_ln_micros(
        c2.select(
            F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)).alias("w1"),
            "c2",
        )
        .groupBy("w1")
        .agg(F.sum("c2").cast("long").alias("c1")),
        "c1",
        "_ln1",
    )
    scored = (
        bg.join(F.broadcast(c2.select("shingle", "_ln2")), "shingle")
        .withColumn("w1", F.split_part(F.col("shingle"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(c1.select("w1", "_ln1")), "w1")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.expr("_ln1 - _ln2")).cast("long").alias("_s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("_s DIV n_bigrams").cast("long").alias("bigram_ce_micros"),
        )
    )


@register(
    "stream_heavy_hitters",
    oracle="""
    WITH n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events
    ), c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, cnt
    FROM c, n WHERE cnt * 125 >= total
    """,
    doc="STREAMING heavy hitters (operators/heavy_hitters.py + "
    "foreachBatch): each microbatch's Misra-Gries summary (m=256 "
    "counters, Arrow-batched) appends to a candidate store — MG "
    "summaries are mergeable, and a key with global ratio >= 1/125 "
    "must exceed that ratio in >= 1 microbatch (pigeonhole over "
    "batches), so the drained candidate union is a superset under ANY "
    "batching; a final exact recount of the bounded candidate set "
    "against the full table yields the same layout- and batching-"
    "independent exact answer as the batch twin text_heavy_hitters — "
    "the lambda shape: sketch on arrival, verify exactly at serve "
    "time. availableNow drain; the multi-batch path inherits the "
    "batch-partition proofs (tests pin exactness across layouts).",
    tags=("pipeline", "streaming", "approx"),
)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators.heavy_hitters import misra_gries_candidates

    events = _t(spark, sf_dir)["events"]
    root = tempfile.mkdtemp(prefix="bosql_hh_stream_")
    store = os.path.join(root, "candidates")

    stream = (
        spark.readStream.schema(events.schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        cand = misra_gries_candidates(
            batch_df.select(F.col("user_id").cast("string").alias("term")),
            "term",
            m=256,
        )
        cand.write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from bo_sql_spark.operators.heavy_hitters import recount_candidates

    cand_keys = (
        spark.read.parquet(store)
        .select(F.col("term").cast("long").alias("user_id"))
        .distinct()
    )
    return recount_candidates(events, cand_keys, "user_id", 125).select(
        F.col("user_id").cast("long"), "cnt"
    )


@register(
    "dedup_survivors_best",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.4
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT src, src FROM edges
            UNION
            SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
        ) SELECT * FROM r
    ), canon AS (
        SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    ), q AS (
        SELECT doc_id,
               CAST(LEAST(999,
                   1000 * length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                   // GREATEST(1, length(text))) AS BIGINT) AS w
        FROM documents WHERE doc_id < 150
    ), member AS (
        SELECT q.doc_id, COALESCE(canon.cluster_id, q.doc_id) AS cluster_id, q.w
        FROM q LEFT JOIN canon ON q.doc_id = canon.node
    ), best AS (
        SELECT cluster_id,
               (MIN({'nw': -w, 'id': doc_id})).id AS keeper
        FROM member GROUP BY cluster_id
    )
    SELECT CAST(m.doc_id AS BIGINT) AS doc_id, m.w AS quality_permille
    FROM member m JOIN best b
      ON m.cluster_id = b.cluster_id AND m.doc_id = b.keeper
    """,
    doc="Keep-BEST dedup survivors: same near-dup clusters as "
    "dedup_survivors, but the canonical doc per cluster is the "
    "HIGHEST-quality member (integer alpha-permille signal, ties -> "
    "min doc_id via lexicographic struct-min over (-quality, id)) — "
    "what pipelines actually ship when duplicates differ in cleanliness "
    "(a clean copy should win over a boilerplate-wrapped one), vs the "
    "min-id convention that picks by arrival accident. Plan adds one "
    "per-cluster argmax over the (id, cluster, weight) table — "
    "group-key shuffle only, text never moves after scoring.",
    tags=("pipeline", "dedup", "iterative"),
)
def dedup_survivors_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    docs = t["documents"].filter(F.col("doc_id") < 150)
    alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    w = F.least(
        F.lit(999).cast("long"),
        F.floor(
            F.lit(1000) * alpha / F.greatest(F.lit(1), F.length("text"))
        ).cast("long"),
    )
    q = docs.select("doc_id", w.alias("w"))
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    canon = D.connected_components(pairs)
    member = (
        q.join(canon, q.doc_id == canon.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            "w",
        )
    )
    best = member.groupBy("cluster_id").agg(
        F.min(F.struct((-F.col("w")).alias("nw"), F.col("doc_id").alias("id")))[
            "id"
        ].alias("keeper")
    )
    return (
        member.join(
            best,
            (member.cluster_id == best.cluster_id)
            & (member.doc_id == best.keeper),
        )
        .select(F.col("doc_id"), F.col("w").alias("quality_permille"))
    )


@register(
    "orc_roundtrip_docs",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(md5(text)) AS min_md5,
           MAX(md5(text)) AS max_md5
    FROM documents
    GROUP BY lang
    """,
    doc="ORC ingest contract: the corpus round-trips through Spark's "
    "native ORC source written PARTITIONED BY lang (hive layout), and "
    "the per-lang stats + content checksums (min/max md5 of text) "
    "must equal reading the parquet directly — any encoding loss, "
    "row duplication, or partition-column corruption breaks the hash. "
    "A second columnar format beside parquet (+ CSV/JSONL line "
    "formats); partition pruning on the lang directory is pinned in "
    "tests/test_plans.py. Beyond-reference surface: the reference "
    "loads CSV only (src/storage/csv_loader.cpp).",
    tags=("pipeline", "source"),
)
def orc_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    t = _t(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="bosql_orc_") + "/docs"
    t["documents"].write.mode("overwrite").partitionBy("lang").orc(path)
    loaded = spark.read.orc(path)
    return loaded.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min(F.md5("text")).alias("min_md5"),
        F.max(F.md5("text")).alias("max_md5"),
    )


_CM_D, _CM_W, _CM_TOPK = 4, 256, 20
_CM_TOK = (
    "SELECT unnest(string_split(trim(regexp_replace(lower(text), "
    "'\\s+', ' ', 'g')), ' ')) AS k FROM documents WHERE text IS NOT NULL"
)
_CM_BUCKET = (
    "CAST(CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || k), 1, 15))"
    f" AS BIGINT) % {_CM_W} AS BIGINT)"
)


_BLOOM_M = 380928  # 62 * 6144 words; ~16x the build shingle count -> sub-% FPR
_BLOOM_K = 4


def _bloom_oracle() -> str:
    from bo_sql_spark.operators.bloom import WORD_BITS
    from bo_sql_spark.operators.dedup import _PMH_P, _pmh_ab

    def sh_cte(pred: str, name: str) -> str:
        return f"""{name}tok AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents WHERE ({pred}) AND text IS NOT NULL
    ), {name} AS (
        SELECT DISTINCT unnest(list_filter(list_distinct(list_transform(
            range(1, greatest(len(tok) - 1, 2)),
            i -> array_to_string(tok[i:i+2], ' '))), s -> s <> '')) AS shingle
        FROM {name}tok
    )"""

    pos_rows = lambda src: "\n        UNION ALL ".join(  # noqa: E731
        f"SELECT shingle, ((hb * {a} + {b}) % {_PMH_P}) % {_BLOOM_M} AS pos"
        f" FROM {src}"
        for a, b in (_pmh_ab(i) for i in range(_BLOOM_K))
    )
    return f"""
    WITH {sh_cte("doc_id < 400", "bbsh")}, {sh_cte("doc_id >= 400 AND doc_id < 450", "bpsh")},
    bbhb AS (
        SELECT shingle,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {_PMH_P} AS hb
        FROM bbsh
    ), bphb AS (
        SELECT shingle,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {_PMH_P} AS hb
        FROM bpsh
    ), bbpos AS (
        {pos_rows("bbhb")}
    ), bwords AS (
        SELECT pos // {WORD_BITS} AS word,
               bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INT)) AS bits
        FROM bbpos GROUP BY 1
    ), bppos AS (
        {pos_rows("bphb")}
    ), bprobe AS (
        SELECT p.shingle,
               SUM(CASE WHEN w.bits IS NOT NULL
                        AND (w.bits & (1::BIGINT << CAST(p.pos % {WORD_BITS} AS INT))) <> 0
                   THEN 1 ELSE 0 END) AS n_set
        FROM bppos p LEFT JOIN bwords w ON p.pos // {WORD_BITS} = w.word
        GROUP BY p.shingle
    )
    SELECT shingle,
           CAST(CASE WHEN n_set = {_BLOOM_K} THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit,
           CAST(CASE WHEN shingle IN (SELECT shingle FROM bbsh) THEN 1 ELSE 0 END
                AS BIGINT) AS true_member
    FROM bprobe
    """


@register(
    "sketch_bloom_probe",
    oracle=_bloom_oracle(),
    doc="Portable BLOOM FILTER sketch (operators/bloom.py): shingles "
    "of docs < 400 folded into a 380928-bit / 4-hash filter "
    "(62-bit words — 1 << 63 is a DuckDB overflow error and a Spark "
    "sign flip; the 2-bit waste buys bit-identical replays), probed "
    "with the shingles of docs 400-449; output carries bloom_hit AND "
    "true_member per probe key so the false-positive set is part of "
    "the graded artifact — with a deterministic hash family, WHICH "
    "keys collide is replayable, not a statistical claim (and no "
    "false negative can exist, asserted in tests). The 100 TB use is "
    "broadcast-a-filter-not-the-set: the filter is m/62 rows (~48 KB) "
    "vs the full key set, with the exact verify only on probable "
    "hits; build is one bit_or groupBy (mergeable: filters of corpus "
    "shards OR together, unit-pinned).",
    tags=("pipeline", "sketch"),
)
def sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import bloom as B

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())

    def sh(df):
        return (
            df.select(F.explode(word_shingles(F.col("text"), 3)).alias("shingle"))
            .filter(F.col("shingle") != "")
            .distinct()
        )

    build = sh(docs.filter(F.col("doc_id") < 400))
    probes = sh(docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)))
    filt = B.bloom_build(build, "shingle", _BLOOM_M, _BLOOM_K)
    hits = B.bloom_probe(filt, probes, "shingle", _BLOOM_M, _BLOOM_K)
    member = probes.join(
        build.withColumn("_m", F.lit(1)), "shingle", "left"
    ).select("shingle", F.coalesce(F.col("_m"), F.lit(0)).cast("long").alias("true_member"))
    return hits.join(member, "shingle").select("shingle", "bloom_hit", "true_member")


@register(
    "stream_bloom_ingest",
    oracle=_bloom_oracle(),
    doc="STREAMING Bloom build: each microbatch folds its shingles "
    "into (word, bits) rows appended to a store; serving bit_ors the "
    "store per word and probes exactly like the batch form — Bloom "
    "filters are mergeable (OR), so this replays sketch_bloom_probe's "
    "oracle VERBATIM regardless of batching (sketch-of-union == "
    "OR-of-sketches, same statement stream_count_min makes for CM). "
    "State is O(m/62) words per batch, never keys.",
    tags=("pipeline", "streaming", "sketch"),
)
def stream_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import bloom as B

    doc_schema = _t(spark, sf_dir)["documents"].schema
    root = tempfile.mkdtemp(prefix="bosql_bloom_stream_")
    store = os.path.join(root, "words")

    stream = (
        spark.readStream.schema(doc_schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def sh(df):
        return (
            df.filter(F.col("text").isNotNull())
            .select(F.explode(word_shingles(F.col("text"), 3)).alias("shingle"))
            .filter(F.col("shingle") != "")
            .distinct()
        )

    def ingest(batch_df, batch_id):
        B.bloom_build(
            sh(batch_df.filter(F.col("doc_id") < 400)),
            "shingle",
            _BLOOM_M,
            _BLOOM_K,
        ).write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    filt = (
        spark.read.parquet(store)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    build = sh(docs.filter(F.col("doc_id") < 400))
    probes = sh(docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)))
    hits = B.bloom_probe(filt, probes, "shingle", _BLOOM_M, _BLOOM_K)
    member = probes.join(
        build.withColumn("_m", F.lit(1)), "shingle", "left"
    ).select(
        "shingle", F.coalesce(F.col("_m"), F.lit(0)).cast("long").alias("true_member")
    )
    return hits.join(member, "shingle").select("shingle", "bloom_hit", "true_member")


@register(
    "sketch_count_min_grid",
    oracle=f"""
    WITH tok AS ({_CM_TOK}),
    cells AS (
        SELECT r, {_CM_BUCKET} AS bucket
        FROM tok CROSS JOIN (SELECT unnest(range({_CM_D})) AS r) rr
    )
    SELECT CAST(r AS BIGINT) AS r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY r, bucket
    """,
    doc="Count-Min sketch grid (operators/heavy_hitters.py:"
    "count_min_table; Cormode & Muthukrishnan 2005) over the corpus "
    "token stream: a 4x256 counter grid — O(d*w) memory regardless of "
    "distinct-key count, built by ONE map-combinable groupBy over "
    "(r, bucket) int pairs (each partition pre-aggregates its own "
    "grid; the shuffle carries <= d*w rows per task), and grids MERGE "
    "by cellwise addition (sketch of a union == sum of sketches — the "
    "per-shard rollup story). Unlike HLL/GK this sketch is fully "
    "DETERMINISTIC given its hash family (md5-prefix mod w, "
    "bit-portable), so the oracle replays the ENTIRE grid. Completes "
    "the sketch suite: MG heavy hitters (exact-recount), GK quantiles, "
    "HLL NDV, CM frequencies.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_count_min_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import tokens
    from bo_sql_spark.operators import heavy_hitters as HH
    from bo_sql_spark.parallel import spread_scan

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    # r14-opt: parallel tokenize + per-token d-row md5 map (§2.5)
    toks = spread_scan(docs, "doc_id").select(
        F.explode(tokens(F.col("text"))).alias("k")
    )
    return HH.count_min_table(toks, "k", depth=_CM_D, width=_CM_W)


@register(
    "sketch_count_min_estimates",
    oracle=f"""
    WITH tok AS ({_CM_TOK}),
    exact AS (
        SELECT k AS key, CAST(COUNT(*) AS BIGINT) AS exact
        FROM tok GROUP BY k ORDER BY exact DESC, key LIMIT {_CM_TOPK}
    ),
    cells AS (
        SELECT r, {_CM_BUCKET} AS bucket
        FROM tok CROSS JOIN (SELECT unnest(range({_CM_D})) AS r) rr
    ),
    grid AS (
        SELECT r, bucket, COUNT(*) AS cnt FROM cells GROUP BY r, bucket
    ),
    probes AS (
        SELECT key, exact, r,
               CAST(CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || key), 1, 15))
                    AS BIGINT) % {_CM_W} AS BIGINT) AS bucket
        FROM exact CROSS JOIN (SELECT unnest(range({_CM_D})) AS r) rr
    )
    SELECT key, exact, CAST(MIN(cnt) AS BIGINT) AS cm_estimate
    FROM probes JOIN grid USING (r, bucket)
    GROUP BY key, exact
    """,
    doc="Count-Min point queries vs ground truth: the corpus's top-20 "
    "tokens probed against the 4x256 grid — estimate = min over rows "
    "of grid[r][h_r(key)], which can only OVERCOUNT (collisions add, "
    "never subtract), so cm_estimate >= exact row-for-row is the CMS "
    "guarantee and the oracle checks the estimates exactly (the grid "
    "is deterministic; only its ERROR is probabilistic). Probe side "
    "is 80 broadcast cells onto the 1024-row grid.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import tokens
    from bo_sql_spark.operators import heavy_hitters as HH

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("k"))
    return HH.count_min_estimates(
        toks, "k", depth=_CM_D, width=_CM_W, top_k=_CM_TOPK
    )


@register(
    "stream_count_min",
    oracle=f"""
    WITH tok AS ({_CM_TOK}),
    cells AS (
        SELECT r, {_CM_BUCKET} AS bucket
        FROM tok CROSS JOIN (SELECT unnest(range({_CM_D})) AS r) rr
    )
    SELECT CAST(r AS BIGINT) AS r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cells GROUP BY r, bucket
    """,
    doc="STREAMING Count-Min (foreachBatch): each microbatch's 4x256 "
    "grid appends to a store and the drained store SUMS cellwise into "
    "the corpus grid — byte-identical to the batch sketch "
    "(sketch_count_min_grid's oracle verbatim), because sketch of a "
    "union == sum of sketches. That mergeability is the whole "
    "operational story: per-microbatch (or per-day, per-shard) grids "
    "of d*w BIGINTs roll up with a groupBy, so frequency monitoring "
    "over an unbounded stream costs O(d*w) state and zero rescans — "
    "the streaming member of the sketch family beside "
    "stream_heavy_hitters' sketch-then-exact-recount shape.",
    tags=("pipeline", "streaming", "sketch"),
)
def stream_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.functions import tokens
    from bo_sql_spark.operators import heavy_hitters as HH

    docs = _t(spark, sf_dir)["documents"]
    root = tempfile.mkdtemp(prefix="bosql_cm_stream_")
    store = os.path.join(root, "grids")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        toks = batch_df.filter(F.col("text").isNotNull()).select(
            F.explode(tokens(F.col("text"))).alias("k")
        )
        HH.count_min_table(toks, "k", depth=_CM_D, width=_CM_W).write.mode(
            "append"
        ).parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(store)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


_HLL_P = 9
_HLL_M = 1 << _HLL_P
_HLL_ALPHA_U = round(0.7213 / (1 + 1.079 / _HLL_M) * 1e6)  # 719783
_HLL_NUMER = _HLL_ALPHA_U * _HLL_M * _HLL_M * (1 << 33)
_HLL_HASH = (
    "CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)
_HLL_REG = f"""
        SELECT h % {_HLL_M} AS bucket,
               MAX(33 - length(ltrim(bin((h // {_HLL_M}) % 4294967296),
                                     '0'))) AS M
        FROM keyed GROUP BY h % {_HLL_M}
"""
_HLL_SUM = f"""
        SELECT COUNT(*) AS ne,
               SUM(CAST(1 AS BIGINT) << (33 - M))
                   + ({_HLL_M} - COUNT(*)) * 8589934592 AS t
        FROM reg
"""


@register(
    "sketch_hll_distinct",
    oracle=f"""
    WITH keyed AS (
        SELECT {_HLL_HASH} AS h
        FROM lineitem WHERE l_orderkey IS NOT NULL
    ), reg AS ({_HLL_REG}
    ), s AS ({_HLL_SUM}
    ), e AS (
        SELECT COUNT(DISTINCT l_orderkey) AS ex
        FROM lineitem WHERE l_orderkey IS NOT NULL
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           CAST(ne AS BIGINT) AS n_nonempty,
           CAST(t AS BIGINT) AS sum_scaled,
           CAST(CAST('{_HLL_NUMER}' AS HUGEINT) // (t * 1000000)
                AS BIGINT) AS hll_estimate,
           CAST(ex AS BIGINT) AS exact_distinct,
           CAST(abs(CAST('{_HLL_NUMER}' AS HUGEINT) // (t * 1000000) - ex)
                * 1000 // ex AS BIGINT) AS err_permille
    FROM s, e
    """,
    doc="Portable HyperLogLog NDV (operators/heavy_hitters.py:"
    "hll_distinct; Flajolet et al. 2007) over lineitem.l_orderkey, "
    "m=512 registers: ONE map-combinable groupBy on the md5-prefix "
    "hash's low 9 bits (partials pre-max per partition; <= m rows "
    "per task shuffle) — O(m) memory at any distinct count, where "
    "exact countDistinct shuffles the key space. Every bit is "
    "portable arithmetic (bucket = low bits, rho via conv-to-binary "
    "bit length, all-integer estimator with the alpha*m^2*2^33 "
    "constant as a decimal literal, one integral divide), so unlike "
    "approx_count_distinct (HLL++, engine-private, rows-only panel "
    "row) the oracle replays the REGISTERS AND THE ESTIMATE exactly "
    "— the sketch is approximate, its computation is exact. The "
    "exact_distinct / err_permille columns are demo certification "
    "(3.2% here, expected 1.04/sqrt(512) = 4.6%); production runs "
    "the sketch INSTEAD of the exact scan.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import heavy_hitters as HH

    li = _t(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey").isNotNull())
    est = HH.hll_distinct(li, "l_orderkey", p=_HLL_P)
    exact = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(exact).select(
        "m",
        "n_nonempty",
        "sum_scaled",
        "hll_estimate",
        "exact_distinct",
        F.expr(
            "abs(hll_estimate - exact_distinct) * 1000 DIV exact_distinct"
        ).alias("err_permille"),
    )


@register(
    "sketch_hll_merge",
    oracle=f"""
    WITH src AS (
        SELECT l_orderkey, l_linenumber % 2 AS shard
        FROM lineitem WHERE l_orderkey IS NOT NULL
    ), hashed AS (
        SELECT shard,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM src
    ), sreg AS (
        SELECT shard, h % {_HLL_M} AS bucket,
               MAX(33 - length(ltrim(bin((h // {_HLL_M}) % 4294967296),
                                     '0'))) AS M
        FROM hashed GROUP BY shard, h % {_HLL_M}
    ), reg AS (
        SELECT bucket, MAX(M) AS M FROM sreg GROUP BY bucket
    ), s AS ({_HLL_SUM}
    ), keyed AS (
        SELECT h FROM hashed
    ), dreg AS (
        SELECT h % {_HLL_M} AS bucket,
               MAX(33 - length(ltrim(bin((h // {_HLL_M}) % 4294967296),
                                     '0'))) AS M
        FROM keyed GROUP BY h % {_HLL_M}
    ), ds AS (
        SELECT COUNT(*) AS ne,
               SUM(CAST(1 AS BIGINT) << (33 - M))
                   + ({_HLL_M} - COUNT(*)) * 8589934592 AS t
        FROM dreg
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           CAST(s.ne AS BIGINT) AS n_nonempty,
           CAST(s.t AS BIGINT) AS sum_scaled,
           CAST(CAST('{_HLL_NUMER}' AS HUGEINT) // (s.t * 1000000)
                AS BIGINT) AS hll_estimate,
           CAST(CAST('{_HLL_NUMER}' AS HUGEINT) // (ds.t * 1000000)
                AS BIGINT) AS direct_estimate,
           CAST(CASE WHEN s.t = ds.t THEN 1 ELSE 0 END AS BIGINT)
               AS merged_equals_direct
    FROM s, ds
    """,
    doc="HLL register MERGE (cellwise MAX) proven equal to the "
    "direct sketch, in one query: lineitem split into two "
    "OVERLAPPING shards by l_linenumber parity (same orderkeys "
    "appear in both — union semantics, not disjoint partitioning), "
    "per-shard register tables max-merged, then summarized. "
    "sum_scaled of the merge equals the direct build's (flag "
    "asserted 1 by the oracle), because max of maxes is max — the "
    "per-day/per-shard NDV rollup story: register tables of m "
    "BIGINTs union with a groupBy-max instead of rescanning 100 TB. "
    "Mirrors stream_count_min's sum-mergeable grid with the "
    "max-mergeable member of the sketch family.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import heavy_hitters as HH

    li = _t(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey").isNotNull())
    s0 = li.filter(F.col("l_linenumber") % 2 == 0)
    s1 = li.filter(F.col("l_linenumber") % 2 == 1)
    merged = (
        HH.hll_registers(s0, "l_orderkey", p=_HLL_P)
        .unionByName(HH.hll_registers(s1, "l_orderkey", p=_HLL_P))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    msum = HH.hll_summary(merged, p=_HLL_P)
    dsum = HH.hll_distinct(li, "l_orderkey", p=_HLL_P).select(
        F.col("hll_estimate").alias("direct_estimate"),
        F.col("sum_scaled").alias("_direct_sum"),
    )
    return msum.crossJoin(dsum).select(
        "m",
        "n_nonempty",
        "sum_scaled",
        "hll_estimate",
        "direct_estimate",
        (F.col("sum_scaled") == F.col("_direct_sum"))
        .cast("long")
        .alias("merged_equals_direct"),
    )


_HLL7_M = 128
_HLL7_ALPHA_U = round(0.7213 / (1 + 1.079 / _HLL7_M) * 1e6)
_HLL7_NUMER = _HLL7_ALPHA_U * _HLL7_M * _HLL7_M * (1 << 33)


@register(
    "sketch_hll_by_group",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderpriority,
               CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM orders WHERE o_custkey IS NOT NULL
    ), reg AS (
        SELECT o_orderpriority, h % {_HLL7_M} AS bucket,
               MAX(33 - length(ltrim(bin((h // {_HLL7_M}) % 4294967296),
                                     '0'))) AS M
        FROM keyed GROUP BY o_orderpriority, h % {_HLL7_M}
    ), s AS (
        SELECT o_orderpriority, COUNT(*) AS ne,
               SUM(CAST(1 AS BIGINT) << (33 - M))
                   + ({_HLL7_M} - COUNT(*)) * 8589934592 AS t
        FROM reg GROUP BY o_orderpriority
    ), e AS (
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS ex
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_orderpriority
    )
    SELECT s.o_orderpriority,
           CAST({_HLL7_M} AS BIGINT) AS m,
           CAST(ne AS BIGINT) AS n_nonempty,
           CAST(t AS BIGINT) AS sum_scaled,
           CAST(CAST('{_HLL7_NUMER}' AS HUGEINT) // (t * 1000000)
                AS BIGINT) AS hll_estimate,
           CAST(ex AS BIGINT) AS exact_distinct,
           CAST(abs(CAST('{_HLL7_NUMER}' AS HUGEINT) // (t * 1000000) - ex)
                * 1000 // ex AS BIGINT) AS err_permille
    FROM s JOIN e ON s.o_orderpriority = e.o_orderpriority
    """,
    doc="GROUP BY form of the portable HLL (operators/"
    "heavy_hitters.py:hll_registers_by): distinct customers per "
    "order priority in ONE pass over orders, m=128 registers per "
    "group — the per-source/per-day NDV monitor a corpus pipeline "
    "runs where exact per-group countDistinct would shuffle the full "
    "key space per group. Same all-integer portable arithmetic as "
    "sketch_hll_distinct (the oracle replays registers and estimates "
    "per group); exact/err columns are demo certification. m=128 "
    "keeps the per-group raw regime (n >= 2.5m = 320) at sf0.01's "
    "~1300 distinct custkeys per priority; expected sigma "
    "1.04/sqrt(128) = 9.2%.",
    tags=("pipeline", "sketch", "aggregate"),
)
def sketch_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import heavy_hitters as HH

    orders = _t(spark, sf_dir)["orders"].filter(F.col("o_custkey").isNotNull())
    reg = HH.hll_registers_by(orders, "o_custkey", ["o_orderpriority"], p=7)
    est = HH.hll_summary_by(reg, ["o_orderpriority"], p=7)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "m",
        "n_nonempty",
        "sum_scaled",
        "hll_estimate",
        "exact_distinct",
        F.expr(
            "abs(hll_estimate - exact_distinct) * 1000 DIV exact_distinct"
        ).alias("err_permille"),
    )


@register(
    "stream_hll_distinct",
    oracle=f"""
    WITH keyed AS (
        SELECT {_HLL_HASH} AS h
        FROM lineitem WHERE l_orderkey IS NOT NULL
    ), reg AS ({_HLL_REG}
    ), s AS ({_HLL_SUM}
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           CAST(ne AS BIGINT) AS n_nonempty,
           CAST(t AS BIGINT) AS sum_scaled,
           CAST(CAST('{_HLL_NUMER}' AS HUGEINT) // (t * 1000000)
                AS BIGINT) AS hll_estimate
    FROM s
    """,
    doc="STREAMING HLL (foreachBatch): each microbatch's register "
    "table appends to a store and the drained store MAX-merges by "
    "bucket into the corpus registers — byte-identical summary to "
    "the batch sketch (same all-integer oracle), because HLL of a "
    "union is the max of registers. The unbounded-stream NDV story: "
    "O(m) state per microbatch, zero rescans, and the store rolls up "
    "per-day registers the same way. Max-mergeable twin of "
    "stream_count_min's sum-mergeable grid.",
    tags=("pipeline", "streaming", "sketch"),
)
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators import heavy_hitters as HH

    li = _t(spark, sf_dir)["lineitem"]
    root = tempfile.mkdtemp(prefix="bosql_hll_stream_")
    store = os.path.join(root, "registers")

    stream = (
        spark.readStream.schema(li.schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        HH.hll_registers(batch_df, "l_orderkey", p=_HLL_P).write.mode(
            "append"
        ).parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = (
        spark.read.parquet(store)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    return HH.hll_summary(merged, p=_HLL_P)


@register(
    "corpus_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
    ), new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h
        FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM (
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    ) GROUP BY status
    """,
    doc="Corpus snapshot diff — the dataset-versioning primitive every "
    "recurring crawl/training-data refresh needs: FULL OUTER join of "
    "two snapshot id sets on doc_id comparing content hashes -> "
    "added / removed / changed / unchanged with per-status counts and "
    "id ranges. Content comparison is md5 over the text, so megabyte "
    "docs join as fixed-width rows; the join shuffles each snapshot "
    "once by id (or rides for free if both snapshots are bucketed by "
    "id — sources/bucketed.py). Fixture snapshots: old = doc_id%10!=0, "
    "new = doc_id%7!=0 with every doc_id%5==0 text edited.",
    tags=("pipeline", "dedup"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    old = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            status.alias("status"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


def _zorder_sql() -> str:
    from bo_sql_spark.operators.layout import zorder_code_sql

    return zorder_code_sql("l_partkey % 1024", "l_suppkey % 1024", bits=10)


@register(
    "zorder_locality",
    oracle=f"""
    WITH coded AS (
        SELECT {_zorder_sql()} AS z,
               CAST(l_partkey % 1024 AS BIGINT) AS x,
               CAST(l_suppkey % 1024 AS BIGINT) AS y
        FROM lineitem
    )
    SELECT CAST(z >> 12 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
           CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
    FROM coded GROUP BY bucket
    """,
    doc="Z-order (Morton) layout code (operators/layout.py:zorder_code "
    "— the OPTIMIZE ZORDER BY primitive of lakehouse engines): "
    "interleave the bits of two bucketed keys so that sorting by the "
    "code clusters BOTH dimensions at once. The query groups lineitem "
    "by the code's top 8 bits (= the row groups a z-sorted write "
    "would produce) and emits each bucket's (x, y) spans: every "
    "bucket is a rectangle of at most 64x64 in key space — the "
    "locality that lets min/max row-group stats skip on EITHER "
    "predicate column, proven with real parquet footers in "
    "tests/test_layout.py and measured in SCALE.md. Pure BIGINT "
    "shifts/masks, replayed verbatim by the oracle.",
    tags=("pipeline", "layout"),
)
def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.layout import zorder_code

    li = _t(spark, sf_dir)["lineitem"]
    z = zorder_code(
        F.pmod(F.col("l_partkey"), F.lit(1024)),
        F.pmod(F.col("l_suppkey"), F.lit(1024)),
        bits=10,
    )
    coded = li.select(
        z.alias("z"),
        F.pmod(F.col("l_partkey"), F.lit(1024)).cast("long").alias("x"),
        F.pmod(F.col("l_suppkey"), F.lit(1024)).cast("long").alias("y"),
    )
    return coded.groupBy(
        F.shiftright(F.col("z"), 12).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("x") - F.min("x")).cast("long").alias("x_span"),
        (F.max("y") - F.min("y")).cast("long").alias("y_span"),
    )


@register(
    "similarity_ivfsq_served",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), dims AS (
        SELECT unnest(range(1, 65)) AS pos
    ), stats AS (
        SELECT pos, MIN(v[pos]) AS mn, MAX(v[pos]) AS mx
        FROM vecs CROSS JOIN dims GROUP BY pos
    ), dec AS (
        SELECT vec_id, pos,
               CAST(FLOOR((mn + (CASE WHEN mx = mn THEN 0 ELSE
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR((v[pos] - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)))
               END) * (mx - mn) / 255) * 1000000 + 0.5) AS BIGINT) AS dm
        FROM vecs CROSS JOIN dims JOIN stats USING (pos)
    ), q AS (
        SELECT pos, dm AS qm FROM dec WHERE vec_id = 0
    )
    SELECT d.vec_id, CAST(SUM(d.dm * q.qm) AS BIGINT) AS sq_score
    FROM dec d
    JOIN q USING (pos)
    JOIN assigned a ON a.vec_id = d.vec_id
    WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 0)
      AND d.vec_id <> 0
    GROUP BY d.vec_id
    ORDER BY sq_score DESC, d.vec_id
    LIMIT 10
    """,
    doc="IVF-SQ8 served index (operators/similarity.py:"
    "materialize_ivfsq_index) — the FAISS IVFScalarQuantizer layout: "
    "coarse cells partition the store, 8-bit SQ codes replace vectors "
    "inside it (4x smaller index than IVF-Flat at identical pruning), "
    "decode-and-score runs in the serving scan as exact BIGINT micro "
    "dot products. Fully in-engine serving: the query's OWN index row "
    "supplies both its probe cell (broadcast semi-join on the "
    "partition column -> partition pruning) and its codes — no "
    "assignment recompute, no driver collect. Completes the index "
    "matrix: {Flat, SQ8, PQ} x {one-shot, materialized-served}.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_ivfsq_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = tempfile.mkdtemp(prefix="bosql_ivfsq_") + "/index"
    stats = S.materialize_ivfsq_index(emb, cents, path)
    store = spark.read.parquet(path)
    qrow = store.filter(F.col("vec_id") == 0)
    serve = store.join(
        F.broadcast(qrow.select("cell")), "cell", "left_semi"
    ).filter(F.col("vec_id") != 0)
    return S.sq8_topk(serve, qrow, stats, k=10)


@register(
    "dedup_semantic_stream_ingest",
    oracle="""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), aug AS (
        SELECT vec_id, v FROM base
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(v, (x, i) ->
                   x * (CAST(1 AS DOUBLE)
                        + CAST(0.0002 AS DOUBLE) * ((i - 1 + vec_id) % 5)))
        FROM base WHERE vec_id % 7 = 0
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM base WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM aug CROSS JOIN cents GROUP BY vec_id
    ), dups AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a
        JOIN assigned b ON a.cell = b.cell AND a.vec_id > b.vec_id
        JOIN aug va ON va.vec_id = a.vec_id
        JOIN aug vb ON vb.vec_id = b.vec_id
        WHERE list_dot_product(va.v, vb.v)
              / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))) >= 0.95
    )
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell
    FROM assigned a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)
    """,
    doc="STREAMING SemDeDup (operators/dedup.py:"
    "semantic_dedup_stream_ingest): embeddings arrive as a file "
    "stream; each microbatch is deduped against the assignment store "
    "accumulated so far (batch-internal min-id-wins + store "
    "precedence), its full assignment appends to the cell-partitioned "
    "store, and its survivors append to the output. With ids arriving "
    "in order, the drained survivor set equals ONE batch SemDeDup run "
    "over everything — the oracle replays exactly that batch "
    "computation, so any batching artifact fails the hash; the "
    "multi-batch path is proven == batch in tests/test_streaming.py. "
    "Completes the semantic family: batch, incremental, streaming — "
    "mirroring minhash and IVF. Same planted near-copies as "
    "dedup_semantic.",
    tags=("pipeline", "dedup", "streaming"),
)
def dedup_semantic_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    emb_batch = _t(spark, sf_dir)["embeddings"]
    cents = emb_batch.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    root = tempfile.mkdtemp(prefix="bosql_semdedup_stream_")
    store = os.path.join(root, "assignment")
    survivors = os.path.join(root, "survivors")

    stream = (
        spark.readStream.schema(emb_batch.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        # This query's planting rule (+100000 ids inside the batch) is
        # only order-preserving for a SINGLE microbatch: with a second
        # input file, batch 0's planted ids (100000+) would exceed
        # batch 1's natural ids and break the ids-arrive-in-increasing-
        # order invariant the store-precedence == min-id-wins proof
        # needs. sf dirs hold exactly one embeddings.parquet; guard it
        # rather than rely on that silently. (The multi-batch operator
        # itself is proven == batch in tests/test_streaming.py with
        # monotone ids.)
        if batch_id > 0:
            raise ValueError(
                "dedup_semantic_stream_ingest expects a single-file "
                f"sf dir; got microbatch {batch_id}"
            )
        b = batch_df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        planted = b.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + F.lit(0.0002) * ((i + F.col("vec_id")) % 5).cast("double")
                ),
            ).alias("embedding"),
        )
        D.semantic_dedup_stream_ingest(
            spark,
            b.unionAll(planted),
            cents,
            store,
            survivors,
            threshold=0.95,
            batch_id=batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(survivors).select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )


@register(
    "similarity_sq8_batch_served",
    oracle="""
    WITH cents AS (
        SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 16
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), dims AS (
        SELECT unnest(range(1, 65)) AS pos
    ), stats AS (
        SELECT pos, MIN(v[pos]) AS mn, MAX(v[pos]) AS mx
        FROM vecs CROSS JOIN dims GROUP BY pos
    ), dec AS (
        SELECT vec_id, pos,
               CAST(FLOOR((mn + (CASE WHEN mx = mn THEN 0 ELSE
                   LEAST(255, GREATEST(0,
                       CAST(FLOOR((v[pos] - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)))
               END) * (mx - mn) / 255) * 1000000 + 0.5) AS BIGINT) AS dm
        FROM vecs CROSS JOIN dims JOIN stats USING (pos)
    ), queries AS (
        SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < 2
    ), probes AS (
        SELECT qid, c_id AS cell FROM (
            SELECT q.qid, c.c_id,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_dot_product(q.qv, q.qv)
                                - 2 * list_dot_product(q.qv, c.cv)
                                + list_dot_product(c.cv, c.cv), c.c_id
                   ) AS rn
            FROM queries q CROSS JOIN cents c
        ) WHERE rn <= 2
    ), qdec AS (
        SELECT vec_id AS qid, pos, dm AS qm FROM dec WHERE vec_id < 2
    ), cand AS (
        SELECT p.qid, a.vec_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
        WHERE a.vec_id <> p.qid
    ), scored AS (
        SELECT c.qid, c.vec_id, CAST(SUM(d.dm * q.qm) AS BIGINT) AS sq_score
        FROM cand c
        JOIN dec d ON d.vec_id = c.vec_id
        JOIN qdec q ON q.qid = c.qid AND q.pos = d.pos
        GROUP BY c.qid, c.vec_id
    )
    SELECT qid AS query_id, vec_id, sq_score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY sq_score DESC, vec_id
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """,
    doc="Batch ANN over the IVF-SQ8 store (operators/similarity.py:"
    "ivfsq_batch_topk_served): two queries answered in ONE plan — "
    "per-query in-engine probe selection (window over broadcast "
    "centroids, 2 nearest cells each), queries scalar-quantized "
    "against the same codebook, the broadcast (qid, cell, codes) "
    "probe rows prune the cell-partitioned CODE store, and scoring "
    "decodes to micros for exact BIGINT dots with a per-qid window "
    "top-10. The similarity_ivf_batch_served shape on a 4x smaller "
    "index; nothing is per-query serial, no driver collect.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_sq8_batch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = tempfile.mkdtemp(prefix="bosql_ivfsq_batch_") + "/index"
    stats = S.materialize_ivfsq_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return S.ivfsq_batch_topk_served(
        spark, path, queries, cents, stats, n_probe=2, k=10
    )


@register(
    "similarity_matryoshka_rerank",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pref AS (
        SELECT vec_id, v[1:16] AS p, v FROM vecs
    ), q AS (
        SELECT p AS qp, v AS qv FROM pref WHERE vec_id = 0
    ), cand AS (
        SELECT vec_id
        FROM pref CROSS JOIN q
        WHERE vec_id <> 0
        ORDER BY list_dot_product(p, qp)
              / (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(qp, qp))) DESC,
              vec_id
        LIMIT 100
    )
    SELECT vec_id, ROUND(sim, 6) AS cos_sim
    FROM (
        SELECT e.vec_id,
               list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        FROM cand JOIN vecs e USING (vec_id) CROSS JOIN q
    )
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    doc="Matryoshka-style coarse-to-fine ANN: rank by cosine over the "
    "FIRST 16 dimensions only (MRL-trained embeddings, Kusupati et "
    "al. 2022, order dimensions by information so a prefix is itself "
    "a valid embedding — truncation is a slice, zero compute, unlike "
    "the JL projection twin similarity_rp_rerank), keep the top 100, "
    "exact full-dim rerank on just those via broadcast probe. On "
    "non-MRL synthetic embeddings the prefix is an arbitrary 16-dim "
    "marginal — structurally identical to serving a real MRL model, "
    "which is what the plan shape demonstrates: 4x fewer multiplies "
    "and bytes in the scan stage, TakeOrderedAndProject twice, no "
    "shuffled join.",
    tags=("pipeline", "similarity", "approx"),
)
def similarity_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pref = emb.select(
        "vec_id", F.slice("embedding", 1, 16).alias("p"), "embedding"
    )
    qrow = pref.filter(F.col("vec_id") == 0).select(
        F.col("p").alias("_qp"), F.col("embedding").alias("_qv")
    )
    cand = (
        pref.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow.select("_qp")))
        .select(
            "vec_id", cosine_similarity(F.col("p"), F.col("_qp")).alias("_pcos")
        )
        .orderBy(F.col("_pcos").desc(), "vec_id")
        .limit(100)
        .select("vec_id")
    )
    return (
        emb.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(qrow.select("_qv")))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("_qv")).alias("_cos"),
        )
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("_cos", 6).alias("cos_sim"))
    )


@register(
    "embedding_mean_pool",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, vec_id % 50 AS doc_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), parts AS (
        SELECT doc_id, pos,
               SUM(CAST(FLOOR(v[pos] * 1000000 + 0.5) AS BIGINT)) AS s_micro,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM vecs CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) d
        GROUP BY doc_id, pos
    )
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_chunks,
           array_agg(CAST(FLOOR(s_micro / n + 0.5) AS BIGINT) / 1000000.0
                     ORDER BY pos) AS pooled
    FROM parts GROUP BY doc_id
    """,
    doc="Chunk-to-document embedding MEAN POOLING (vec_id % 50 plays "
    "the chunk->doc map): per-dim means in fixed point — sum "
    "floor(x*1e6+0.5) micros as BIGINT partials, one divide at the "
    "end — so partial-aggregate merge order can never flip a "
    "component (same doctrine as IVF/PQ training means). The RAG-prep "
    "op that collapses a chunk-embedding table into doc vectors: "
    "shuffle rows are (doc, dim, partial) scalars, never vectors, and "
    "the agg is map-side combinable at any corpus size.",
    tags=("pipeline", "similarity"),
)
def embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir)["embeddings"]
    parts = (
        emb.select(
            (F.col("vec_id") % 50).alias("doc_id"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos0", "x"
            ),
        )
        .groupBy("doc_id", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.sum(
                F.floor(F.col("x") * 1_000_000 + F.lit(0.5)).cast("long")
            ).alias("s_micro"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        parts.groupBy("doc_id")
        .agg(
            F.min("n").cast("long").alias("n_chunks"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s_micro", "n"))),
                lambda s: F.floor(s["s_micro"] / s["n"] + F.lit(0.5))
                / F.lit(1_000_000.0),
            ).alias("pooled"),
        )
    )


@register(
    "inference_length_buckets",
    oracle="""
    WITH b AS (
        SELECT doc_id, n_chars, n_chars // 256 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CAST(bucket AS BIGINT) AS bucket,
           CAST((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 32
                AS BIGINT) AS batch_id
    FROM b
    """,
    doc="Length-bucketed INFERENCE BATCHING: docs bucket by "
    "n_chars DIV 256 and take deterministic 32-doc batch ids inside "
    "each bucket — the dynamic-batching prep every LLM inference "
    "fleet runs (similar-length sequences batch together so padding "
    "waste is bounded by the bucket width). One window per bucket "
    "(hash-partitioned by bucket, no global sort); all integer.",
    tags=("pipeline", "training"),
)
def inference_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir)["documents"]
    b = docs.select("doc_id", F.expr("n_chars DIV 256").alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        b.withColumn("rn0", (F.row_number().over(w) - 1).cast("long"))
        .select(
            "doc_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.expr("rn0 DIV 32").alias("batch_id"),
        )
    )


_KSTRAT_SALT = 31
from bo_sql_spark.operators.sampling import portable_hash_sql  # noqa: E402


@register(
    "sample_fixed_k_per_source",
    oracle=f"""
    SELECT doc_id, source
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {portable_hash_sql('doc_id', _KSTRAT_SALT)}, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
    doc="Fixed-k-per-stratum sampling: exactly 20 docs per source, "
    "chosen by ranking each stratum in engine-portable hash order — "
    "the deterministic equivalent of per-group reservoir sampling "
    "(fraction-based stratified sampling can't promise exact group "
    "sizes; eval-set construction and per-domain probes need them). "
    "One window per source (hash-partitioned, WindowGroupLimit trims "
    "to k below the shuffle); membership is a pure function of "
    "(doc_id, salt), reproducible on any engine or retry.",
    tags=("pipeline", "training", "sampling"),
)
def sample_fixed_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bo_sql_spark.operators.sampling import portable_hash

    docs = _t(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy(
        portable_hash("doc_id", _KSTRAT_SALT), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
    )


@register(
    "dedup_duplicate_spans",
    oracle="""
    WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        FROM documents WHERE text IS NOT NULL
    ), w AS (
        SELECT doc_id, i AS pos, md5(substr(norm, i, 40)) AS h
        FROM d, unnest(range(1, GREATEST(length(norm) - 40 + 2, 2))) t(i)
    ), dup AS (
        SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) * 1000
                // COUNT(*) AS BIGINT) AS dup_permille,
           CAST(MIN(CASE WHEN dup.h IS NOT NULL THEN pos END) AS BIGINT) AS first_dup_pos
    FROM w LEFT JOIN dup USING (h)
    GROUP BY w.doc_id
    """,
    doc="EXACT duplicate-span detection (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better'): "
    "every 40-char window of the normalized text is hashed; a window "
    "whose hash appears in MORE THAN ONE doc marks an exact cross-doc "
    "duplicated span. Per doc: window count, duplicated-window count, "
    "integer per-mille, and the first duplicated position — the "
    "span-level signal that catches boilerplate/quotation overlap "
    "document-level dedup can't localize. Shuffle rows are (16-byte "
    "hash, doc, pos) triples with map-side combine; text never "
    "shuffles. The suffix-array formulation of the paper is the "
    "single-machine shape — fixed-length window hashing is its "
    "shuffle-friendly distributed equivalent (winnowing-sample the "
    "positions to cut volume 10-100x at 100 TB; the fingerprint "
    "operator is exactly that sampler).",
    tags=("pipeline", "dedup", "text"),
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import normalize_text

    docs = _t(spark, sf_dir)["documents"]
    L = 40
    # NULL-text docs are dropped EXPLICITLY in both engines: Spark's
    # greatest(NULL,1) is NULL (row vanishes via sequence(NULL)) but
    # DuckDB's GREATEST ignores NULLs (row would survive) — a measured
    # cross-engine divergence this filter removes from the equation.
    d = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", normalize_text(F.col("text")).alias("_norm")
    )
    # length-adaptive in-array window hashing shared with the winnowed
    # sampler (operators/dedup.py:adaptive_window_hashes): substring's
    # per-call codepoint scan makes per-position hashing O(n^2) on
    # long docs; h stays the FULL md5 string the oracle replays
    w = d.select(
        "doc_id",
        F.explode(
            F.expr(D.adaptive_window_hashes(L, "struct({win} AS w, p AS pos)"))
        ).alias("_m"),
    ).select(
        "doc_id", F.col("_m.pos").alias("pos"), F.md5(F.col("_m.w")).alias("h")
    )
    # cross-doc flag = min(doc) != max(doc) over an h-window (==
    # COUNT(DISTINCT doc) > 1), not a dup-set aggregate joined back:
    # the join form consumed `w` twice and re-executed the whole
    # scan->explode->hash pipeline per consumer — measured 3.3x slower
    # at a 10x corpus (same lesson as the winnowed variant; see
    # operators/dedup.py:duplicate_span_stats_winnowed)
    from pyspark.sql.window import Window

    wd = Window.partitionBy("h")
    flagged = w.select(
        "doc_id",
        "pos",
        (F.min("doc_id").over(wd) != F.max("doc_id").over(wd)).alias("_dup"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dup_windows"),
            F.min(F.when(F.col("_dup"), F.col("pos"))).alias("first_dup_pos"),
        )
        .select(
            "doc_id",
            F.col("n_windows").cast("long"),
            F.col("n_dup_windows").cast("long"),
            F.expr("n_dup_windows * 1000 DIV n_windows").alias("dup_permille"),
            F.col("first_dup_pos").cast("long"),
        )
    )


@register(
    "dedup_duplicate_spans_winnowed",
    oracle="""
    WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        FROM documents WHERE text IS NOT NULL
    ), w AS (
        SELECT doc_id, GREATEST(length(norm) - 40 + 1, 1) AS nw, i AS pos,
               CAST(('0x' || substr(md5(substr(norm, i, 40)), 1, 15)) AS BIGINT) AS h
        FROM d, unnest(range(1, GREATEST(length(norm) - 40 + 2, 2))) t(i)
    ), winmin AS (
        SELECT doc_id, nw, pos,
               MIN({'h': h, 'pos': pos}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS m
        FROM w
    ), sel AS (
        SELECT DISTINCT doc_id, nw, m.pos AS pos, m.h AS h
        FROM winmin WHERE pos <= GREATEST(nw - 16 + 1, 1)
    ), dup AS (
        SELECT h FROM sel GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    )
    SELECT sel.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_fingerprints,
           CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) * 1000
                // COUNT(*) AS BIGINT) AS dup_permille,
           CAST(MIN(CASE WHEN dup.h IS NOT NULL THEN pos END) AS BIGINT)
               AS first_dup_pos
    FROM sel LEFT JOIN dup USING (h)
    GROUP BY sel.doc_id
    """,
    doc="PRODUCTION duplicate-span detection (operators/dedup.py:"
    "winnow_fingerprints): winnowing-sampled span fingerprints "
    "(Schleimer et al., SIGMOD'03) instead of the exact twin's "
    "stride-1 windows — per run of 16 consecutive window starts, keep "
    "the position with minimal (hash, pos); expected density 2/17 and "
    "the selection is CONTENT-determined, so any shared span >= "
    "16+40-1 = 55 chars still yields a shared fingerprint in both "
    "docs (the locality guarantee a pos%s stride lacks: a shifted "
    "copy samples different windows). One doc-granular repartition "
    "(1x corpus) co-locates each doc before the explode, so the "
    "sliding min and per-doc dedup run pipelined with NO per-position "
    "shuffle (pinned); only ~12% of positions — fixed-width (id, pos, "
    "60-bit md5-prefix BIGINT) rows, portable to the oracle — reach "
    "the groupBy(h), bounding that shuffle at ~corpus_bytes*2/(w+1) "
    "instead of the exact twin's ~50x corpus bytes. No false "
    "positives vs the exact query (every fingerprint is a real "
    "window); dedup_duplicate_spans stays registered as the "
    "oracle-checked ground-truth twin, and at sf0.01 the winnowed "
    "form flags the identical 47-doc set (recall floor pinned in "
    "tests/test_operators.py).",
    tags=("pipeline", "dedup", "text"),
)
def dedup_duplicate_spans_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    return D.duplicate_span_stats_winnowed(
        docs, id_col="doc_id", text_col="text", span_len=40, winnow_w=16
    )


@register(
    "stream_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents
    ), sh AS (
        SELECT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(tok) - 5 + 2, 2)),
                       i -> array_to_string(tok[i:i+4], ' ')))) AS shingle
            FROM toks
        )
        WHERE shingle IS NOT NULL AND shingle <> ''
    ), contaminated AS (
        SELECT DISTINCT s.doc_id
        FROM sh s
        JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 25 = 0) e
          USING (shingle)
        WHERE s.doc_id % 25 <> 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 25 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="STREAMING decontamination — drop contaminated docs AT INGEST: "
    "documents arrive as a file stream, the eval set's distinct "
    "5-word shingles are computed once from the batch table and "
    "broadcast into every microbatch's LEFT ANTI join (per-batch cost "
    "is O(batch), eval shingles are fixed), and clean docs append to "
    "the landing store. The in-flight form of decontaminate_survivors "
    "— a training pipeline that filters at ingest never pays a "
    "full-corpus scrub later. Per-doc membership is independent of "
    "batching, so the drained store must equal the batch query "
    "exactly; same oracle, different execution path (the pattern the "
    "streaming window queries established).",
    tags=("pipeline", "dedup", "training", "streaming"),
)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    docs_batch = _t(spark, sf_dir)["documents"]
    evalset = docs_batch.filter(F.col("doc_id") % 25 == 0)
    root = tempfile.mkdtemp(prefix="bosql_decontam_stream_")
    out = os.path.join(root, "clean")

    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        train = batch_df.filter(F.col("doc_id") % 25 != 0)
        clean, _contaminated = D.decontaminate(train, evalset)
        clean.select("doc_id", "source").write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct estimation WITH set operations
# ---------------------------------------------------------------------------

_KMV_K = 256  # per-group sketch size; rel. error ~ 1/sqrt(k) ~ 6%
_KMV_OK = 512  # overlap-query sketch size
_KMV_SHARDS = 32


def _kmv_sh_cte(pred: str, name: str, keep_lang: bool = False) -> str:
    """DuckDB CTE replaying word_shingles(text, 3) under ``pred`` —
    same tokenization/slice construction as the Bloom oracle."""
    lang = "lang, " if keep_lang else ""
    return f"""{name}tok AS (
        SELECT {lang}string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents WHERE ({pred}) AND text IS NOT NULL
    ), {name} AS (
        SELECT DISTINCT {lang}unnest(list_filter(list_distinct(list_transform(
            range(1, greatest(len(tok) - 1, 2)),
            i -> array_to_string(tok[i:i+2], ' '))), s -> s <> '')) AS shingle
        FROM {name}tok
    )"""


def _kmv_distinct_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    k = _KMV_K
    return f"""
    WITH {_kmv_sh_cte("TRUE", "kml", keep_lang=True)},
    kmh AS (
        SELECT DISTINCT lang,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {KMV_P} AS h
        FROM kml
    ), kmr AS (
        SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS r
        FROM kmh
    ), kmagg AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS mx
        FROM kmr WHERE r <= {k} GROUP BY lang
    ), kmex AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_distinct
        FROM kmh GROUP BY lang
    )
    SELECT a.lang, a.n_kept,
           CAST(CASE WHEN a.n_kept < {k} THEN {KMV_P} ELSE a.mx END AS BIGINT) AS theta,
           CAST(CASE WHEN a.n_kept < {k} THEN a.n_kept
                ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // a.mx END AS BIGINT) AS est_distinct,
           e.exact_distinct
    FROM kmagg a JOIN kmex e USING (lang)
    """


@register(
    "sketch_kmv_distinct",
    oracle=_kmv_distinct_oracle(),
    doc="Portable KMV / theta sketch (operators/kmv.py; Bar-Yossef et "
    "al. 2002, (k-1)/h_k estimator per Beyer et al. 2007): per-lang "
    "distinct-shingle estimate from the k=256 SMALLEST md5-mod-P "
    "hashes. The gap it closes vs HLL: the retained rows are a "
    "uniform hash-region sample, so sketches support INTERSECTION "
    "(see sketch_kmv_overlap), which HLL's register array cannot. "
    "Deterministic hash family -> the oracle replays every retained "
    "hash, theta, and estimate, and the output carries exact_distinct "
    "beside est_distinct so the estimation ERROR is a graded, "
    "replayable artifact. Build is two ROW_NUMBER passes — per "
    "(lang, h mod 32) first so no task ever sorts a whole group's "
    "hash set, then per lang over <= 32k survivors; everything "
    "downstream touches <= k rows per group.",
    tags=("pipeline", "sketch"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    sh = docs.select(
        "lang", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
    ).filter(F.col("shingle") != "")
    hashes = sh.select("lang", K.kmv_hash("shingle").alias("h")).distinct()
    sk = K.kmv_sketch_from_hashes(hashes, ["lang"], _KMV_K, _KMV_SHARDS)
    est = K.kmv_estimate(sk, ["lang"], _KMV_K)
    exact = hashes.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    return est.join(exact, "lang")


def _kmv_overlap_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    k = _KMV_OK
    return f"""
    WITH {_kmv_sh_cte("doc_id < 250", "koa")}, {_kmv_sh_cte("doc_id >= 250", "kob")},
    kha AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {KMV_P} AS h
        FROM koa
    ), khb AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {KMV_P} AS h
        FROM kob
    ), ska AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM kha)
        WHERE r <= {k}
    ), skb AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM khb)
        WHERE r <= {k}
    ), sta AS (SELECT CAST(COUNT(*) AS BIGINT) AS na, MAX(h) AS mxa FROM ska),
    stb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, MAX(h) AS mxb FROM skb),
    th AS (
        SELECT least(CASE WHEN na < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxa END,
                     CASE WHEN nb < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxb END) AS theta,
               CAST(CASE WHEN na < {k} THEN na
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // mxa END AS BIGINT) AS est_a,
               CAST(CASE WHEN nb < {k} THEN nb
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // mxb END AS BIGINT) AS est_b
        FROM sta, stb
    ), ni AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM (SELECT h FROM ska INTERSECT SELECT h FROM skb) s, th
        WHERE s.h < th.theta
    ), nu AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_union
        FROM (SELECT h FROM ska UNION SELECT h FROM skb) s, th
        WHERE s.h < th.theta
    ), ex AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM kha) AS exact_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM khb) AS exact_b,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM kha UNION SELECT h FROM khb)) AS exact_union,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM kha INTERSECT SELECT h FROM khb)) AS exact_intersect
    )
    SELECT th.theta, th.est_a, th.est_b,
           (nu.n_union * CAST({KMV_P} AS BIGINT)) // th.theta AS est_union,
           (ni.n_inter * CAST({KMV_P} AS BIGINT)) // th.theta AS est_intersect,
           CAST(CASE WHEN nu.n_union > 0 THEN (ni.n_inter * 1000) // nu.n_union
                ELSE 0 END AS BIGINT) AS jaccard_est_permille,
           ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_intersect
    FROM th, ni, nu, ex
    """


@register(
    "sketch_kmv_overlap",
    oracle=_kmv_overlap_oracle(),
    doc="Theta-sketch SET OPERATIONS (operators/kmv.py:"
    "kmv_set_estimates; the Apache DataSketches theta construction): "
    "estimate the distinct-shingle UNION, INTERSECTION, and Jaccard "
    "between two corpus halves from two k=512 KMV sketches — no "
    "vocabulary join, the op HLL cannot express. Every hash below "
    "theta = min(theta_A, theta_B) is a uniform theta/P sample of "
    "each key set, so |sample| * P DIV theta estimates each region; "
    "when both halves are under k the estimates DEGENERATE TO EXACT "
    "(theta = P). Output carries the exact union/intersection beside "
    "the estimates — the estimation error is itself oracle-replayed. "
    "100 TB: the corpus is touched once per side to build a k-row "
    "sketch; the set algebra joins k-row tables (broadcast), and "
    "re-estimating after a merge never revisits the corpus.",
    tags=("pipeline", "sketch"),
)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())

    def hashes(pred):
        # r15: the r14 spread_scan was RETRACTED with the kmv.py one —
        # the sketch_kmv_overlap spread/no-spread pairs (0.67x median)
        # cover this site too (it was part of the disabled set).
        return (
            docs.filter(pred)
            .select(F.explode(word_shingles(F.col("text"), 3)).alias("shingle"))
            .filter(F.col("shingle") != "")
            .select(K.kmv_hash("shingle").alias("h"))
            .distinct()
        )

    # Each side's hash table feeds the sketch AND three exact-count
    # aggregates, and each k-row sketch feeds five set-op branches —
    # checkpoint both (the corpus_filter_entropy shared-tail pattern)
    # so the corpus is tokenized once per side, not once per branch.
    # The hash tables are vocabulary-grain (the idf-table precedent);
    # the sketches are k rows.
    ha = hashes(F.col("doc_id") < 250).localCheckpoint(eager=False)
    hb = hashes(F.col("doc_id") >= 250).localCheckpoint(eager=False)
    ska = K.kmv_sketch_from_hashes(ha, [], _KMV_OK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    skb = K.kmv_sketch_from_hashes(hb, [], _KMV_OK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    est = K.kmv_set_estimates(ska, skb, _KMV_OK)
    # r14-opt (reopen): the four exact counts ran as FOUR separate
    # broadcast subtrees — count(A), count(B), a union-distinct count,
    # and a full A∩B INTERSECT (itself a two-sided shuffle join) — each
    # its own job over the vocabulary-grain hash tables. One membership
    # pass computes all four: ha/hb are already DISTINCT, so per-hash
    # max(in_a)/max(in_b) are membership indicators and
    #   exact_a = Σa,  exact_b = Σb,  exact_union = COUNT(*),
    #   exact_intersect = Σ(a*b)
    # — the same integers by set identity, 4 jobs + an intersect join
    # -> 1 aggregate (guide §2.4: remove shuffles outright; values and
    # column order unchanged, oracle untouched).
    u = ha.select(
        "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionAll(hb.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    per_h = u.groupBy("h").agg(
        F.max("in_a").alias("a"), F.max("in_b").alias("b")
    )
    exact = per_h.agg(
        # coalesce: on an EMPTY corpus side the old count()-based form
        # returned 0s; sum() over zero rows is NULL
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("exact_a"),
        F.coalesce(F.sum("b"), F.lit(0)).cast("long").alias("exact_b"),
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0))
        .cast("long")
        .alias("exact_intersect"),
    )
    return est.crossJoin(F.broadcast(exact))


@register(
    "stream_kmv_ingest",
    oracle=_kmv_distinct_oracle(),
    doc="STREAMING KMV build: each microbatch is split into 4 doc_id "
    "strata and each stratum's per-lang k-smallest sketch rows append "
    "to a store; serving takes the k smallest of the DISTINCT stored "
    "rows per lang — k-min of a union equals k-min of per-shard "
    "k-mins (the k smallest overall all survive their own shard's "
    "cut), so the served estimate replays sketch_kmv_distinct's "
    "oracle VERBATIM regardless of batching — the same "
    "sketch-of-union == merge-of-sketches statement the Bloom/CM/HLL "
    "streams make. State is O(k) rows per (stratum, lang) per batch, "
    "never keys.",
    tags=("pipeline", "streaming", "sketch"),
)
def stream_kmv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K

    doc_schema = _t(spark, sf_dir)["documents"].schema
    root = tempfile.mkdtemp(prefix="bosql_kmv_stream_")
    store = os.path.join(root, "sketch")

    stream = (
        spark.readStream.schema(doc_schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        base = batch_df.filter(F.col("text").isNotNull())
        for s in range(4):
            sh = (
                base.filter(F.pmod(F.col("doc_id"), F.lit(4)) == s)
                .select(
                    "lang",
                    F.explode(word_shingles(F.col("text"), 3)).alias("shingle"),
                )
                .filter(F.col("shingle") != "")
            )
            K.kmv_sketch(sh, "shingle", ["lang"], _KMV_K, _KMV_SHARDS).write.mode(
                "append"
            ).parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    merged = K.kmv_sketch_from_hashes(
        spark.read.parquet(store).distinct(), ["lang"], _KMV_K, _KMV_SHARDS
    )
    est = K.kmv_estimate(merged, ["lang"], _KMV_K)
    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    exact = (
        docs.select(
            "lang", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
        )
        .filter(F.col("shingle") != "")
        .select("lang", K.kmv_hash("shingle").alias("h"))
        .distinct()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "lang")


def _kmv_pairwise_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    k = _KMV_K
    return f"""
    WITH {_kmv_sh_cte("TRUE", "kpl", keep_lang=True)},
    kph AS (
        SELECT DISTINCT lang,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {KMV_P} AS h
        FROM kpl
    ), kpr AS (
        SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS r
        FROM kph
    ), kpsk AS (
        SELECT lang, h FROM kpr WHERE r <= {k}
    ), kpst AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               MAX(h) AS mx
        FROM kpsk GROUP BY lang
    ), kpstat AS (
        SELECT lang,
               CAST(CASE WHEN n_kept < {k} THEN {KMV_P} ELSE mx END AS BIGINT) AS theta,
               CAST(CASE WHEN n_kept < {k} THEN n_kept
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // mx END AS BIGINT) AS est
        FROM kpst
    ), kpp AS (
        SELECT a.lang AS ga, b.lang AS gb,
               least(a.theta, b.theta) AS theta,
               a.est AS est_a, b.est AS est_b
        FROM kpstat a, kpstat b WHERE a.lang < b.lang
    ), kpna AS (
        SELECT p.ga, p.gb, CAST(COUNT(*) AS BIGINT) AS na
        FROM kpp p JOIN kpsk s ON s.lang = p.ga AND s.h < p.theta
        GROUP BY p.ga, p.gb
    ), kpnb AS (
        SELECT p.ga, p.gb, CAST(COUNT(*) AS BIGINT) AS nb
        FROM kpp p JOIN kpsk s ON s.lang = p.gb AND s.h < p.theta
        GROUP BY p.ga, p.gb
    ), kpni AS (
        SELECT p.ga, p.gb, CAST(COUNT(*) AS BIGINT) AS ni
        FROM kpp p
        JOIN kpsk x ON x.lang = p.ga AND x.h < p.theta
        JOIN kpsk y ON y.lang = p.gb AND y.h = x.h
        GROUP BY p.ga, p.gb
    )
    SELECT p.ga, p.gb, p.theta, p.est_a, p.est_b,
           COALESCE(i.ni, 0) AS n_inter,
           COALESCE(a.na, 0) + COALESCE(b.nb, 0) - COALESCE(i.ni, 0) AS n_union,
           (COALESCE(i.ni, 0) * CAST({KMV_P} AS BIGINT)) // p.theta AS est_intersect,
           CAST(CASE WHEN COALESCE(a.na, 0) + COALESCE(b.nb, 0) - COALESCE(i.ni, 0) > 0
                THEN (COALESCE(i.ni, 0) * 1000)
                     // (COALESCE(a.na, 0) + COALESCE(b.nb, 0) - COALESCE(i.ni, 0))
                ELSE 0 END AS BIGINT) AS jaccard_est_permille
    FROM kpp p
    LEFT JOIN kpna a ON a.ga = p.ga AND a.gb = p.gb
    LEFT JOIN kpnb b ON b.ga = p.ga AND b.gb = p.gb
    LEFT JOIN kpni i ON i.ga = p.ga AND i.gb = p.gb
    """


@register(
    "sketch_kmv_pairwise",
    oracle=_kmv_pairwise_oracle(),
    doc="ALL-PAIRS set estimates from ONE grouped KMV build "
    "(operators/kmv.py:kmv_pairwise_jaccard): the lang x lang "
    "distinct-shingle Jaccard/intersection matrix — G groups need "
    "G(G-1)/2 overlap answers and the corpus is scanned once; every "
    "pair is then a k-row-table join against a G-row broadcast stats "
    "table (per-pair theta = min of the two sides, n_union by "
    "inclusion-exclusion on counted samples, no union "
    "materialization). The production question is 'which corpus "
    "slices share vocabulary' (contamination screens across dumps, "
    "language-confusion detection); pairwise EXACT answers would be "
    "G(G-1)/2 vocabulary joins over the corpus. Same portable hash "
    "family, so the oracle replays the whole matrix.",
    tags=("pipeline", "sketch"),
)
def sketch_kmv_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    sh = docs.select(
        "lang", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
    ).filter(F.col("shingle") != "")
    sk = K.kmv_sketch(sh, "shingle", ["lang"], _KMV_K, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    return K.kmv_pairwise_jaccard(sk, "lang", _KMV_K)


_KNN_EDGES_CTE = """
    vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cents AS (
        SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < 16
    ), assigned AS (
        SELECT vec_id, arg_min(c_id, list_dot_product(v, v) - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv)) AS cell
        FROM vecs CROSS JOIN cents GROUP BY vec_id
    ), av AS (
        SELECT a.vec_id, a.cell, ve.v FROM assigned a JOIN vecs ve USING (vec_id)
    ), prs AS (
        SELECT x.vec_id, y.vec_id AS neighbor_id,
               list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id <> y.vec_id
    ), knn AS (
        SELECT vec_id AS s, neighbor_id AS d
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
            FROM prs
        ) WHERE rnk <= 5
    )
"""


@register(
    "graph_triangle_stats",
    oracle=f"""
    WITH {_KNN_EDGES_CTE},
    und AS (
        SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM knn WHERE s <> d
    ), deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
        GROUP BY n
    ), tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ), st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg
    ), ne AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und
    )
    SELECT st.n_nodes, ne.n_edges, st.n_wedges, tri.n_triangles,
           CAST(CASE WHEN st.n_wedges > 0
                THEN (3 * tri.n_triangles * 1000) // st.n_wedges
                ELSE 0 END AS BIGINT) AS clustering_permille
    FROM st, ne, tri
    """,
    doc="Exact TRIANGLE COUNT + global clustering coefficient of the "
    "k-NN similarity graph (operators/graph.py:triangle_stats; "
    "Cohen's degree-ordered MapReduce enumeration). Community "
    "structure in one number: transitivity distinguishes a corpus "
    "whose near-dup neighborhoods form tight cliques (template spam, "
    "mirror clusters) from benign diffuse similarity — the graph-"
    "level sibling of the pairwise dedup evidence. Degree ordering is "
    "the 100 TB term: orienting every edge low->high degree caps "
    "per-node wedge fan-out at O(sqrt(m)) so hub nodes cannot emit "
    "quadratic wedges (a k-NN graph is further degree-capped at ~2k "
    "by construction); the DuckDB twin counts by the direct ordered "
    "3-way self-join, pinning the oriented enumeration to the "
    "definition. All-integer output, bit-replayed.",
    tags=("pipeline", "graph"),
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import triangle_stats

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)  # materialize the k*n edge list ONCE: the operator self-joins it, which would re-run the knn scoring (now an Arrow stage) per branch
    return triangle_stats(edges)


def _kmv_setops_tail(k: int) -> str:
    """Shared two-sketch set-estimate oracle tail: expects CTEs
    ``kha``/``khb`` (DISTINCT h per side) to be defined by the caller
    and emits the (theta, est_*, jaccard, exact_*) row."""
    from bo_sql_spark.operators.kmv import KMV_P

    return f"""ska AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM kha)
        WHERE r <= {k}
    ), skb AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM khb)
        WHERE r <= {k}
    ), sta AS (SELECT CAST(COUNT(*) AS BIGINT) AS na, MAX(h) AS mxa FROM ska),
    stb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, MAX(h) AS mxb FROM skb),
    th AS (
        SELECT least(CASE WHEN na < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxa END,
                     CASE WHEN nb < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxb END) AS theta,
               CAST(CASE WHEN na < {k} THEN na
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // mxa END AS BIGINT) AS est_a,
               CAST(CASE WHEN nb < {k} THEN nb
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // mxb END AS BIGINT) AS est_b
        FROM sta, stb
    ), ni AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM (SELECT h FROM ska INTERSECT SELECT h FROM skb) s, th
        WHERE s.h < th.theta
    ), nu AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_union
        FROM (SELECT h FROM ska UNION SELECT h FROM skb) s, th
        WHERE s.h < th.theta
    ), ex AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM kha) AS exact_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM khb) AS exact_b,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM kha UNION SELECT h FROM khb)) AS exact_union,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM kha INTERSECT SELECT h FROM khb)) AS exact_intersect
    )
    SELECT th.theta, th.est_a, th.est_b,
           (nu.n_union * CAST({KMV_P} AS BIGINT)) // th.theta AS est_union,
           (ni.n_inter * CAST({KMV_P} AS BIGINT)) // th.theta AS est_intersect,
           CAST(CASE WHEN nu.n_union > 0 THEN (ni.n_inter * 1000) // nu.n_union
                ELSE 0 END AS BIGINT) AS jaccard_est_permille,
           ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_intersect
    FROM th, ni, nu, ex"""


_KMV_UK = 64  # user-overlap sketch size (user sets are smaller than vocab)


def _kmv_user_overlap_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    return f"""
    WITH kha AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {KMV_P} AS h
        FROM events WHERE dayofweek(ts) NOT IN (0, 6)
    ), khb AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {KMV_P} AS h
        FROM events WHERE dayofweek(ts) IN (0, 6)
    ), {_kmv_setops_tail(_KMV_UK)}
    """


def _kmv_user_hashes(ev: DataFrame, weekend: bool) -> DataFrame:
    from bo_sql_spark.operators import kmv as K

    is_wknd = F.dayofweek("ts").isin(1, 7)
    return (
        ev.filter(is_wknd if weekend else ~is_wknd)
        .select(K.kmv_hash(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )


def _kmv_user_overlap_result(
    spark: SparkSession, sf_dir: str, ska: DataFrame, skb: DataFrame
) -> DataFrame:
    """Shared serve leg: set estimates from the two sketches + exact
    columns recomputed from the batch events (the graded accuracy
    artifact; production would drop the exact_* legs)."""
    from bo_sql_spark.operators import kmv as K

    ev = _t(spark, sf_dir)["events"]
    ha = _kmv_user_hashes(ev, weekend=False).localCheckpoint(eager=False)
    hb = _kmv_user_hashes(ev, weekend=True).localCheckpoint(eager=False)
    est = K.kmv_set_estimates(ska, skb, _KMV_UK)
    exact = (
        ha.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(
            F.broadcast(hb.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        )
        .crossJoin(
            F.broadcast(
                ha.union(hb)
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("exact_union"))
            )
        )
        .crossJoin(
            F.broadcast(
                ha.intersect(hb).agg(
                    F.count(F.lit(1)).cast("long").alias("exact_intersect")
                )
            )
        )
    )
    return est.crossJoin(F.broadcast(exact))


@register(
    "drift_user_overlap_kmv",
    oracle=_kmv_user_overlap_oracle(),
    doc="ENTITY-overlap monitor from KMV sketches (operators/kmv.py): "
    "distinct-user union / intersection / Jaccard between the weekday "
    "and weekend event populations, k=64 — the retention/returning-"
    "users question answered from kilobyte sketches instead of a "
    "user-level join (the canonical production theta-sketch use). The "
    "blind spot it covers in the monitor family: every count-based "
    "monitor (chi-sq/KL/PSI/EMD/Gini) sees DISTRIBUTION shift over a "
    "fixed category set; this one sees SET churn — which entities "
    "arrived or vanished — even when per-category counts look stable. "
    "Exact columns ride along as the graded accuracy artifact.",
    tags=("pipeline", "sketch", "stats", "monitoring"),
)
def drift_user_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import kmv as K

    ev = _t(spark, sf_dir)["events"]
    ska = K.kmv_sketch_from_hashes(
        _kmv_user_hashes(ev, weekend=False), [], _KMV_UK, _KMV_SHARDS
    ).localCheckpoint(eager=False)
    skb = K.kmv_sketch_from_hashes(
        _kmv_user_hashes(ev, weekend=True), [], _KMV_UK, _KMV_SHARDS
    ).localCheckpoint(eager=False)
    return _kmv_user_overlap_result(spark, sf_dir, ska, skb)


@register(
    "stream_drift_user_overlap",
    oracle=_kmv_user_overlap_oracle(),
    doc="STREAMING twin of drift_user_overlap_kmv: each microbatch "
    "appends its own per-side (weekday/weekend) k=64 user-hash "
    "sketches to a store; serving k-min-merges the stored rows per "
    "side and runs the same set estimates — k-min of a union equals "
    "k-min of per-batch k-mins, so the served monitor replays the "
    "batch oracle VERBATIM regardless of batching. O(k) state per "
    "(side, batch); the 100 TB shape is a daily sketch per side "
    "folded into the monitor without ever rescanning events.",
    tags=("pipeline", "streaming", "sketch", "stats", "monitoring"),
)
def stream_drift_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from bo_sql_spark.operators import kmv as K

    ev_schema = _t(spark, sf_dir)["events"].schema
    root = tempfile.mkdtemp(prefix="bosql_useroverlap_stream_")
    store = os.path.join(root, "sketches")

    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(sf_dir)
    )

    def ingest(batch_df, batch_id):
        is_wknd = F.dayofweek("ts").isin(1, 7)
        for side, pred in (("a", ~is_wknd), ("b", is_wknd)):
            hashes = (
                batch_df.filter(pred)
                .select(K.kmv_hash(F.col("user_id").cast("string")).alias("h"))
                .distinct()
            )
            K.kmv_sketch_from_hashes(hashes, [], _KMV_UK, _KMV_SHARDS).withColumn(
                "side", F.lit(side)
            ).write.mode("append").parquet(store)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(root, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Checkpoint the k-row served sketches (same as the batch twin):
    # each feeds five set-op branches, and uncheckpointed the per-side
    # k-min window subtree would replay once per branch.
    stored = spark.read.parquet(store)
    ska = K.kmv_sketch_from_hashes(
        stored.filter(F.col("side") == "a").select("h").distinct(),
        [],
        _KMV_UK,
        _KMV_SHARDS,
    ).localCheckpoint(eager=False)
    skb = K.kmv_sketch_from_hashes(
        stored.filter(F.col("side") == "b").select("h").distinct(),
        [],
        _KMV_UK,
        _KMV_SHARDS,
    ).localCheckpoint(eager=False)
    return _kmv_user_overlap_result(spark, sf_dir, ska, skb)


@register(
    "graph_local_clustering",
    oracle=f"""
    WITH {_KNN_EDGES_CTE},
    und AS (
        SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM knn WHERE s <> d
    ), deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
        GROUP BY n
    ), tri3 AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pern AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS n FROM tri3
              UNION ALL SELECT b FROM tri3
              UNION ALL SELECT c FROM tri3)
        GROUP BY n
    )
    SELECT d.n AS node, d.deg,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           CAST(CASE WHEN d.deg >= 2
                THEN (COALESCE(p.n_triangles, 0) * 1000)
                     // (d.deg * (d.deg - 1) // 2)
                ELSE 0 END AS BIGINT) AS local_clustering_permille
    FROM deg d LEFT JOIN pern p ON p.n = d.n
    """,
    doc="PER-NODE triangle counts + local clustering coefficient over "
    "the k-NN graph (operators/graph.py:local_clustering) — the "
    "node-level evidence the global transitivity averages away: a "
    "vector embedded in a clique scores 1000 (template/mirror cluster "
    "member, a dedup candidate), a hub bridging otherwise-unlinked "
    "neighbors scores 0 (boilerplate/aggregator), so the column is a "
    "per-document graph feature for spam triage and cluster-quality "
    "audits. Same degree-ordered wedge enumeration as "
    "graph_triangle_stats with each closed wedge crediting its three "
    "corners (one extra explode, still O(m^1.5)-bounded); the oracle "
    "counts per-corner from the direct ordered 3-way join.",
    tags=("pipeline", "graph"),
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import local_clustering

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)  # materialize the k*n edge list ONCE: the operator self-joins it, which would re-run the knn scoring (now an Arrow stage) per branch
    return local_clustering(edges)


_KMV_RK = 128  # rollup sketch size: cells land under k, lang/global over


def _kmv_rollup_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    k = _KMV_RK

    def grain(sel_cols: str, part: str, grp: str, tag: str, pads: str) -> str:
        """One grain's direct build: k-smallest per {grp} + exact."""
        part_by = f"PARTITION BY {part} " if part else ""
        grp_by = f"GROUP BY {grp}" if grp else ""
        join_on = f"USING ({grp})" if grp else "ON TRUE"
        return f"""
        SELECT '{tag}' AS grain, {pads}
               a.n_kept,
               CAST(CASE WHEN a.n_kept < {k} THEN {KMV_P} ELSE a.mx END AS BIGINT) AS theta,
               CAST(CASE WHEN a.n_kept < {k} THEN a.n_kept
                    ELSE ({k - 1} * CAST({KMV_P} AS BIGINT)) // a.mx END AS BIGINT) AS est_distinct,
               e.exact_distinct
        FROM (
            SELECT {sel_cols + ', ' if grp else ''}CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS mx
            FROM (SELECT {sel_cols + ', ' if grp else ''}h, row_number() OVER ({part_by}ORDER BY h) AS r
                  FROM (SELECT DISTINCT {sel_cols + ', ' if grp else ''}h FROM krbase))
            WHERE r <= {k} {grp_by}
        ) a JOIN (
            SELECT {sel_cols + ', ' if grp else ''}CAST(COUNT(*) AS BIGINT) AS exact_distinct
            FROM (SELECT DISTINCT {sel_cols + ', ' if grp else ''}h FROM krbase) {grp_by}
        ) e {join_on}
        """

    return f"""
    WITH {_kmv_sh_cte("TRUE", "krl", keep_lang=True)},
    krsrc AS (
        SELECT lang, source,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents WHERE text IS NOT NULL
    ), krsh AS (
        SELECT DISTINCT lang, source, unnest(list_filter(list_distinct(list_transform(
            range(1, greatest(len(tok) - 1, 2)),
            i -> array_to_string(tok[i:i+2], ' '))), s -> s <> '')) AS shingle
        FROM krsrc
    ), krbase AS (
        SELECT DISTINCT lang, source,
               CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {KMV_P} AS h
        FROM krsh
    )
    {grain("lang, source", "lang, source", "lang, source", "cell",
           "a.lang, a.source,")}
    UNION ALL
    {grain("lang", "lang", "lang", "lang",
           "a.lang, CAST(NULL AS VARCHAR) AS source,")}
    UNION ALL
    {grain("", "", "", "global",
           "CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS VARCHAR) AS source,")}
    """


@register(
    "sketch_kmv_rollup",
    oracle=_kmv_rollup_oracle(),
    doc="Hierarchical SKETCH ROLLUP (the Druid/Iceberg datacube "
    "pattern): per-(lang, source) KMV cell sketches are built from "
    "ONE corpus scan, then the lang grain and the global grain are "
    "derived by MERGING cell sketches — never rescanning. The graded "
    "statement is the strong one: k-min of a union equals k-min of "
    "per-cell k-mins, so the rolled-up sketch is BIT-IDENTICAL to a "
    "sketch built directly at the coarser grain, which is exactly "
    "what the oracle computes (direct build per grain). k=128 lands "
    "the 100 cells under k (exact branch) and the lang/global grains "
    "over it (estimation branch) in one artifact; exact_distinct "
    "rides along at every grain. At 100 TB this is the NDV datacube: "
    "base cells maintained incrementally, every coarser ad-hoc slice "
    "answered from kilobytes.",
    tags=("pipeline", "sketch"),
)
def sketch_kmv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.operators import kmv as K

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    hashes = (
        docs.select(
            "lang",
            "source",
            F.explode(word_shingles(F.col("text"), 3)).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .select("lang", "source", K.kmv_hash("shingle").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cells = K.kmv_sketch_from_hashes(
        hashes, ["lang", "source"], _KMV_RK, _KMV_SHARDS
    ).localCheckpoint(eager=False)
    # rollups derive from the CELL sketches, not the base hash table —
    # the never-rescan claim this query grades
    lang_sk = K.kmv_sketch_from_hashes(
        cells.select("lang", "h").distinct(), ["lang"], _KMV_RK, _KMV_SHARDS
    )
    glob_sk = K.kmv_sketch_from_hashes(
        cells.select("h").distinct(), [], _KMV_RK, _KMV_SHARDS
    )
    null_s = F.lit(None).cast("string")

    def with_exact(est, grain, gcols):
        ex = (
            hashes.select(*gcols, "h").distinct().groupBy(*gcols)
            if gcols
            else hashes.select("h").distinct().groupBy()
        ).agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
        j = est.join(ex, gcols) if gcols else est.crossJoin(F.broadcast(ex))
        lang_c = F.col("lang") if "lang" in gcols else null_s.alias("lang")
        src_c = F.col("source") if "source" in gcols else null_s.alias("source")
        return j.select(
            F.lit(grain).alias("grain"),
            lang_c,
            src_c,
            "n_kept",
            "theta",
            "est_distinct",
            "exact_distinct",
        )

    out_cell = with_exact(
        K.kmv_estimate(cells, ["lang", "source"], _KMV_RK), "cell", ["lang", "source"]
    )
    out_lang = with_exact(K.kmv_estimate(lang_sk, ["lang"], _KMV_RK), "lang", ["lang"])
    out_glob = with_exact(K.kmv_estimate(glob_sk, [], _KMV_RK), "global", [])
    return out_cell.unionByName(out_lang).unionByName(out_glob)


def _kmv_churn_oracle() -> str:
    from bo_sql_spark.operators.kmv import KMV_P

    k = _KMV_UK
    return f"""
    WITH kha AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {KMV_P} AS h
        FROM events WHERE dayofweek(ts) NOT IN (0, 6)
    ), khb AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {KMV_P} AS h
        FROM events WHERE dayofweek(ts) IN (0, 6)
    ), ska AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM kha)
        WHERE r <= {k}
    ), skb AS (
        SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM khb)
        WHERE r <= {k}
    ), sta AS (SELECT CAST(COUNT(*) AS BIGINT) AS na, MAX(h) AS mxa FROM ska),
    stb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, MAX(h) AS mxb FROM skb),
    th AS (
        SELECT least(CASE WHEN na < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxa END,
                     CASE WHEN nb < {k} THEN CAST({KMV_P} AS BIGINT) ELSE mxb END) AS theta
        FROM sta, stb
    ), cnts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ska s, th WHERE s.h < th.theta) AS na,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM skb s, th WHERE s.h < th.theta) AS nb,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM ska INTERSECT SELECT h FROM skb) s, th
                WHERE s.h < th.theta) AS ni
    ), ex AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM kha
                WHERE h NOT IN (SELECT h FROM khb)) AS exact_a_only,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM (SELECT h FROM kha INTERSECT SELECT h FROM khb)) AS exact_both,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM khb
                WHERE h NOT IN (SELECT h FROM kha)) AS exact_b_only
    )
    SELECT th.theta,
           ((cnts.na - cnts.ni) * CAST({KMV_P} AS BIGINT)) // th.theta AS est_a_only,
           (cnts.ni * CAST({KMV_P} AS BIGINT)) // th.theta AS est_both,
           ((cnts.nb - cnts.ni) * CAST({KMV_P} AS BIGINT)) // th.theta AS est_b_only,
           ex.exact_a_only, ex.exact_both, ex.exact_b_only
    FROM th, cnts, ex
    """


@register(
    "drift_user_churn_kmv",
    oracle=_kmv_churn_oracle(),
    doc="CHURN decomposition of the entity-overlap monitor "
    "(operators/kmv.py:kmv_churn_estimates): weekday-only / both / "
    "weekend-only distinct-user estimates from the same two k=64 "
    "sketches — reading A as the before period and B as the after, "
    "these are lapsed / retained / new. Below theta sketch membership "
    "EQUALS set membership (each side retains all its hashes under "
    "the smaller theta), so the differences are exact counted "
    "samples scaled by P/theta; the three SAMPLE COUNTS sum to the "
    "overlap query's union sample by construction (the estimates "
    "truncate per term, so they sum to within 3 DIV truncations of "
    "est_union). Same k-row joins, no corpus access beyond the "
    "build; exact_* columns ride along.",
    tags=("pipeline", "sketch", "stats", "monitoring"),
)
def drift_user_churn_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators import kmv as K

    ev = _t(spark, sf_dir)["events"]
    ha = _kmv_user_hashes(ev, weekend=False).localCheckpoint(eager=False)
    hb = _kmv_user_hashes(ev, weekend=True).localCheckpoint(eager=False)
    ska = K.kmv_sketch_from_hashes(ha, [], _KMV_UK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    skb = K.kmv_sketch_from_hashes(hb, [], _KMV_UK, _KMV_SHARDS).localCheckpoint(
        eager=False
    )
    est = K.kmv_churn_estimates(ska, skb, _KMV_UK)
    only_a = ha.join(hb, "h", "left_anti")
    only_b = hb.join(ha, "h", "left_anti")
    both = ha.intersect(hb)
    exact = (
        only_a.agg(F.count(F.lit(1)).cast("long").alias("exact_a_only"))
        .crossJoin(
            F.broadcast(both.agg(F.count(F.lit(1)).cast("long").alias("exact_both")))
        )
        .crossJoin(
            F.broadcast(
                only_b.agg(F.count(F.lit(1)).cast("long").alias("exact_b_only"))
            )
        )
    )
    return est.crossJoin(F.broadcast(exact))


def _modularity_oracle() -> str:
    def block(tag_cte: str, name: str) -> str:
        return f"""{name}deg AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS deg_c
        FROM (SELECT cu AS c FROM {tag_cte} UNION ALL SELECT cv AS c FROM {tag_cte})
        GROUP BY c
    ), {name}w AS (
        SELECT cu AS c, CAST(COUNT(*) AS BIGINT) AS e_c
        FROM {tag_cte} WHERE cu = cv GROUP BY cu
    ), {name}q AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
               (SELECT m FROM gm) AS m_edges,
               CAST(SUM((COALESCE(w.e_c, 0) * 1000000) // (SELECT m FROM gm)
                    - (d.deg_c * d.deg_c * 1000000)
                      // (4 * (SELECT m FROM gm) * (SELECT m FROM gm)))
                    AS BIGINT) AS q_micros
        FROM {name}deg d LEFT JOIN {name}w w USING (c)
    )"""

    return f"""
    WITH {_KNN_EDGES_CTE},
    und AS (
        SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM knn WHERE s <> d
    ), gm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
    tcell AS (
        SELECT au.cell AS cu, av.cell AS cv
        FROM und e
        JOIN assigned au ON au.vec_id = e.u
        JOIN assigned av ON av.vec_id = e.v
    ), thash AS (
        SELECT e.u % 8 AS cu, e.v % 8 AS cv FROM und e
    ), {block("tcell", "mc")}, {block("thash", "mh")}
    SELECT 'ivf_cell' AS part_name, n_communities, m_edges, q_micros FROM mcq
    UNION ALL
    SELECT 'hash8' AS part_name, n_communities, m_edges, q_micros FROM mhq
    """


@register(
    "graph_modularity",
    oracle=_modularity_oracle(),
    doc="Newman MODULARITY of two partitions over the k-NN graph "
    "(operators/graph.py:modularity): the IVF-cell partition vs an "
    "arbitrary hash partition of the same nodes — the "
    "clustering-quality number (Q = sum_c e_c/m - (deg_c/2m)^2) that "
    "says whether a grouping explains the similarity edges better "
    "than degree-preserving chance. The contrast IS the artifact: "
    "cells capture every k-NN edge by construction (Q = 1 - "
    "sum(deg_c/2m)^2, strongly positive) while the hash partition "
    "lands near 0 — the discriminating behavior a cluster-quality "
    "audit relies on. Integer fixed-point per-community "
    "contributions (deg_c^2*1e6 bounded by 4e6*m^2, int64-safe at "
    "fixture m and documented for beyond), summed order-independent; "
    "one 1-row edge-count stat, two broadcast joins, one groupBy per "
    "term — no windows, no iteration.",
    tags=("pipeline", "graph"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import modularity

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=False)
    cell_assign = S.ivf_assign(emb, cents).select(
        F.col("vec_id").alias("node"), F.col("cell").alias("community")
    )
    hash_assign = emb.select(
        F.col("vec_id").alias("node"),
        F.pmod(F.col("vec_id"), F.lit(8)).alias("community"),
    )
    q_cell = modularity(edges, cell_assign).select(
        F.lit("ivf_cell").alias("part_name"), "n_communities", "m_edges", "q_micros"
    )
    q_hash = modularity(edges, hash_assign).select(
        F.lit("hash8").alias("part_name"), "n_communities", "m_edges", "q_micros"
    )
    return q_cell.unionByName(q_hash)


_KCORE_K = 6
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    k, rounds = _KCORE_K, _KCORE_ROUNDS
    ctes, selects = [], []
    ctes.append("e0 AS MATERIALIZED (SELECT u, v FROM und)")
    selects.append(
        "SELECT CAST(0 AS BIGINT) AS round,"
        " (SELECT CAST(COUNT(*) AS BIGINT)"
        "  FROM (SELECT u AS n FROM e0 UNION SELECT v FROM e0)) AS n_nodes,"
        " (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges"
    )
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""kp{r} AS MATERIALIZED (
        SELECT n FROM (
            SELECT n, COUNT(*) AS d
            FROM (SELECT u AS n FROM e{p} UNION ALL SELECT v AS n FROM e{p})
            GROUP BY n
        ) WHERE d >= {k}
    ), e{r} AS MATERIALIZED (
        SELECT u, v FROM e{p}
        WHERE u IN (SELECT n FROM kp{r}) AND v IN (SELECT n FROM kp{r})
    )"""
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT),"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM kp{r}),"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r})"
        )
    return f"""
    WITH {_KNN_EDGES_CTE},
    und AS (
        SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM knn WHERE s <> d
    ), {', '.join(ctes)}
    {' UNION ALL '.join(selects)}
    """


@register(
    "graph_kcore_trace",
    oracle=_kcore_oracle(),
    doc="k-CORE PEELING TRACE over the k-NN graph (operators/graph.py:"
    "kcore_peel_trace; Seidman 1983): per round, the node and edge "
    "counts surviving the drop-degree-below-6 peel — 5 declared "
    "rounds, trailing rows repeating the fixed point (the convergence "
    "assertion). On this fixture the trace collapses 500 nodes -> 0 "
    "in 4 rounds: a k-NN graph has near-uniform degree, so probing "
    "above the construction degree finds NO dense core — exactly the "
    "diagnostic a template/mirror-clique corpus would fail (its core "
    "survives peeling; the collapse RATE is the signal, which is why "
    "the trace, not the final set, is the graded artifact). Bounded "
    "iteration, declared round count for the unrolled SQL replay, "
    "each round one degree groupBy + two semi-joins — the pagerank "
    "message-passing discipline.",
    tags=("pipeline", "graph"),
)
def graph_kcore_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import kcore_peel_trace

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return kcore_peel_trace(edges, _KCORE_K, _KCORE_ROUNDS)


@register(
    "graph_assortativity",
    oracle=f"""
    WITH {_KNN_EDGES_CTE},
    und AS (
        SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        FROM knn WHERE s <> d
    ), gdeg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
        GROUP BY n
    ), tagged AS (
        SELECT du.deg AS d1, dv.deg AS d2
        FROM und e
        JOIN gdeg du ON du.n = e.u
        JOIN gdeg dv ON dv.n = e.v
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
               CAST(SUM(d1 * d2) AS BIGINT) AS s1,
               CAST(SUM(d1 + d2) AS BIGINT) AS s2,
               CAST(SUM(d1 * d1 + d2 * d2) AS BIGINT) AS s3
        FROM tagged
    )
    SELECT m_edges, s1, s2, s3,
           CAST(CASE WHEN 2 * m_edges * s3 - s2 * s2 <> 0
                THEN ((4 * m_edges * s1 - s2 * s2) * 1000)
                     // (2 * m_edges * s3 - s2 * s2)
                ELSE NULL END AS BIGINT) AS assortativity_permille
    FROM agg
    """,
    doc="Degree ASSORTATIVITY of the k-NN graph (operators/graph.py:"
    "assortativity; Newman 2002): the Pearson degree-degree "
    "correlation across edges as an all-integer ratio "
    "(4m*S1 - S2^2) / (2m*S3 - S2^2) in permille — positive means "
    "hubs link to hubs, negative means hubs serve leaves (a k-NN "
    "graph leans disassortative: popular vectors are neighbors of "
    "many low-degree ones). Completes the graph-stats suite "
    "(triangles / local clustering / modularity / k-core) with the "
    "mixing diagnostic none of the per-node counts see. One degree "
    "groupBy, two endpoint joins, ONE global aggregate row; the "
    "oracle replays the exact integers.",
    tags=("pipeline", "graph"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.operators.graph import assortativity

    emb = _t(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").cast("array<double>").alias("c_vec"),
    )
    edges = S.knn_graph(emb, cents, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    ).localCheckpoint(eager=True)  # materialize the k*n edge list ONCE: the operator self-joins it, which would re-run the knn scoring (now an Arrow stage) per branch
    return assortativity(edges)


def _heaps_oracle() -> str:
    from bo_sql_spark.functions.fixedpoint import duckdb_ln_select

    chain = "SELECT * FROM hc2"
    for x, out in (
        ("n_types", "_lnv"),
        ("n_types_half", "_lnvh"),
        ("n_tokens", "_lnn"),
        ("n_tokens_half", "_lnnh"),
    ):
        chain = duckdb_ln_select(chain, x, out)
    return f"""
    WITH hstok AS (
        SELECT lang, doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tok
        FROM documents WHERE text IS NOT NULL
    ), hs AS MATERIALIZED (
        SELECT DISTINCT lang, doc_id, unnest(list_filter(list_distinct(list_transform(
            range(1, greatest(len(tok) - 1, 2)),
            i -> array_to_string(tok[i:i+2], ' '))), s -> s <> '')) AS shingle
        FROM hstok
    ), hcnt AS (
        SELECT lang, shingle, CAST(COUNT(*) AS BIGINT) AS c
        FROM hs GROUP BY lang, shingle
    ), hfull AS (
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
        FROM hcnt GROUP BY lang
    ), hhalf AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens_half,
               CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_types_half
        FROM hs WHERE doc_id % 2 = 0 GROUP BY lang
    ), hc2 AS (
        SELECT f.lang, f.n_tokens, f.n_types, f.n_hapax,
               h.n_tokens_half, h.n_types_half
        FROM hfull f JOIN hhalf h USING (lang)
    ), hln AS ({chain})
    SELECT lang, n_tokens, n_types, n_hapax,
           (n_hapax * 1000) // n_types AS hapax_permille,
           n_tokens_half, n_types_half,
           ((_lnv - _lnvh) * 1000000) // (_lnn - _lnnh) AS heaps_beta_micros
    FROM hln
    """


@register(
    "corpus_heaps_hapax",
    oracle=_heaps_oracle(),
    doc="Vocabulary-growth diagnostics per lang, exact in integer "
    "micros: HAPAX ratio (fraction of shingle types seen exactly "
    "once — the classic burstiness/contamination signal: template "
    "floods crush it, healthy natural text holds it high) and the "
    "HEAPS'-law exponent beta estimated from the half-corpus to "
    "full-corpus vocabulary growth (V ~ N^beta; beta = "
    "(ln V - ln V_half) DIV (ln N - ln N_half) on the fixed-point ln "
    "chain — a saturated/duplicated corpus drives beta toward 0, "
    "fresh text sits near 0.5-0.8). Shingle grain (the token fixture "
    "vocabulary saturates at 31 types; 3-word shingles grow ~16k). "
    "Companion of corpus_zipf_slope: Zipf reads the frequency "
    "SPECTRUM shape, Heaps reads vocabulary GROWTH — a corpus can "
    "fake one but rarely both. Plan: one per-doc shingle explode, "
    "one vocabulary-grain count aggregate, per-lang 1-row folds; the "
    "deterministic doc_id%2 half needs no second tokenization (one "
    "filtered re-aggregate of the same exploded frame).",
    tags=("pipeline", "text", "stats"),
)
def corpus_heaps_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bo_sql_spark.functions import word_shingles
    from bo_sql_spark.functions.fixedpoint import with_ln_micros

    docs = _t(spark, sf_dir)["documents"].filter(F.col("text").isNotNull())
    hs = docs.select(
        "lang", "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("shingle")
    ).filter(F.col("shingle") != "").localCheckpoint(eager=False)
    cnt = hs.groupBy("lang", "shingle").agg(F.count(F.lit(1)).cast("long").alias("c"))
    full = cnt.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
    )
    half = (
        hs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens_half"),
            F.count_distinct("shingle").cast("long").alias("n_types_half"),
        )
    )
    j = full.join(half, "lang")
    for x, out in (
        ("n_types", "_lnv"),
        ("n_types_half", "_lnvh"),
        ("n_tokens", "_lnn"),
        ("n_tokens_half", "_lnnh"),
    ):
        j = with_ln_micros(j, x, out)
    return j.select(
        "lang",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.expr("(n_hapax * 1000) DIV n_types").alias("hapax_permille"),
        "n_tokens_half",
        "n_types_half",
        F.expr("((_lnv - _lnvh) * 1000000) DIV (_lnn - _lnnh)").alias(
            "heaps_beta_micros"
        ),
    )
