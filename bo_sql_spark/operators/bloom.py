"""Portable Bloom-filter sketch: build / merge / probe.

The missing member of the sketch family (Count-Min, HLL, MG heavy
hitters, sampled quantiles — all mergeable, all oracle-replayable):
an m-bit Bloom filter as (word, bits) rows. The 100 TB use is the
broadcast-a-FILTER-not-the-SET pattern: decontamination and
membership pre-checks broadcast kilobytes of bits instead of the
full key set, with the exact verify run only on probable hits.

Engine-portable by the same construction as the portable MinHash
(bloom reuses its md5-15-hex base hash and universal-family (a_i, b_i)
constants — operators/dedup.py:_pmh_ab), so a SQL oracle replays the
bit array WORD FOR WORD, false positives included: given the hash
family, which keys collide is deterministic, not a statistical claim.

Words are 62 bits, not 64: both engines can compute 1 << 61 in a
signed int64, while 1 << 63 is an overflow error in DuckDB and a sign
flip in Spark — the 2-bit waste buys bit-identical replays.

Merge = bit_or of word rows (union of key sets); the build is one
explode + one bit_or groupBy on m/62 word keys — map-side combined,
O(m) state regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bo_sql_spark.operators.dedup import _PMH_P, _pmh_ab

WORD_BITS = 62


def _bit_positions(hb: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) from the universal family —
    position i is ((a_i*hb + b_i) mod P) mod m_bits."""
    out = []
    for i in range(k):
        a, b = _pmh_ab(i)
        out.append(
            F.pmod(F.pmod(hb * F.lit(a) + F.lit(b), F.lit(_PMH_P)), F.lit(m_bits))
        )
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 380928, k: int = 4
) -> DataFrame:
    """(word, bits) rows of the filter over the DISTINCT keys — at
    most ceil(m_bits/62) rows regardless of input size. m_bits should
    be a multiple of 62 and ~16x the expected distinct-key count for
    sub-percent FPR at k=4 ((1 - e^(-kn/m))^k)."""
    hb = F.expr(
        f"pmod(CAST(conv(substring(md5({key_col}), 1, 15), 16, 10)"
        f" AS BIGINT), {_PMH_P})"
    )
    poss = _bit_positions(hb, m_bits, k)
    stacked = keys.select(F.col(key_col)).distinct().select(
        F.explode(F.array(*poss)).alias("pos")
    )
    return (
        stacked.select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            # F.shiftleft needs a LITERAL shift count; the per-row shift
            # has to go through the SQL expression form
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Filter of the UNION of two key sets: bit_or of the word rows.
    Associative and commutative — shard/microbatch filters fold in
    any order (asserted in tests)."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    filt: DataFrame, probes: DataFrame, key_col: str, m_bits: int = 380928, k: int = 4
) -> DataFrame:
    """(key, bloom_hit) per DISTINCT probe key: hit iff all k bits are
    set. The filter side is tiny (m/62 rows) — Spark broadcasts it, so
    the probe is a map over the corpus; a missing word row means those
    bits were never set (LEFT join, miss)."""
    hb = F.expr(
        f"pmod(CAST(conv(substring(md5({key_col}), 1, 15), 16, 10)"
        f" AS BIGINT), {_PMH_P})"
    )
    poss = _bit_positions(hb, m_bits, k)
    stacked = (
        probes.select(F.col(key_col)).distinct()
        .select(
            key_col,
            F.explode(F.array(*poss)).alias("pos"),
        )
        .select(
            key_col,
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias("mask"),
        )
    )
    joined = stacked.join(F.broadcast(filt), "word", "left")
    per_key = joined.groupBy(key_col).agg(
        F.sum(
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
                1,
            ).otherwise(0)
        ).alias("_set")
    )
    return per_key.select(
        key_col, (F.col("_set") == k).cast("long").alias("bloom_hit")
    )


def decontaminate_bloom(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    m_bits: int = 380928,
    k_hashes: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """dedup.decontaminate with the Bloom PREFILTER in front — same
    output exactly (no false negative can exist, so no contaminated
    doc escapes; false positives die in the exact verify), different
    scale shape: the corpus-side (doc_id, shingle) stream meets a
    ~48 KB broadcast BITSET first, and the string-keyed exact join
    against the eval shingle set runs only over the probable
    vocabulary (FPR + true-hit fraction of it) instead of every
    distinct corpus shingle. At 100 TB with a large eval suite this
    is the difference between broadcasting megabytes of shingle
    strings into every task and broadcasting kilobytes of bits.
    Returns (survivors, contaminated_ids) like the exact form."""
    from bo_sql_spark.functions import word_shingles

    ev_sh = (
        evalset.select(
            F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
        ).distinct()
    )
    filt = bloom_build(ev_sh, "shingle", m_bits, k_hashes)
    tr_sh = train.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    )
    probable = (
        bloom_probe(filt, tr_sh.select("shingle"), "shingle", m_bits, k_hashes)
        .filter(F.col("bloom_hit") == 1)
        .select("shingle")
    )
    confirmed = probable.join(F.broadcast(ev_sh), "shingle")
    contaminated = (
        tr_sh.join(F.broadcast(confirmed), "shingle").select(id_col).distinct()
    )
    survivors = train.join(contaminated, id_col, "left_anti")
    return survivors, contaminated
