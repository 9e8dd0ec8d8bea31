"""Data-layout operators: range-sorted and Z-ordered parquet layouts,
plus footer-stats inspection to PROVE the skipping they buy.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet row-group (and file) min/max statistics let the reader skip
whole row groups whose [min, max] cannot satisfy a pushed predicate.
That only works if the writer CLUSTERED the data:

- ``write_range_sorted``: global range partition + in-file sort on one
  key — row groups become disjoint key ranges, so a selective range
  predicate on THAT key touches ~selectivity * N row groups instead of
  all of them. The right layout when one column dominates predicates
  (time-series: ship date / event time).
- Z-order (``zorder_code``): interleave the bits of two bucketed keys
  and sort by the interleaved code — each row group then spans a small
  RECTANGLE in (x, y) space, so range predicates on EITHER column (or
  both) skip row groups, at the cost of neither being perfectly
  clustered. The classic multi-dimensional layout (Morton order) that
  lakehouse engines expose as OPTIMIZE ZORDER BY.

``rowgroup_spans`` reads the parquet footers (pyarrow, no Spark job)
and returns each row group's [min, max] for a column — the ground
truth of what any engine's reader could skip; the unit tests assert
overlap fractions from it and SCALE.md records the measurements.

The reference engine (bolu-atx/bo-sql) has no layout control at all —
its columnar store is a single in-memory table (src/storage/table.h);
this module is part of the beyond-reference 100 TB surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_code(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton (Z-order) code of two NON-NEGATIVE integer columns, each
    already bucketed into [0, 2^bits): x's bit b lands at position 2b,
    y's at 2b+1. Pure BIGINT shifts/masks — identical arithmetic is
    replayable in any engine (the DuckDB oracle runs the same
    expression), deterministic, no UDF. 2*bits <= 62 keeps every
    intermediate in BIGINT range."""
    if 2 * bits > 62:
        raise ValueError(f"bits={bits} too large: 2*bits must be <= 62")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    code = F.lit(0).cast("long")
    for b in range(int(bits)):
        code = (
            code
            + F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return code


def zorder_code_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical Morton code as ANSI/DuckDB SQL text (for oracles)."""
    terms = []
    for b in range(int(bits)):
        terms.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def write_range_sorted(
    df: DataFrame, path: str, order_cols: list[str], n_files: int = 8
) -> None:
    """Range-partition into ``n_files`` output files and sort inside
    each: globally sorted layout => disjoint per-file AND per-row-group
    [min, max] ranges on the leading key. repartitionByRange samples
    split points, so files come out near-equal — the write itself is
    one range shuffle, the price paid ONCE so that every later
    selective scan reads ~selectivity of the data."""
    cols = [F.col(c) for c in order_cols]
    (
        df.repartitionByRange(int(n_files), *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_spans(path: str, column: str) -> list[tuple]:
    """[(min, max)] for ``column`` across every row group of every
    parquet file under ``path`` — straight from the footers via
    pyarrow, no Spark job. This is exactly the information a reader's
    predicate pushdown consults, so 'fraction of spans overlapping a
    predicate range' IS the fraction of row groups that engine-side
    skipping must read."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def overlap_fraction(spans: list[tuple], lo, hi) -> float:
    """Fraction of row groups whose [min, max] intersects [lo, hi] —
    i.e. the fraction a stats-aware reader has to actually decode."""
    if not spans:
        return 0.0
    hit = sum(1 for mn, mx in spans if not (mx < lo or mn > hi))
    return hit / len(spans)
