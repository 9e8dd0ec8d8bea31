"""As-of join (point-in-time lookup) — an operator Spark lacks natively.

Semantics: for each left row, attach the single most recent right row
with right.ts <= left.ts within the same key (DuckDB's ASOF JOIN, pandas
merge_asof, kdb aj).

Implementation: ``applyInPandas`` cogroup over the key — both sides
shuffle ONCE on the key, then each group is merged with the
O(n log n) sorted two-pointer (pandas merge_asof). This is pattern (b)
from the build brief: composition can't express "latest per left row"
without an O(n*m) range join + argmax re-aggregation, so the Pandas
path is the right scale trade-off. Skewed keys: a hot key's group must
fit in one task — salt by coarse time bucket if a single key exceeds
memory (bucket boundaries then need a one-bucket lookback pass).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + most recent right row per key.

    ``on`` must be an orderable numeric column present in both sides
    (use int64 epoch nanos for timestamps — exact, no unit drift);
    ``by`` is the equality key. Right columns are suffixed ``_right``
    if they collide.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    lcols = left.columns
    out_fields = [left.schema[c] for c in lcols]
    right_out = []
    for c in rcols:
        name = c if c not in lcols else f"{c}_right"
        fld = right.schema[c]
        right_out.append((c, name, fld.dataType.simpleString()))
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + [f"`{name}` {dt}" for _, name, dt in right_out]
    )

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            for _, name, _dt in right_out:
                ldf[name] = None
            return ldf
        rdf = rdf.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf[[on] + [c for c, _, _ in right_out]],
            on=on,
            direction=direction,
            tolerance=tolerance,
            suffixes=("", "_right"),
        )
        for c, name, _dt in right_out:
            got = c if c in merged.columns and name not in merged.columns else name
            if got != name:
                merged[name] = merged[got]
                merged = merged.drop(columns=[got])
        return merged[[*lcols, *[name for _, name, _ in right_out]]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=schema)
    )
