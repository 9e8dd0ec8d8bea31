"""Result formatters: aligned-markdown and CSV.

Mirrors the reference's output surface (reference src/exec/formatter.cpp):
- markdown: pipe table with per-column width alignment and the literal
  ``(no results)`` for empty results (formatter.cpp:31-66)
- csv: RFC-ish quoting of separator/quote/newline (formatter.cpp:68-128)

Formatting happens driver-side on collected rows — these are terminal
surfaces for a human; any at-scale export goes through
``df.write.parquet/csv`` instead (distributed, never through the driver).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

MAX_ROWS_DEFAULT = 1000


def _cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"  # reference prints doubles via std::to_string (6dp)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def to_markdown(df: DataFrame, max_rows: int = MAX_ROWS_DEFAULT) -> str:
    """Aligned markdown pipe table (reference formatter.cpp:31-66)."""
    cols = df.columns
    rows = [[_cell(v) for v in row] for row in df.limit(max_rows).collect()]
    if not rows:
        return "(no results)"
    widths = [
        max(len(c), *(len(r[i]) for r in rows)) for i, c in enumerate(cols)
    ]
    def line(cells: list[str]) -> str:
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    sep = "|-" + "-|-".join("-" * w for w in widths) + "-|"
    return "\n".join([line(list(cols)), sep, *(line(r) for r in rows)])


def _csv_quote(s: str, sep: str = ",") -> str:
    if any(ch in s for ch in (sep, '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def to_csv(df: DataFrame, max_rows: int = MAX_ROWS_DEFAULT, sep: str = ",") -> str:
    """CSV with RFC-4180 quoting (reference formatter.cpp:68-128)."""
    out = [sep.join(_csv_quote(c, sep) for c in df.columns)]
    for row in df.limit(max_rows).collect():
        out.append(sep.join(_csv_quote(_cell(v), sep) for v in row))
    return "\n".join(out)


FORMATTERS = {"markdown": to_markdown, "csv": to_csv}
