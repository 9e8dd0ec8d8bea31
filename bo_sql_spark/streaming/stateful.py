"""Custom stateful streaming operator: click->purchase funnel.

Semantics (non-consuming attribution): a purchase converts if the same
user's most recent PRIOR event of type 'click' happened within the
attribution window. Emits one append-mode row per conversion.

This is the operator class Spark's built-in windows can't express —
per-key evolving state with order-dependent transitions — implemented
with ``applyInPandasWithState``: state is one int64 (last click micros)
per user, updated as batches stream through; conversions emit
incrementally. State size is O(|users|), independent of event volume,
and the watermark-free design here relies on event-time ordering within
the bounded replay (production use adds a timeout to reap idle users).

The bounded availableNow replay delivers each user's history in one
ordered pass, so the result equals the batch window-function rewrite
(LAST prior click via max-over-preceding-rows) — which is exactly what
the DuckDB oracle runs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

ATTRIBUTION_WINDOW_US = 30 * 60 * 1_000_000  # 30 minutes

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_tsn", LongType()),
        StructField("purchase_tsn", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("last_click_tsn", LongType())])


def funnel_conversions(
    stream: DataFrame, window_us: int = ATTRIBUTION_WINDOW_US
) -> DataFrame:
    """Append-mode stream of (user_id, click_tsn, purchase_tsn) conversions.

    Input needs columns user_id, event_type, event_id and ts_ns (int64).
    Rows are processed in (tsn, event_id) order within each batch; state
    carries the last click across batches.
    """
    events = stream.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("tsn"),
    )

    def track(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_click = state.get[0] if state.exists else None
        out_users, out_clicks, out_purchases = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["tsn", "event_id"], kind="mergesort")
            for etype, tsn in zip(pdf["event_type"], pdf["tsn"]):
                tsn = int(tsn)
                if etype == "click":
                    last_click = tsn
                elif (
                    etype == "purchase"
                    and last_click is not None
                    and tsn - last_click <= window_us
                ):
                    out_users.append(user_id)
                    out_clicks.append(last_click)
                    out_purchases.append(tsn)
        if last_click is not None:
            state.update((last_click,))
        if out_users:
            yield pd.DataFrame(
                {
                    "user_id": out_users,
                    "click_tsn": out_clicks,
                    "purchase_tsn": out_purchases,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_conversions_tws(
    stream: DataFrame, window_us: int = ATTRIBUTION_WINDOW_US
) -> DataFrame:
    """`transformWithStateInPandas` port of ``funnel_conversions``.

    Same semantics and state shape (one int64 last-click per user) on
    the current arbitrary-state API: a StatefulProcessor with a named
    ValueState replaces the positional GroupState tuple. The newer API
    buys composable typed state (value/list/map), timers, and TTL —
    none needed here, but production stateful operators should start
    from this surface; applyInPandasWithState is the compatibility
    path. Requires the RocksDB state store provider (set by the caller;
    see stream_funnel_conversions_tws).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    events = stream.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("tsn"),
    )

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last_click = handle.getValueState("last_click", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values: Any
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            last_click = (
                self._last_click.get()[0] if self._last_click.exists() else None
            )
            out_users, out_clicks, out_purchases = [], [], []
            for pdf in rows:
                pdf = pdf.sort_values(["tsn", "event_id"], kind="mergesort")
                for etype, tsn in zip(pdf["event_type"], pdf["tsn"]):
                    tsn = int(tsn)
                    if etype == "click":
                        last_click = tsn
                    elif (
                        etype == "purchase"
                        and last_click is not None
                        and tsn - last_click <= window_us
                    ):
                        out_users.append(user_id)
                        out_clicks.append(last_click)
                        out_purchases.append(tsn)
            if last_click is not None:
                self._last_click.update((last_click,))
            if out_users:
                yield pd.DataFrame(
                    {
                        "user_id": out_users,
                        "click_tsn": out_clicks,
                        "purchase_tsn": out_purchases,
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        FunnelProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
