"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in streaming surface (windowed aggs, session windows,
``dropDuplicates``) covers fixed semantics; these two operators are the
engine's extension point for *arbitrary* keyed state — the streaming
counterpart of the reference's target-ID cache (first-write-wins upsert
semantics, ``etl/ingest.py:513``) and of the dedup operator family.

State design for scale: state lives in the state store partitioned by the
grouping key — the same hash shuffle as a batch groupBy — so the operators
inherit Spark's state-store checkpointing, and state size is O(distinct
keys). For unbounded key spaces use the ``ttl`` variants (event-time timeout
evicts keys older than the watermark) exactly like a watermarked
``dropDuplicates``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT = "event_id long, ts timestamp, user_id long, event_type string, value double"
DEDUP_STATE = "seen boolean"


def _first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    # fold across ALL Arrow chunks before choosing the representative — a
    # group can span record batches, and picking from the first chunk only
    # would make the output depend on chunk boundaries
    best: pd.DataFrame | None = None
    for pdf in pdfs:
        if len(pdf):
            cand = pdf.sort_values(["ts", "value"]).head(1)
            best = cand if best is None else pd.concat([best, cand]).sort_values(["ts", "value"]).head(1)
    if best is not None:
        state.update((True,))
        # deterministic representative: earliest ts, then lowest value
        yield best[["event_id", "ts", "user_id", "event_type", "value"]]


def stateful_dedup(events: DataFrame) -> DataFrame:
    """First-seen-wins streaming dedup on ``event_id``: the first microbatch
    that carries a key emits exactly one row for it; every later occurrence
    is dropped against the keyed state. Unlike ``dropDuplicates`` this is an
    extension point — the emitted representative (and the state payload) are
    arbitrary Python over the group's Arrow batch."""
    return events.groupBy("event_id").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
TOTALS_STATE = "n bigint, total double"


def _running_totals(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    # emit the RAW sum: rounding happens in the wrapping DataFrame with
    # F.round, which matches SQL ROUND (decimal half-away) — Python round()
    # is binary half-to-even and diverges on .xx5 boundaries
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user (count, sum) re-emitted on every microbatch that
    touches the user — a custom stateful aggregate in ``update`` mode. The
    state is two scalars per user; arrival order across batches does not
    change the final row (addition commutes)."""
    from pyspark.sql import functions as F

    out = events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=TOTALS_OUTPUT,
        stateStructType=TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
