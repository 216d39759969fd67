"""Streaming event-pattern spans — the stream form of
``operators/patterns.py::pattern_spans`` (VERDICT r08 #6), completing the
batch/stream unification story for the pattern family the way q109 did for
the stateless quality filters and q96/q37 for dedup/aggregation.

Batch ``pattern_spans`` is ONE window pass per user: for each ``then``
event, the latest strictly-earlier ``first`` event, kept when no ``deny``
event sits strictly between them. That running-max-over-history shape is
exactly a keyed streaming state machine: per user, carry (latest anchor µs,
latest deny µs) and decide each arriving ``then`` event against the carried
state — O(1) state per user, no buffering of history. Decisions are
emitted append-only: a span, once emitted, is final (the open-interval veto
only depends on events BEFORE the span's end, which the ordering contract
below has already delivered).

ORDERING CONTRACT (documented, enforced by the q145 source): each user's
events must arrive in nondecreasing event-time order ACROSS microbatches,
with same-microsecond rows co-batched not required — the matcher applies
the strict-precedence rule to the carried state too, so an anchor that
straddles a batch boundary at the same microsecond as a target still
cannot count as "before" it. Within a microbatch, arbitrary row order is
fine (the matcher sorts the group's Arrow batch). This is the monotone
log-segment replay shape (Kafka per-key ordering, time-partitioned file
drops); true out-of-order ingestion needs watermark-delayed evaluation —
buffer events until the watermark passes, then run this same matcher over
the released prefix — which is a composition of the session-window flush
machinery (streaming/events.py) with this operator, not a different
algorithm.

Scale: state is 4 scalars per distinct user, hash-partitioned by the user
key into the state store — the same shuffle key as the batch window pass,
so skew reasoning carries over; a hot user costs one sorted scan of its
per-batch slice, never a self-join. The matcher is vectorized numpy over
each group's Arrow batch (prefix maxima + one searchsorted), not a Python
row loop.

Reference anchor: the reference pipeline has no streaming surface
(SURVEY.md §2.8); this extends the engine's pattern family (q137/q138/
q141) to the stream side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# sentinel for "no event seen yet" — any real unix_micros beats it
_ABSENT = np.iinfo(np.int64).min

SPANS_STATE = "has_first boolean, last_first bigint, has_deny boolean, last_deny bigint"


def _decide_spans(us, t, first: str, then: str, deny_list: list[str], seed_first, seed_deny):
    """The span decision core over a SORTED µs window with carried seeds —
    ONE implementation shared by the in-order matcher and the
    watermark-buffered out-of-order matcher (r10): returns
    ``(hit mask, per-row last_first, new_first, new_deny)``.

    Prefix maxima INCLUDE row i; the strictly-before lookup rewinds to the
    last row with a smaller µs (searchsorted 'left') — the window half of
    the strict-precedence SET rule. Carried state joins under the SAME
    strict rule: a prior-window anchor at the target's exact µs is not
    "before" it, so a window boundary can never split the engines on a
    tie."""
    is_first = t == first
    # single-deny fast path (r13): np.isin pays ~30µs of set machinery per
    # call; the gates' deny lists are 0-1 types and this function runs once
    # per user per microbatch
    if not deny_list:
        is_deny = np.zeros(len(t), dtype=bool)
    elif len(deny_list) == 1:
        is_deny = t == deny_list[0]
    else:
        is_deny = np.isin(t, deny_list)
    is_then = t == then
    if not is_then.any():
        # no target in the window (the common per-microbatch case for most
        # users): only the carried seeds can change — skip the prefix
        # maxima / searchsorted machinery entirely (r13, guide §4: the
        # per-group fixed cost IS this family's bottleneck)
        fu = us[is_first]
        du = us[is_deny]
        new_first = max(seed_first, fu.max()) if len(fu) else seed_first
        new_deny = max(seed_deny, du.max()) if len(du) else seed_deny
        empty = np.zeros(len(t), dtype=bool)
        return empty, us, new_first, new_deny
    cf = np.maximum.accumulate(np.where(is_first, us, _ABSENT))
    cd = np.maximum.accumulate(np.where(is_deny, us, _ABSENT))
    k = np.searchsorted(us, us, side="left") - 1
    ki = np.clip(k, 0, None)
    last_first = np.where(k >= 0, cf[ki], _ABSENT)
    last_deny = np.where(k >= 0, cd[ki], _ABSENT)
    last_first = np.maximum(last_first, np.where(us > seed_first, seed_first, _ABSENT))
    last_deny = np.maximum(last_deny, np.where(us > seed_deny, seed_deny, _ABSENT))
    hit = (
        is_then
        & (last_first != _ABSENT)
        & ((last_deny == _ABSENT) | (last_deny <= last_first))
    )
    new_first = max(seed_first, cf[-1]) if len(cf) else seed_first
    new_deny = max(seed_deny, cd[-1]) if len(cd) else seed_deny
    return hit, last_first, new_first, new_deny


def _make_span_matcher(first: str, then: str, deny: set[str]):
    deny_list = sorted(deny)

    def match(key, pdfs, state: GroupState):
        if state.exists:
            has_f, lf, has_d, ld = state.get
            seed_first = np.int64(lf) if has_f else _ABSENT
            seed_deny = np.int64(ld) if has_d else _ABSENT
        else:
            seed_first = seed_deny = _ABSENT
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        # stable sort: equal-µs rows keep arrival order, but the decision
        # rule is a SET rule over strictly-earlier µs, so their relative
        # order cannot change any emitted span. Sorted as raw numpy (r13):
        # pandas sort_values rebuilds a whole frame per group and this
        # runs once per user per microbatch (guide §4 per-group cost).
        us0 = pdf["__us"].to_numpy(dtype=np.int64)
        order = np.argsort(us0, kind="stable")
        us = us0[order]
        t = pdf["__t"].to_numpy()[order]
        hit, last_first, new_first, new_deny = _decide_spans(
            us, t, first, then, deny_list, seed_first, seed_deny
        )
        state.update(
            (
                bool(new_first != _ABSENT),
                int(new_first) if new_first != _ABSENT else 0,
                bool(new_deny != _ABSENT),
                int(new_deny) if new_deny != _ABSENT else 0,
            )
        )
        if hit.any():
            yield pd.DataFrame(
                {
                    "user": np.repeat(key[0], int(hit.sum())),
                    "start_us": last_first[hit],
                    "end_us": us[hit],
                }
            )

    return match


def streaming_pattern_spans(
    events: DataFrame,
    first: str,
    then: str,
    deny: list[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Matched (user, start_us, end_us) spans over an event STREAM, with
    pattern_spans' exact batch semantics: every ``then`` event pairs with
    its latest strictly-earlier ``first`` event and survives only if no
    ``deny`` event falls strictly inside the open µs interval. NULL
    users/timestamps are excluded at intake (the batch operator's
    contract). Emits one row per matching ``then`` event — duplicates
    when several targets share a span, exactly like the batch window
    pass.

    State per user is (latest anchor µs, latest deny µs) — 4 scalars, no
    event buffering — under the module-level ordering contract
    (per-user nondecreasing event time across microbatches)."""
    deny = deny or []
    types = {first, then, *deny}
    user_field = next(f for f in events.schema.fields if f.name == user_col)
    ev = (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .filter(F.col(type_col).isin(*types))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("__t"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("user", user_field.dataType),
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
        ]
    )
    out = ev.groupBy("user").applyInPandasWithState(
        _make_span_matcher(first, then, set(deny)),
        outputStructType=out_schema,
        stateStructType=SPANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(F.col("user").alias(user_col), "start_us", "end_us")


def _advance_funnel(us, ty, t: list, steps: list[str]) -> list:
    """The funnel advance core over ONE event window with carried
    first-touch µs — sequential per-step minima, each vectorized: t_i is
    fixed before t_{i+1} is derived, so a window containing several
    consecutive steps' events advances through all of them in one pass.
    Shared by the in-order matcher (whole batch = the window, exhaustive
    under the module ordering contract) and the watermark-buffered
    out-of-order matcher (window = the released prefix — r10)."""
    k = len(steps)
    for i in range(k):
        if t[i] != _ABSENT:
            continue  # first touch: an earlier window's min stays
        if i > 0 and t[i - 1] == _ABSENT:
            break
        cand = us[(ty == steps[i]) & (us > t[i - 1] if i > 0 else np.ones(len(us), dtype=bool))]
        if len(cand):
            t[i] = int(cand.min())
        else:
            break
    return t


def _make_funnel_matcher(steps: list[str]):
    k = len(steps)

    def match(key, pdfs, state: GroupState):
        t = list(state.get) if state.exists else [int(_ABSENT)] * k
        before = sum(1 for x in t if x != _ABSENT)
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        us = pdf["__us"].to_numpy(dtype=np.int64)
        ty = pdf["__t"].to_numpy()
        t = _advance_funnel(us, ty, t, steps)
        after = sum(1 for x in t if x != _ABSENT)
        state.update(tuple(t))
        if after > before:
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "reached": [after],
                    **{
                        f"us{i + 1}": [t[i] if t[i] != _ABSENT else None]
                        for i in range(k)
                    },
                }
            )

    return match


def streaming_funnel_trajectories(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch funnel trajectories over an event STREAM — the stream
    form of ``operators/funnel.py::funnel_trajectories`` under this
    module's ordering contract: per user the state is the k first-touch
    completion µs (k scalars — never buffered events), and step i+1
    completes when an event of its type lands STRICTLY after the carried
    t_i. Emits in UPDATE mode: one row per user per microbatch in which
    the user advanced ≥1 step — (user, reached, us1..usk). ``reached`` is
    monotone and us_j never changes once set (first touch = earliest), so
    the latest row per user (max ``reached``) is the final trajectory;
    aggregate those for the funnel report.

    NULL users/timestamps are excluded at intake (the batch operator's
    contract). Scale: state is k bigints per user in the state store,
    hash-partitioned on the user key — the same shuffle as every step of
    the batch funnel chain."""
    if not steps:
        raise ValueError("streaming_funnel_trajectories: empty step list")
    user_field = next(f for f in events.schema.fields if f.name == user_col)
    ev = (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .filter(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("__t"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("user", user_field.dataType),
            T.StructField("reached", T.IntegerType()),
            *[T.StructField(f"us{i + 1}", T.LongType()) for i in range(len(steps))],
        ]
    )
    state_schema = ", ".join(f"t{i + 1} bigint" for i in range(len(steps)))
    out = ev.groupBy("user").applyInPandasWithState(
        _make_funnel_matcher(list(steps)),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        F.col("user").alias(user_col), "reached", *[f"us{i + 1}" for i in range(len(steps))]
    )


# ---------------------------------------------------------------------------
# Out-of-order streaming pattern spans (r10 — VERDICT r09 Next #4): the
# module ordering contract, PRODUCED instead of assumed. Events buffer in
# per-user state until the WATERMARK passes them; the released prefix —
# now guaranteed complete and re-sorted — runs through the SAME decision
# core as the in-order matcher (_decide_spans), carrying the same 4-scalar
# seeds across releases. Soundness: an event is released only when
# strictly below the watermark, and every future arrival is at-or-above
# it (later rows are late beyond the declared bound and dropped, exactly
# the watermark contract every Spark aggregation applies) — so nothing
# that could anchor or veto a released decision can arrive afterwards,
# and append-mode emission stays final. State per user is the 4 scalars
# plus ONLY the inside-the-disorder-window buffer (watermark-bounded, the
# session-window flush discipline of streaming/events.py), never full
# history. Flushing the trailing buffer on a finite replay needs the
# watermark to advance past it and ONE further microbatch to fire the
# event-time timeouts — the two-sentinel staging in
# events.read_events_stream_late_shifted.
# ---------------------------------------------------------------------------

BUFFERED_SPANS_STATE = (
    SPANS_STATE + ", pend_us array<bigint>, pend_t array<string>"
)


def _make_buffered_span_matcher(first: str, then: str, deny: set[str]):
    deny_list = sorted(deny)

    def match(key, pdfs, state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = np.int64(wm_ms) * 1000
        if state.exists:
            has_f, lf, has_d, ld, pus, pt = state.get
            seed_first = np.int64(lf) if has_f else _ABSENT
            seed_deny = np.int64(ld) if has_d else _ABSENT
            # no list() copy before asarray (r13): the state tuple already
            # holds sequences, and this runs once per user per microbatch
            pend_us = np.asarray(pus if pus is not None else (), dtype=np.int64)
            pend_t = np.asarray(pt if pt is not None else (), dtype=object)
        else:
            seed_first = seed_deny = _ABSENT
            pend_us = np.empty(0, dtype=np.int64)
            pend_t = np.empty(0, dtype=object)
        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            if len(pend_us):
                us_all = np.concatenate([pend_us, pdf["__us"].to_numpy(dtype=np.int64)])
                t_all = np.concatenate([pend_t, pdf["__t"].to_numpy(dtype=object)])
            else:  # empty buffer (the common case): no concat copies
                us_all = pdf["__us"].to_numpy(dtype=np.int64)
                t_all = pdf["__t"].to_numpy(dtype=object)
        else:  # timeout invocation: release from the buffer alone
            us_all, t_all = pend_us, pend_t
        order = np.argsort(us_all, kind="stable")
        us_all, t_all = us_all[order], t_all[order]
        # released prefix: strictly below the watermark (future arrivals
        # are ≥ wm, so strictness keeps the no-retraction guarantee even
        # for a future event AT the watermark)
        cut = int(np.searchsorted(us_all, wm_us, side="left"))
        ready_us, ready_t = us_all[:cut], t_all[:cut]
        rest_us, rest_t = us_all[cut:], t_all[cut:]
        hit = None
        if len(ready_us):
            hit, last_first, seed_first, seed_deny = _decide_spans(
                ready_us, ready_t, first, then, deny_list, seed_first, seed_deny
            )
        state.update(
            (
                bool(seed_first != _ABSENT),
                int(seed_first) if seed_first != _ABSENT else 0,
                bool(seed_deny != _ABSENT),
                int(seed_deny) if seed_deny != _ABSENT else 0,
                # tolist() converts in C (r13): the per-element Python
                # loops dominated the no-pending path's state write
                rest_us.tolist(),
                [str(x) for x in rest_t],
            )
        )
        if len(rest_us):
            # wake this key when the watermark passes its oldest pending
            # event, even if no new rows arrive for it (ms floor: wm > ts
            # in ms implies wm_us > pend_us — strict release preserved)
            state.setTimeoutTimestamp(max(int(rest_us.min() // 1000), wm_ms + 1))
        if hit is not None and hit.any():
            yield pd.DataFrame(
                {
                    "user": np.repeat(key[0], int(hit.sum())),
                    "start_us": last_first[hit],
                    "end_us": ready_us[hit],
                }
            )

    return match


def streaming_pattern_spans_ooo(
    events: DataFrame,
    first: str,
    then: str,
    deny: list[str] | None = None,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``streaming_pattern_spans`` for OUT-OF-ORDER arrival: per-user
    event-time disorder up to ``watermark`` is absorbed by a state buffer
    and decisions are made only over the watermark-released prefix —
    semantics remain EXACTLY the batch window pass (q137's SQL), including
    strict-precedence µs ties across release boundaries. Rows later than
    the watermark bound are dropped (the standard contract); state per
    user is 4 scalars + the inside-the-bound buffer. Emission stays
    append-mode final. NULL users/timestamps are excluded at intake."""
    deny = deny or []
    types = {first, then, *deny}
    user_field = next(f for f in events.schema.fields if f.name == user_col)
    ev = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .filter(F.col(type_col).isin(*types))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("__t"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
            # the watermark-tagged TIMESTAMP column must survive the
            # projection — event-time timeout resolves its delay through
            # this attribute; the matcher ignores it (decisions are on the
            # integer µs)
            F.col(ts_col).alias("__ts"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("user", user_field.dataType),
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
        ]
    )
    out = ev.groupBy("user").applyInPandasWithState(
        _make_buffered_span_matcher(first, then, set(deny)),
        outputStructType=out_schema,
        stateStructType=BUFFERED_SPANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(F.col("user").alias(user_col), "start_us", "end_us")


def _make_buffered_funnel_matcher(steps: list[str]):
    k = len(steps)

    def match(key, pdfs, state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = np.int64(wm_ms) * 1000
        if state.exists:
            stored = state.get
            t = [int(x) for x in stored[:k]]
            pus, pt = stored[k], stored[k + 1]
            pend_us = np.asarray(pus if pus is not None else (), dtype=np.int64)
            pend_t = np.asarray(pt if pt is not None else (), dtype=object)
        else:
            t = [int(_ABSENT)] * k
            pend_us = np.empty(0, dtype=np.int64)
            pend_t = np.empty(0, dtype=object)
        before = sum(1 for x in t if x != _ABSENT)
        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            us_all = np.concatenate([pend_us, pdf["__us"].to_numpy(dtype=np.int64)])
            t_all = np.concatenate([pend_t, pdf["__t"].to_numpy(dtype=object)])
        else:  # timeout invocation
            us_all, t_all = pend_us, pend_t
        order = np.argsort(us_all, kind="stable")
        us_all, t_all = us_all[order], t_all[order]
        cut = int(np.searchsorted(us_all, wm_us, side="left"))
        if cut:
            t = _advance_funnel(us_all[:cut], t_all[:cut], t, steps)
        rest_us, rest_t = us_all[cut:], t_all[cut:]
        after = sum(1 for x in t if x != _ABSENT)
        state.update(
            tuple(t) + (rest_us.tolist(), [str(x) for x in rest_t])
        )
        if len(rest_us):
            state.setTimeoutTimestamp(max(int(rest_us.min() // 1000), wm_ms + 1))
        if after > before:
            yield pd.DataFrame(
                {
                    "user": [key[0]],
                    "reached": [after],
                    **{
                        f"us{i + 1}": [t[i] if t[i] != _ABSENT else None]
                        for i in range(k)
                    },
                }
            )

    return match


def streaming_funnel_trajectories_ooo(
    events: DataFrame,
    steps: list[str],
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``streaming_funnel_trajectories`` for OUT-OF-ORDER arrival — the
    same watermark-buffer machinery as ``streaming_pattern_spans_ooo``:
    per-user events buffer inside the watermark bound, the released
    prefix advances the carried first-touch vector through the SAME core
    as the in-order matcher (``_advance_funnel``), and event-time
    timeouts wake users whose buffers outlive their arrivals. Emission
    stays UPDATE-mode with the same finality argument: releases happen in
    event-time order, so a us_j, once set from a released prefix, is the
    true first touch (no earlier qualifying event can still arrive inside
    the declared bound). Rows later than the bound are dropped — the
    standard watermark contract."""
    if not steps:
        raise ValueError("streaming_funnel_trajectories_ooo: empty step list")
    user_field = next(f for f in events.schema.fields if f.name == user_col)
    ev = (
        events.withWatermark(ts_col, watermark)
        .filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .filter(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("__t"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
            # the watermark-tagged timestamp must survive the projection
            # (event-time timeout resolves its delay through it)
            F.col(ts_col).alias("__ts"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("user", user_field.dataType),
            T.StructField("reached", T.IntegerType()),
            *[T.StructField(f"us{i + 1}", T.LongType()) for i in range(len(steps))],
        ]
    )
    state_schema = (
        ", ".join(f"t{i + 1} bigint" for i in range(len(steps)))
        + ", pend_us array<bigint>, pend_t array<string>"
    )
    out = ev.groupBy("user").applyInPandasWithState(
        _make_buffered_funnel_matcher(list(steps)),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        F.col("user").alias(user_col), "reached", *[f"us{i + 1}" for i in range(len(steps))]
    )
