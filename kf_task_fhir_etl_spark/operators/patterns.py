"""Event-pattern detection over per-user event streams — the
MATCH_RECOGNIZE-shaped generalization of the funnel (VERDICT r07 #6):
ordered sequences with NEGATION ("view then purchase with NO error
between"), the product-analytics primitive every event warehouse ships.

Two semantics, both deliberate and documented (they answer different
questions; neither is a backtracking regex engine):

- ``pattern_spans`` — EXISTENTIAL, all matches: every (anchor, target)
  pair where the target event's nearest preceding anchor has no denied
  event strictly between them. Linear: one window pass per user, no
  self-join, so a user with millions of events costs one sorted scan.
- ``funnel_with_negation`` — FIRST-TOUCH trajectory with transition
  veto: the k-step funnel (operators/funnel.py) where each transition
  (step i → step i+1) can name denied event types; a denied event
  strictly inside the user's first-touch transition window voids that
  step and every later step. NOT a backtracking matcher: if the
  earliest window is dirty, a later clean pair does not resurrect the
  user — use ``pattern_spans`` for existential semantics.

Timestamps compare as INTEGER microseconds (unix_micros) everywhere —
interval boundaries are exact, and a SQL oracle lands on identical
integers (epoch_us) with no float anywhere near the decision.

Reference anchor: the reference pipeline has no event-pattern operator;
this extends the engine's §2.6/§2.8 analytics surface alongside
sessionization (q22) and the plain funnel (q134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pattern_spans(
    events: DataFrame,
    first: str,
    then: str,
    deny: list[str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """All matched spans (user, start_us, end_us): for every ``then``
    event, the LATEST strictly-earlier ``first`` event by the same user,
    kept only when no ``deny``-typed event falls STRICTLY between them
    (open interval — a denied event tied to either endpoint's microsecond
    does not void the span). NULL-timestamped events are excluded at
    intake (they cannot be ordered — the funnel's q134 discipline).

    Plan shape: the scan is pruned to the three type sets (predicate
    pushdown), then ONE window pass per user ordered by integer µs with a
    RANGE frame ending 1µs before the current row — running max of
    anchor-µs and deny-µs. The strict-precedence rule is therefore a SET
    rule (max ts < t), never a row-order rule, so same-µs ties cannot
    make the two engines disagree on "before". One shuffle on the user
    key, linear per user — no per-user self-join, no skew amplification
    for hot users. Survival: the latest deny at or before the anchor is
    harmless (``last_deny <= last_first``); any deny after it sits inside
    the open interval and kills the span.
    """
    deny = deny or []
    types = {first, then, *deny}
    us = F.unix_micros(F.col(ts_col))
    ev = (
        # NULL users excluded like NULL timestamps (r08 review, third
        # pass): partitionBy groups all NULL users into ONE partition and
        # would emit spans for unattributed events, where every
        # relational formulation (and the funnel's equi-joins) drops
        # NULL keys — the SQL join semantics are the contract
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .filter(F.col(type_col).isin(*types))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("__t"),
            us.alias("__us"),
        )
    )
    w = (
        Window.partitionBy("user")
        .orderBy("__us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    last_first = F.max(F.when(F.col("__t") == first, F.col("__us"))).over(w)
    last_deny = (
        F.max(F.when(F.col("__t").isin(*deny), F.col("__us"))).over(w)
        if deny
        else F.lit(None).cast("bigint")
    )
    return (
        ev.select(
            "user",
            F.col("__t"),
            F.col("__us").alias("end_us"),
            last_first.alias("start_us"),
            last_deny.alias("__deny_us"),
        )
        .filter(
            (F.col("__t") == then)
            & F.col("start_us").isNotNull()
            & (F.col("__deny_us").isNull() | (F.col("__deny_us") <= F.col("start_us")))
        )
        .select(F.col("user").alias(user_col), "start_us", "end_us")
    )


def funnel_with_negation(
    events: DataFrame,
    steps: list[str],
    denies: list[list[str]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    handles_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-step strict-funnel report (step_idx, step, n_users): the
    first-touch k-step funnel where transition i → i+1 is VOIDED when any
    event typed in ``denies[i-1]`` lands strictly inside the user's open
    transition window (t_i, t_{i+1}); a voided transition removes the
    user from step i+1 AND every later step (the void cascades — the
    funnel is a prefix property). ``denies`` has ``len(steps) - 1``
    entries; empty lists mean an unguarded transition (plain q134
    semantics for that hop).

    Plan shape: the trajectory comes from ``funnel_trajectories`` (per
    step: one pruned scan + one user-key join + min-aggregate); the veto
    pass is ONE additional scan of the union of all denied types, one
    user-key join against the per-user trajectory row, and one groupBy —
    all shuffles on the same user key, however many transitions are
    guarded. The report is one aggregate over the flagged trajectory.
    ``handles_out`` follows the funnel_counts contract (per-step frames
    lazily checkpointed for the CALLER to release; None = one-shot with
    the documented re-derivation multiplier).
    """
    if len(denies) != len(steps) - 1:
        raise ValueError(
            f"funnel_with_negation: need {len(steps) - 1} deny sets for "
            f"{len(steps)} steps, got {len(denies)}"
        )
    from kf_task_fhir_etl_spark.operators.funnel import funnel_trajectories
    from kf_task_fhir_etl_spark.operators.lifecycle import staged

    traj = funnel_trajectories(events, steps, user_col, ts_col, type_col, handles_out)
    all_denied = sorted({t for ds in denies for t in ds})
    if all_denied:
        # traj feeds TWO consumers only when some transition is guarded
        # (the vetoes join + the flagged join); with every deny set empty
        # it has one consumer and staging would pin a needless
        # |users|-sized frame per call — the funnel_trajectories
        # final-step discipline (r08 review, sixteenth pass; one block
        # with the veto pass so the staging decision can never
        # desynchronize from it, seventeenth pass).
        # Project every step timestamp to integer µs ONCE here (VERDICT
        # r08 #1): the veto aggregate previously converted the same t{i}
        # columns k times per denied event — codegen made that nearly
        # free, but the per-transition unix_micros calls bloated the
        # aggregate's expression tree. |users| × k bigints of extra
        # checkpoint width, trivial.
        traj = staged(
            traj.select(
                "*",
                *[
                    F.unix_micros(F.col(f"t{i}")).alias(f"__us{i}")
                    for i in range(1, len(steps) + 1)
                ],
            ),
            handles_out,
        )
        deny_ev = (
            events.filter(F.col(ts_col).isNotNull())
            .filter(F.col(type_col).isin(*all_denied))
            .select(
                F.col(user_col).alias("user"),
                F.col(type_col).alias("__t"),
                F.unix_micros(F.col(ts_col)).alias("__us"),
            )
        )
        # one pass: every guarded transition's veto folds in the same
        # aggregate — a denied event is tested against the open µs window
        # of each transition that names its type
        vetoes = (
            deny_ev.join(traj, "user")
            .groupBy("user")
            .agg(
                *[
                    F.max(
                        F.when(
                            F.col("__t").isin(*ds)
                            & (F.col("__us") > F.col(f"__us{i}"))
                            & (F.col("__us") < F.col(f"__us{i + 1}")),
                            1,
                        ).otherwise(0)
                    ).alias(f"__v{i}")
                    for i, ds in enumerate(denies, start=1)
                    if ds
                ]
            )
        )
        flagged = traj.join(vetoes, "user", "left")
    else:
        flagged = traj
    # reach_j: t_j present AND every guarded transition before j is clean
    # (users absent from the veto frame had no denied events at all)
    clean = F.lit(True)
    reach = [F.col("t1").isNotNull()]
    for i, ds in enumerate(denies, start=1):
        if ds:
            clean = clean & (F.coalesce(F.col(f"__v{i}"), F.lit(0)) == 0)
        reach.append(F.col(f"t{i + 1}").isNotNull() & clean)
    counts = flagged.agg(
        *[F.sum(r.cast("bigint")).alias(f"__n{j}") for j, r in enumerate(reach, start=1)]
    )
    rows = [
        F.struct(
            F.lit(j).alias("step_idx"),
            F.lit(step).alias("step"),
            F.coalesce(F.col(f"__n{j}"), F.lit(0)).alias("n_users"),
        )
        for j, step in enumerate(steps, start=1)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def value_runs(
    df: DataFrame,
    group_col: str,
    order_col: str,
    flag_col: str,
    tiebreak_cols: list[str] | None = None,
    min_len: int = 1,
) -> DataFrame:
    """Maximal consecutive runs of a TRUE boolean per group — the
    gaps-and-islands primitive ("3 consecutive months over quota", "N
    declining readings in a row"): (group, run_start, run_end, run_len)
    where start/end are the ``order_col`` values at the run's endpoints.

    Runs are defined over the TOTAL order (order_col, *tiebreak_cols) —
    callers MUST pass tiebreakers whenever order_col can tie within a
    group, or run boundaries are nondeterministic (and no oracle can pin
    them). NULL flags break runs exactly like False ones (a run is
    consecutive TRUE rows; NULL is not TRUE) but are kept as rows — they
    separate the runs around them.

    Plan shape: ONE shuffle on the group key; the change-flag lag and the
    running run-id sum share one partitioning+sort (two Window nodes over
    one Exchange — Catalyst extracts the nested lag into its own Window,
    but the exchange and sort are shared), then one groupBy on
    (group, run_id) — same key, no second exchange. The
    change-flag method (flag != lag(flag) → cumulative sum) is
    deliberately different from the classic row_number-difference
    formulation so a SQL oracle using the latter is an independent
    method."""
    ties = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(group_col).orderBy(F.col(order_col), *ties)
    is_true = F.col(flag_col).eqNullSafe(F.lit(True))
    change = (
        F.when(~is_true.eqNullSafe(F.lag(is_true).over(w)), 1).otherwise(0)
    )
    run_id = F.sum(change).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(group_col),
            F.col(order_col),
            is_true.alias("__f"),
            run_id.alias("__run"),
        )
        .filter(F.col("__f"))
        .groupBy(group_col, "__run")
        .agg(
            F.min(order_col).alias("run_start"),
            F.max(order_col).alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= min_len)
        .select(group_col, "run_start", "run_end", "run_len")
    )
