"""Ordered funnel analysis over an event stream — the product-analytics
sequence-match operator (SQL MATCH_RECOGNIZE's most common special case,
every event warehouse's conversion query) as chained keyed aggregates.

A user completes step k when an event of the step-k type occurs STRICTLY
AFTER their step-(k−1) completion time; completion time is the EARLIEST
such event (the standard "first touch" funnel, which makes the result
deterministic and maximizes downstream conversions — if any event order
completes the funnel, first-touch does).

Shape per step: filter the stream to the step's type (predicate pushed to
the scan), join against the previous step's per-user completion times on
the user key, one min-aggregate — every shuffle is on the SAME user key,
so one partitioning serves the whole chain. Per-step state is per-user
completion times: |users|-sized, never event-sized. The report is ONE
aggregate over the accumulated trajectory frame (step-k columns NULL for
users who dropped out), unpivoted via an array-of-structs explode.

Because step k's completions feed BOTH the trajectory chain and step
k+1's derivation, each per-step frame is a shared subplan; pass
``handles_out`` to lazily checkpoint them so the whole funnel costs one
type-filtered scan per step instead of re-deriving every prefix
(Catalyst does not dedupe repeated subplans — the q123/q126 lesson).
The caller owns releasing those handles (``etl.release_checkpoints``)
after its terminal action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_trajectories(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    handles_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-user completion times (user, t1, …, tk): t1 is always set
    (users who never start are absent); t_i is NULL once the user drops
    out. With ``handles_out`` a list, each per-step completion frame is
    lazily checkpointed and appended for the caller to release.

    One-shot cost note (VERDICT r07 #4, the documented contract): with
    ``handles_out=None`` step i's completion frame feeds BOTH step i+1's
    filter join and the trajectory join, and each completion embeds its
    predecessor exactly once — so the re-derivation telescopes
    ADDITIVELY: the step-1 scan runs k times and total events-scan
    executions are k(k+1)/2 per action (measured 3/6/10 at k=2/3/4;
    r08 review corrected an earlier exponential claim). Cheap one-shot
    at small k; for deep funnels or expensive upstream event plans,
    pass a list and release after the terminal action."""
    if not steps:
        raise ValueError("funnel_trajectories: empty step list")

    from kf_task_fhir_etl_spark.operators.lifecycle import staged

    def ck(df: DataFrame) -> DataFrame:
        return staged(df, handles_out)

    # NULL-timestamped events cannot be ordered in a funnel and would
    # make t1 NULL for a user whose only step-1 events carry NULL ts —
    # present in the trajectory but invisible to count(t1), silently
    # diverging from a COUNT(*)-over-users oracle (r07 review, third
    # pass). NULL users go too (r08 review, twelfth pass): the step-1
    # groupBy would otherwise mint one phantom pseudo-user from ALL
    # unattributed events — a "user" the step-2 equi-join can never
    # advance, disagreeing with pattern_spans' intake in this module's
    # sibling (SQL join semantics are the contract). Excluded at intake,
    # the q126 discipline.
    events = events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    completed = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    if len(steps) > 1:  # single consumer in a one-step funnel — see below
        completed = ck(completed)
    traj = completed
    for i, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("__ts")
        )
        completed = (
            ev.join(
                completed.select("user", F.col(f"t{i-1}").alias("__prev")), "user"
            )
            .filter(F.col("__ts") > F.col("__prev"))
            .groupBy("user")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        # the FINAL step's completions feed only the trajectory join (no
        # step k+1 derives from them) — not a shared subplan, so
        # checkpointing it would pin one needless |users|-sized frame per
        # call (r07 review, fourth pass)
        if i < len(steps):
            completed = ck(completed)
        traj = traj.join(completed, "user", "left")
    return traj


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    handles_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-step funnel report: (step_idx, step, n_users,
    avg_s_from_first) — users completing the k-prefix in order, and the
    mean seconds from step-1 to step-k completion among them (0.0 for
    step 1; rounded 4dp). The gap accumulation is INTEGER microseconds
    (unix_micros — timestamps are µs-precision, so each gap and the SUM
    are exact and associative in any partition order); only the final
    single division is double, so a sequential SQL engine computing the
    same integers lands on the same 4dp value (a double AVG's inner sum
    is partition-order dependent and can flip a rounding midpoint — the
    q129 decimal-accumulation lesson; r07 review). ONE aggregate over
    the trajectory frame."""
    traj = funnel_trajectories(
        events, steps, user_col, ts_col, type_col, handles_out
    )
    aggs = []
    for i, _ in enumerate(steps, start=1):
        aggs.append(F.count(F.col(f"t{i}")).alias(f"__n{i}"))
        if i > 1:
            # DECIMAL(38,0) accumulation: a plain bigint SUM of µs gaps
            # wraps past 2^63 at warehouse scale (~100M converting users
            # × day-scale gaps) while DuckDB's SUM(BIGINT) promotes to
            # HUGEINT — decimal keeps both engines exact and associative
            # (r07 review, fifth pass; the q129 revenue lesson)
            gap_us = F.sum(
                (
                    F.unix_micros(F.col(f"t{i}")) - F.unix_micros(F.col("t1"))
                ).cast("decimal(38,0)")
            )
            mean_s = F.when(
                F.count(F.col(f"t{i}")) == 0, F.lit(0.0)
            ).otherwise(
                F.round(
                    gap_us / (F.count(F.col(f"t{i}")) * F.lit(1000000.0)), 4
                )
            )
        else:
            mean_s = F.lit(0.0)
        aggs.append(mean_s.alias(f"__g{i}"))
    agg = traj.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
                F.col(f"__g{i}").alias("avg_s_from_first"),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")
