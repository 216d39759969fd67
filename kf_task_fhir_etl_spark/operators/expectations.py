"""Declarative data-quality expectations — the Deequ / Great-Expectations
constraint-suite shape as plain DataFrame plans (engine extension; the
reference repo validates inputs only via its count-match asserts,
SURVEY.md §2 A4 — this generalizes that discipline into a first-class
operator a 100 TB ingest pipeline runs before publishing a table).

Two execution shapes, chosen by what the check needs:

- **Aggregate checks** (uniqueness, null ratio, value range, accepted
  values): ALL checks against one table compile into a SINGLE ``agg``
  pass — N constraints cost one scan, not N (the per-metric expressions
  are plain codegen'd conditional counts; the one exact ``count_distinct``
  a uniqueness check adds is the standard expand-based two-phase exact
  distinct, still one scan of the data). Result rows are unpivoted from
  the single aggregate row driver-side-free via an array-of-structs
  explode.
- **Referential checks** (FK containment): one LEFT-ANTI join per check,
  orphan ROWS counted, NULL keys excluded (SQL FK semantics: a NULL
  foreign key is not a violation — it is the not-null check's job).
  The parent side reduces to its distinct key set before the join, so
  the build side is key-cardinality-sized and AQE broadcasts it when
  small.

Every check emits (constraint_name, metric, passed); suites union their
rows. ``metric`` is always the VIOLATION magnitude (duplicates, nulls,
out-of-range rows, orphans) so 0.0 means clean and ``passed`` is a pure
function of metric vs the check's threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RESULT_FIELDS = ("constraint_name", "metric", "passed")


def _violations(cond: Column) -> Column:
    """Count of rows where ``cond`` holds (NULL-safe: NULL ≠ violation).
    COALESCE pins the empty-table case: SUM over zero rows is NULL, which
    would make both metric and passed NULL — an alerting consumer and a
    proceed-on-pass consumer would BOTH skip the row silently (r07 review;
    the module contract is metric 0.0 = clean, empty table passes)."""
    return F.coalesce(
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
    ).cast("double")


def expect_suite(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Compile ``checks`` against one table into a SINGLE aggregate pass.

    Check dicts (``name`` required in each):
    - ``{"kind": "unique", "cols": [...]}`` — metric = duplicate rows
      (n_rows − n_distinct over the key columns).
    - ``{"kind": "not_null", "col": c, "max_ratio": r}`` — metric = null
      rows; passes while nulls/rows ≤ r (default 0).
    - ``{"kind": "range", "col": c, "lo": x, "hi": y}`` — metric = non-null
      rows outside [lo, hi] (bounds optional; omit one for half-open).
    - ``{"kind": "values", "col": c, "allowed": [...]}`` — metric =
      non-null rows whose value is not in the allowed set.
    """
    if not checks:
        raise ValueError("expect_suite: empty check list")
    metric_exprs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        kind = c["kind"]
        if kind == "unique":
            # duplicates among rows whose key tuple is FULLY non-null:
            # COUNT(DISTINCT) drops NULL tuples, so count(*) − distinct
            # would report every NULL-keyed row as a duplicate (r07
            # review, confirmed); SQL UNIQUE semantics — multiple NULLs
            # are not duplicates of each other — means they are the
            # not_null check's business, not this one's
            full_key = None
            for x in c["cols"]:
                nn = F.col(x).isNotNull()
                full_key = nn if full_key is None else (full_key & nn)
            keyed_rows = F.sum(F.when(full_key, F.lit(1)).otherwise(F.lit(0)))
            expr = (
                F.coalesce(keyed_rows, F.lit(0))
                - F.count_distinct(*[F.col(x) for x in c["cols"]])
            ).cast("double")
        elif kind == "not_null":
            expr = _violations(F.col(c["col"]).isNull())
        elif kind == "range":
            if "lo" not in c and "hi" not in c:
                # a bound-less range is vacuously green forever — the
                # silent-dead-gate failure mode this module exists to
                # prevent (r07 review, ninth pass: a typoed bound key
                # like 'min' would otherwise pass every publish)
                raise ValueError(
                    f"expect_suite: range check {c['name']!r} has neither "
                    "'lo' nor 'hi' — it could never fail"
                )
            col = F.col(c["col"])
            bad = F.lit(False)
            if "lo" in c:
                bad = bad | (col < F.lit(c["lo"]))
            if "hi" in c:
                bad = bad | (col > F.lit(c["hi"]))
            expr = _violations(col.isNotNull() & bad)
        elif kind == "values":
            col = F.col(c["col"])
            expr = _violations(col.isNotNull() & ~col.isin(list(c["allowed"])))
        else:
            raise ValueError(f"expect_suite: unknown check kind {kind!r}")
        metric_exprs.append(expr.alias(f"__m{i}"))
    agg = df.agg(*metric_exprs)

    def passed(i: int, c: dict) -> Column:
        m = F.col(f"__m{i}")
        if c["kind"] == "not_null":
            ratio = float(c.get("max_ratio", 0.0))
            # ratio * n compares in row units; empty table passes
            return m <= F.col("__n") * F.lit(ratio)
        return m == 0.0
    rows = F.array(
        *[
            F.struct(
                F.lit(c["name"]).alias(_RESULT_FIELDS[0]),
                F.col(f"__m{i}").alias(_RESULT_FIELDS[1]),
                passed(i, c).alias(_RESULT_FIELDS[2]),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def expect_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str,
) -> DataFrame:
    """FK containment: metric = child ROWS whose non-null key has no match
    in ``parent`` (left-anti against the parent's distinct key set)."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .select(child_col)
        .join(keys, child_col, "left_anti")
    )
    return orphans.agg(
        F.lit(name).alias(_RESULT_FIELDS[0]),
        F.count(F.lit(1)).cast("double").alias(_RESULT_FIELDS[1]),
        (F.count(F.lit(1)) == 0).alias(_RESULT_FIELDS[2]),
    )


def union_results(parts: list[DataFrame]) -> DataFrame:
    """Union per-table suites and referential rows into one report."""
    out = None
    for p in parts:
        out = p if out is None else out.unionByName(p)
    if out is None:
        raise ValueError("union_results: nothing to union")
    return out
