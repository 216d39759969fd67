"""Incremental view maintenance for SUM/COUNT aggregate views — the
classic delta-propagation rule (Blakeley/Larson/Tompa '86; the same
algebra every streaming-SQL engine's `changelog → agg` path implements)
as one DataFrame merge.

A materialized view ``SELECT keys, COUNT(*), SUM(x)… GROUP BY keys`` is
maintained from a changelog batch of SIGNED rows (op = +1 insert, −1
delete of a previously-inserted row) WITHOUT rescanning the fact table:

1. the delta aggregates by the same keys with ``op``-signed measures —
   a changelog-sized groupBy (the only shuffle whose size depends on the
   batch);
2. one full-outer merge with the current view coalesces per-key partial
   aggregates; groups whose count reaches exactly 0 vanish (the SQL
   GROUP BY contract: a group with no surviving rows has no row).

At 100 TB this is the whole point: the view is aggregate-sized, the
delta is batch-sized, and the fact table is never touched. SUM and
COUNT are self-maintainable under insert+delete; AVG derives
(sum/count); MIN/MAX are NOT (a delete can expose an unknown second
minimum) and are deliberately not offered here — callers needing them
must recompute affected groups.

Changelog well-formedness (deletes match previously-inserted rows) is
the CALLER's contract, as in every IVM system. A malformed log that
drives a group's count negative is emitted as-is (loud downstream)
rather than silently dropped — only exact zeros vanish.

r09 (VERDICT r08 #5): ``join_delta`` extends the algebra to TWO-TABLE
inner equi-join views via the delta-join rule Δ(R⋈S) = ΔR⋈S ∪ R⋈ΔS ∪
ΔR⋈ΔS (signs multiply); ``apply_join_view_delta`` composes it with
``apply_agg_delta`` so an aggregate over a join maintains through
changelogs on either or both bases without rescanning the join.

r09 (late): ``apply_distinct_count_delta`` maintains COUNT(DISTINCT)
views — not self-maintainable at the view level, so it carries the
standard auxiliary (keys, value, multiplicity) support relation
(Gupta/Mumick); ``distinct_count_support`` bootstraps it.
``apply_minmax_delta`` closes the header's MIN/MAX gap with the standard
hybrid: algebraic folds for insert-only groups, bounded recompute (a
key-pruned slice of the post-changelog base) for delete-touched groups.
``apply_topk_delta`` extends the same hybrid to per-group top-k rankings
with a sharper trigger: only deletes that HIT a stored member recompute —
a miss is a provable no-op, and inserts always fold.

Reference anchor: the reference pipeline recomputes everything per run
(no materialized views, ``etl/ingest.py`` full-table loads); the IVM
family is an engine extension on the Blakeley/Gupta-Mumick line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ns_eq_cond(left_cols: list[str], right_cols: list[str]):
    """AND-fold of per-column ``eqNullSafe`` — THE null-safe join condition
    the IVM family's probes are built from (one definition, r10 review:
    hand-rolled copies of this loop are exactly how the null-unsafe
    apply_topk_delta split slipped through r09). Pair ``left_cols[i]`` with
    ``right_cols[i]``; both sides must already carry distinct names."""
    cond = None
    for a, b in zip(left_cols, right_cols):
        eq = F.col(a).eqNullSafe(F.col(b))
        cond = eq if cond is None else (cond & eq)
    return cond


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
    sign_col: str = "op",
) -> DataFrame:
    """Merge a signed changelog into an aggregate view.

    ``view``: keys + ``count_col`` + one column per ``sum_cols`` alias.
    ``delta``: keys + the RAW measure columns named by ``sum_cols``
    values + ``sign_col`` (+1/−1).
    ``sum_cols``: {view_alias: delta_measure_col}. Returns the updated
    view with the same schema, zero-count groups removed.

    NULL measures (r07 review, third pass): an UNTOUCHED group's stored
    values pass through byte-exactly (including a NULL sum state — the
    merge never rewrites what the delta does not reach). For groups the
    delta DOES touch, measures fold under the SUM(COALESCE(x, 0))
    convention — NULL measure rows contribute 0 — and a stored NULL sum
    is treated as 0 when deltas land on it. Exact NULL-sum restoration
    (a group whose last non-null measure is deleted returning to SUM =
    NULL) would need a per-sum non-null counter in the view, the same
    reason MIN/MAX are excluded; callers needing ANSI NULL-sum semantics
    on delta-touched groups should build the view as SUM(COALESCE(x,0))
    so the conventions coincide.
    """
    for alias in sum_cols:
        if alias not in view.columns:
            raise ValueError(f"apply_agg_delta: view lacks sum column {alias!r}")
    if count_col not in view.columns:
        raise ValueError(f"apply_agg_delta: view lacks count column {count_col!r}")
    # reserved staging names (the zorder __z / cdc discipline, r07 review):
    # a view that already carries one would hit an opaque ambiguous-
    # reference failure deep inside the merge select — reject loudly here
    reserved = {"__d_present", "__dn"}
    reserved.update(f"__dk_{k}" for k in keys)
    reserved.update(f"__d_{alias}" for alias in sum_cols)
    clash = reserved.intersection(view.columns)
    if clash:
        raise ValueError(
            f"apply_agg_delta: view columns {sorted(clash)} collide with "
            "reserved staging names (__d_present/__dn/__dk_*/__d_*); "
            "rename them first"
        )
    # key dtypes must match EXACTLY (r08 review, second pass): a
    # wider-keyed delta would join via implicit cast but widen the output
    # key through the coalesce — and casting it back down instead aborts
    # mid-merge under ANSI (Spark 4 default) or silently wraps a new
    # out-of-range group onto a wrong existing one with ANSI off. Loud,
    # up front, never mid-job.
    vt = {f.name: f.dataType for f in view.schema.fields}
    dt = {f.name: f.dataType for f in delta.schema.fields}
    # a key absent from either side is the same loud error (r08 review,
    # third pass: the first cut crashed with KeyError while FORMATTING
    # this message when a key existed only in the delta)
    key_mismatch = [k for k in keys if vt.get(k) is None or dt.get(k) is None or dt[k] != vt[k]]
    if key_mismatch:
        def _fmt(side: dict, k: str) -> str:
            t = side.get(k)
            return t.simpleString() if t is not None else "ABSENT"

        raise ValueError(
            "apply_agg_delta: delta key dtypes must equal the view's — "
            + ", ".join(
                f"{k}: view {_fmt(vt, k)} != delta {_fmt(dt, k)}"
                for k in key_mismatch
            )
        )
    # measure/count cast-back safety (r08 review, seventh pass): the
    # merge casts the widened arithmetic back to the VIEW's dtypes, so a
    # delta measure that does not fit the view's sum column losslessly
    # (double measure, int view column) would silently truncate the
    # merged value — count advanced, sum not. Validate the measure
    # family UP-CASTS into the view column (the only residual risk is a
    # true-sum overflow of the view's declared type, which a recompute
    # hits identically); the count column must be integral.
    def _up_casts(frm, to) -> bool:
        from pyspark.sql import types as T

        integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if frm == to:
            return True
        if isinstance(frm, integral) and isinstance(to, integral):
            order = [T.ByteType, T.ShortType, T.IntegerType, T.LongType]
            return order.index(type(frm)) <= order.index(type(to))
        if isinstance(frm, T.FloatType) and isinstance(to, T.DoubleType):
            return True
        # integral → floating: lossless only within the mantissa (double
        # holds every int32 exactly, float every int16; long → double is
        # LOSSY above 2^53 — r08 review, eighth pass: the missing case
        # spuriously rejected int-measure/double-view callers)
        if isinstance(frm, (T.ByteType, T.ShortType, T.IntegerType)) and isinstance(
            to, T.DoubleType
        ):
            return True
        if isinstance(frm, (T.ByteType, T.ShortType)) and isinstance(to, T.FloatType):
            return True
        if isinstance(frm, T.DecimalType) and isinstance(to, T.DecimalType):
            return to.scale >= frm.scale and (to.precision - to.scale) >= (
                frm.precision - frm.scale
            )
        if isinstance(frm, integral) and isinstance(to, T.DecimalType):
            # digits of the TYPE MAX (|long| max = 9.22e18 -> 19 digits,
            # not 20 — r08 review, eighth pass off-by-one)
            digits = {T.ByteType: 3, T.ShortType: 5, T.IntegerType: 10, T.LongType: 19}
            return (to.precision - to.scale) >= digits[type(frm)]
        # scale-0 decimal → integral: lossless when every p-digit value
        # fits the target's range (10^p − 1 ≤ type max — r08 review,
        # tenth pass: warehouse-sourced integer quantities often arrive
        # as decimal(p,0) and were spuriously rejected)
        if isinstance(frm, T.DecimalType) and frm.scale == 0 and isinstance(to, integral):
            fits = {T.ByteType: 2, T.ShortType: 4, T.IntegerType: 9, T.LongType: 18}
            return frm.precision <= fits[type(to)]
        # scale-0 decimal → floating: exact within the mantissa
        # (10^15 − 1 < 2^53 for double, 10^7 − 1 < 2^24 for float —
        # r08 review, fifteenth pass: the missing case spuriously
        # rejected warehouse decimal quantities into double view sums)
        if isinstance(frm, T.DecimalType) and frm.scale == 0:
            if isinstance(to, T.DoubleType):
                return frm.precision <= 15
            if isinstance(to, T.FloatType):
                return frm.precision <= 7
        return False

    from pyspark.sql import types as _T

    if not isinstance(vt[count_col], (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)):
        raise ValueError(
            f"apply_agg_delta: count column {count_col!r} must be integral, "
            f"got {vt[count_col].simpleString()}"
        )
    bad_measures = [
        (alias, src)
        for alias, src in sum_cols.items()
        if src not in dt or not _up_casts(dt[src], vt[alias])
    ]
    if bad_measures:
        raise ValueError(
            "apply_agg_delta: delta measures must up-cast losslessly into "
            "the view's sum columns — "
            + ", ".join(
                f"{src} ({dt[src].simpleString() if src in dt else 'ABSENT'}) "
                f"-> {alias} ({vt[alias].simpleString()})"
                for alias, src in bad_measures
            )
        )
    sign = F.col(sign_col)
    d = delta.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias("__dn"),
        *[
            # COALESCE inside the signed fold: a NULL measure contributes
            # 0 instead of nulling the whole group delta
            F.sum(sign * F.coalesce(F.col(src), F.lit(0))).alias(f"__d_{alias}")
            for alias, src in sum_cols.items()
        ],
    ).select(
        F.lit(True).alias("__d_present"),
        *[F.col(k).alias(f"__dk_{k}") for k in keys], "__dn",
        *[f"__d_{alias}" for alias in sum_cols],
    )
    # NULL-SAFE key equality: SQL GROUP BY emits a NULL-key group (both in
    # the view's original aggregation and in the delta groupBy above), and
    # a plain equi-join would SPLIT that group into two output rows — one
    # carrying the view state, one the delta — where a from-scratch
    # recompute has a single merged row, so deletes could never zero it
    # out (r07 review, second pass; snapshot_diff uses the same
    # discipline). Keys coalesce from whichever side has the group.
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__dk_{k}"))
        cond = eq if cond is None else (cond & eq)
    merged = view.join(d, cond, "full")
    zero = F.lit(0)
    delta_touched = F.col("__d_present").isNotNull()
    # schema preservation (r07 ADVICE): the when/otherwise + arithmetic
    # merge widens sum columns (decimal(18,4) → decimal(38,4)) and the
    # count addition promotes — cast every maintained column back to the
    # INPUT view's dtype so the docstring's "same schema" holds and the
    # maintained view round-trips through fixed-schema sinks and
    # schema-strict unionByName. A recompute-from-scratch would carry the
    # view's original types, so this is also what delta ≡ recompute
    # parity requires.
    out = merged.select(
        *[F.coalesce(F.col(k), F.col(f"__dk_{k}")).alias(k) for k in keys],
        (F.coalesce(F.col(count_col), zero) + F.coalesce(F.col("__dn"), zero))
        .cast(vt[count_col])
        .alias(count_col),
        *[
            # untouched groups pass their stored value through UNCHANGED
            # (a NULL sum state must not be rewritten to 0.0 — r07 review
            # confirmed the hash divergence vs a recompute oracle);
            # touched groups fold under the coalesced convention above
            F.when(~delta_touched, F.col(alias))
            .otherwise(
                F.coalesce(F.col(alias), zero) + F.coalesce(F.col(f"__d_{alias}"), zero)
            )
            .cast(vt[alias])
            .alias(alias)
            for alias in sum_cols
        ],
    )
    return out.filter(F.col(count_col) != 0)


def join_delta(
    r_old: DataFrame,
    s_old: DataFrame,
    delta_r: DataFrame | None,
    delta_s: DataFrame | None,
    on: list[str],
    sign_col: str = "op",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Signed changelog of the inner equi-join view R ⋈ S from the base
    tables' PRE-UPDATE states and their signed changelogs — the
    Blakeley-line delta-join rule (VERDICT r08 #5), bilinear expansion of
    ``(R+ΔR) ⋈ (S+ΔS)``::

        Δ(R ⋈ S)  =  ΔR ⋈ S  ∪  R ⋈ ΔS  ∪  ΔR ⋈ ΔS

    with the joined row's sign = the product of the contributing signs
    (+1·+1 for insert-meets-insert; the ΔR ⋈ ΔS term is what compensates
    the double-counted delete when matching rows leave BOTH sides).
    Feed the result straight into ``apply_agg_delta`` to maintain an
    aggregate over the join — ``apply_join_view_delta`` composes the two.

    ``on`` is USING-style (same column names both sides — rename first);
    the output schema is on-keys + R's other columns + S's other columns
    + ``sign_col``. Signed MULTISET semantics throughout: duplicates in
    either base multiply joined multiplicity exactly as a from-scratch
    join would. NULL join keys never match in ``R ⋈ S`` and never match
    here either — a NULL-keyed changelog row is a no-op on the view,
    byte-identical to the from-scratch recompute.

    Cost at 100 TB (the operator's point): the base tables are touched
    only by the two delta-driven joins — each joins a BATCH-sized delta
    against one base, broadcast by default (``broadcast_deltas``; set
    False for deltas too large to broadcast, which degrades to shuffle
    joins but never to a base×base join) — so maintenance cost is
    O(|Δ| · matched rows), never O(|R ⋈ S|). The ΔR ⋈ ΔS term is
    delta×delta. Changelog well-formedness (deletes match
    previously-inserted rows) stays the caller's contract, exactly as in
    ``apply_agg_delta``."""
    if delta_r is None and delta_s is None:
        raise ValueError("join_delta: both deltas are None — nothing to apply")

    def _check(side: str, base: DataFrame, delta: DataFrame | None) -> None:
        missing = [k for k in on if k not in base.columns]
        if missing:
            raise ValueError(f"join_delta: {side} base lacks join keys {missing}")
        if sign_col in base.columns:
            raise ValueError(
                f"join_delta: {side} base carries the sign column "
                f"{sign_col!r} — rename it (the output needs the name)"
            )
        if delta is not None:
            want = set(base.columns) | {sign_col}
            if set(delta.columns) != want:
                raise ValueError(
                    f"join_delta: Δ{side} columns {sorted(delta.columns)} != "
                    f"base columns + {sign_col!r} ({sorted(want)})"
                )
            bt = {f.name: f.dataType for f in base.schema.fields}
            dt = {f.name: f.dataType for f in delta.schema.fields}
            drift = [c for c in base.columns if dt[c] != bt[c]]
            if drift:
                raise ValueError(
                    f"join_delta: Δ{side} dtypes drift from the base on "
                    + ", ".join(
                        f"{c} ({dt[c].simpleString()} != {bt[c].simpleString()})"
                        for c in drift
                    )
                    + " — the apply_agg_delta key-dtype discipline applies here"
                )

    _check("R", r_old, delta_r)
    _check("S", s_old, delta_s)
    overlap = (set(r_old.columns) - set(on)) & (set(s_old.columns) - set(on))
    if overlap:
        raise ValueError(
            f"join_delta: non-key columns {sorted(overlap)} exist on both "
            "sides — the joined schema would be ambiguous; rename first"
        )
    out_cols = (
        on
        + [c for c in r_old.columns if c not in on]
        + [c for c in s_old.columns if c not in on]
    )
    bc = F.broadcast if broadcast_deltas else (lambda df: df)
    terms = []
    if delta_r is not None:
        dr = delta_r.withColumnRenamed(sign_col, "__op_r")
        terms.append(
            bc(dr).join(s_old, on).select(*out_cols, F.col("__op_r").alias(sign_col))
        )
    if delta_s is not None:
        ds = delta_s.withColumnRenamed(sign_col, "__op_s")
        terms.append(
            r_old.join(bc(ds), on).select(*out_cols, F.col("__op_s").alias(sign_col))
        )
    if delta_r is not None and delta_s is not None:
        dr = delta_r.withColumnRenamed(sign_col, "__op_r")
        ds = delta_s.withColumnRenamed(sign_col, "__op_s")
        terms.append(
            dr.join(bc(ds), on).select(
                *out_cols, (F.col("__op_r") * F.col("__op_s")).alias(sign_col)
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def apply_join_view_delta(
    view: DataFrame,
    r_old: DataFrame,
    s_old: DataFrame,
    delta_r: DataFrame | None,
    delta_s: DataFrame | None,
    on: list[str],
    keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n",
    sign_col: str = "op",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Maintain an aggregate view over a two-table inner equi-join —
    ``SELECT keys, COUNT(*), SUM(x)… FROM R JOIN S USING (on) GROUP BY
    keys`` — through signed changelogs on EITHER OR BOTH base tables,
    without rescanning the join (VERDICT r08 #5): the ``join_delta``
    three-term changelog feeds ``apply_agg_delta``, inheriting its whole
    contract — schema preservation (dtype cast-back), zero-count group
    removal, NULL-safe key merge, loud dtype validation. The fact tables
    are touched only by the delta-driven joins; the view is
    aggregate-sized; the shuffle whose size depends on the batch is the
    changelog groupBy inside apply_agg_delta."""
    d = join_delta(r_old, s_old, delta_r, delta_s, on, sign_col, broadcast_deltas)
    return apply_agg_delta(view, d, keys, sum_cols, count_col, sign_col)


def apply_distinct_count_delta(
    view: DataFrame,
    support: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str,
    count_col: str = "n_distinct",
    mult_col: str = "m",
    sign_col: str = "op",
) -> tuple[DataFrame, DataFrame]:
    """Maintain ``SELECT keys, COUNT(DISTINCT value) GROUP BY keys``
    through a signed changelog — the step in the Blakeley line that is NOT
    self-maintainable at the view level (a delete cannot tell you whether
    the deleted value still occurs in the group), and therefore the first
    operator here that carries an AUXILIARY relation, exactly as the IVM
    literature prescribes (Gupta/Mumick's "supporting views"; every
    streaming-SQL distinct-count does the same): ``support`` holds one
    row per (group, value) with its multiplicity ``m``. COUNT(DISTINCT)
    is then just the per-group row count of the support — and the support
    itself IS self-maintainable (it is a COUNT(*) view over (keys,
    value)).

    Returns ``(new_view, new_support)`` — the caller owns both tables,
    the same way it owns the view in ``apply_agg_delta``.

    Contracts:
    - ``view``: keys + ``count_col`` (integral). ``support``: keys +
      ``value_col`` + ``mult_col`` (integral, > 0 in a well-formed
      state). ``delta``: keys + ``value_col`` + ``sign_col`` (+1/−1).
    - NULL values: COUNT(DISTINCT v) ignores NULLs in SQL — NULL-valued
      delta rows are no-ops and the support never stores a NULL value.
      Consequently a group exists in the maintained view iff it has ≥1
      DISTINCT NON-NULL value (the recompute equivalent carries
      ``WHERE v IS NOT NULL``). Group existence under all-NULL rows is a
      COUNT(*) question — compose with ``apply_agg_delta`` when you need
      it, as a real pipeline maintains both anyway.
    - NULL keys group null-safely (the apply_agg_delta discipline).
    - Malformed logs (a delete with no matching insert) leave a NEGATIVE
      multiplicity row in the support — loud downstream, never silently
      dropped; only exact zeros vanish. Such a value still counts as
      "present" (nonzero multiplicity) until compensated.

    Cost at 100 TB: the delta pre-aggregates to (keys, value) — batch-
    sized; the support is touched by one broadcast semi-join (slice out
    touched groups), one broadcast anti-join (pass untouched groups
    through BYTE-EXACT, never re-derived), and one full-outer merge whose
    left side is only the touched groups' rows. The VIEW is touched by
    one broadcast anti-join + a union of recomputed touched-group counts.
    Nothing ever rescans the fact table, and no step is O(|support|)
    shuffle — bucket the persisted support by ``keys`` and the semi/anti
    probes are zero-exchange on the support side."""
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    vt = {f.name: f.dataType for f in view.schema.fields}
    st = {f.name: f.dataType for f in support.schema.fields}
    dt = {f.name: f.dataType for f in delta.schema.fields}
    if count_col not in vt:
        raise ValueError(f"apply_distinct_count_delta: view lacks {count_col!r}")
    if not isinstance(vt[count_col], integral):
        raise ValueError(
            f"apply_distinct_count_delta: count column {count_col!r} must be "
            f"integral, got {vt[count_col].simpleString()}"
        )
    if mult_col not in st or not isinstance(st[mult_col], integral):
        raise ValueError(
            f"apply_distinct_count_delta: support multiplicity {mult_col!r} "
            "missing or non-integral"
        )
    for side, cols, need in (
        ("view", vt, keys + [count_col]),
        ("support", st, keys + [value_col, mult_col]),
        ("delta", dt, keys + [value_col, sign_col]),
    ):
        missing = [c for c in need if c not in cols]
        if missing:
            raise ValueError(f"apply_distinct_count_delta: {side} lacks {missing}")
    # key/value dtypes must match EXACTLY across all three relations (the
    # apply_agg_delta rationale: implicit-cast joins widen or wrap)
    for c in keys:
        if not (vt[c] == st[c] == dt[c]):
            raise ValueError(
                f"apply_distinct_count_delta: key {c!r} dtypes differ — view "
                f"{vt[c].simpleString()}, support {st[c].simpleString()}, "
                f"delta {dt[c].simpleString()}"
            )
    if st[value_col] != dt[value_col]:
        raise ValueError(
            f"apply_distinct_count_delta: value {value_col!r} dtype differs — "
            f"support {st[value_col].simpleString()} != delta "
            f"{dt[value_col].simpleString()}"
        )
    reserved = {"__dm", "__dv"} | {f"__dk_{k}" for k in keys}
    clash = reserved.intersection(set(support.columns) | set(view.columns))
    if clash:
        raise ValueError(
            f"apply_distinct_count_delta: view/support columns {sorted(clash)} "
            "collide with reserved staging names (__dm/__dv/__dk_*); "
            "rename them first"
        )

    # 1. changelog → (keys, value) multiplicity delta (batch-sized; the
    #    only shuffle whose size depends on the batch)
    dm = (
        delta.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.sum(F.col(sign_col)).cast("bigint").alias("__dm"))
        .filter(F.col("__dm") != 0)
    )
    # renamed key columns make every probe unambiguous even when view/
    # support/delta derive from one parent frame (the common bootstrap
    # shape) — the eqNullSafe(df1[k], df2[k]) form would lean on
    # self-join attribute disambiguation instead
    dkeys = dm.select(*[F.col(k).alias(f"__dk_{k}") for k in keys]).distinct()
    key_cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__dk_{k}"))
        key_cond = eq if key_cond is None else (key_cond & eq)

    # 2. slice the support: touched groups enter the merge, untouched
    #    groups pass through byte-exact (broadcast key probes)
    touched = support.join(F.broadcast(dkeys), key_cond, "left_semi")
    untouched = support.join(F.broadcast(dkeys), key_cond, "left_anti")

    # 3. null-safe full-outer merge on (keys, value); exact zeros vanish
    dmr = dm.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        F.col(value_col).alias("__dv"),
        "__dm",
    )
    cond = key_cond & F.col(value_col).eqNullSafe(F.col("__dv"))
    merged = (
        touched.join(dmr, cond, "full")
        .select(
            *[F.coalesce(F.col(k), F.col(f"__dk_{k}")).alias(k) for k in keys],
            F.coalesce(F.col(value_col), F.col("__dv")).alias(value_col),
            (
                F.coalesce(F.col(mult_col), F.lit(0))
                + F.coalesce(F.col("__dm"), F.lit(0))
            )
            .cast(st[mult_col])
            .alias(mult_col),
        )
        .filter(F.col(mult_col) != 0)
    )
    new_support = untouched.select(*support.columns).unionByName(
        merged.select(*support.columns)
    )

    # 4. recount ONLY the touched groups; groups whose last value vanished
    #    simply produce no row (the GROUP BY contract)
    new_counts = merged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(vt[count_col]).alias(count_col)
    )
    untouched_view = view.join(F.broadcast(dkeys), key_cond, "left_anti")
    new_view = untouched_view.select(*view.columns).unionByName(
        new_counts.select(*view.columns)
    )
    return new_view, new_support


def distinct_count_support(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    mult_col: str = "m",
) -> DataFrame:
    """Bootstrap the auxiliary support relation for
    ``apply_distinct_count_delta`` from a base table: one row per (group,
    non-null value) with its multiplicity. One groupBy — run it once at
    view creation; thereafter the support maintains incrementally."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias(mult_col))
    )


def apply_minmax_delta(
    view: DataFrame,
    base_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
    sign_col: str = "op",
) -> DataFrame:
    """Maintain ``SELECT keys, MIN(x)…, MAX(y)… GROUP BY keys`` through a
    signed changelog — the hybrid every IVM system uses for the
    non-self-maintainable extrema (this module's header documents WHY
    they are excluded from ``apply_agg_delta``: a delete can expose an
    unknown second minimum):

    - INSERT-ONLY groups maintain algebraically: new_min =
      LEAST(stored, min(inserted)) — batch-sized, base never touched.
    - Groups with ANY delete are recomputed — but ONLY those groups, by
      slicing ``base_new`` (the POST-changelog base) with a broadcast
      semi-join on the delete-touched keys. Partition or bucket the base
      by ``keys`` and that slice is a pruned scan, never a full rescan;
      worst-case cost is the touched groups' row count, and an
      insert-heavy workload never reads the base at all.

    ``view``: keys + one column per min/max alias. ``base_new``: keys +
    the raw measure columns (post-changelog state — a real pipeline has
    it; deriving it here would rescan what the caller already wrote).
    ``delta``: keys + measure columns + ``sign_col`` (+1/−1). Measure
    dtypes must match the view EXACTLY (MIN/MAX preserve type — there is
    no widening arithmetic to cast back from).

    Semantics: group existence for delete-touched groups comes from the
    recompute (a group emptied by deletes vanishes — the GROUP BY
    contract); NULL measures follow SQL MIN/MAX (ignored; an all-NULL
    group carries NULL extrema but exists); NULL keys merge null-safely;
    untouched groups pass through BYTE-EXACT."""
    min_cols = min_cols or {}
    max_cols = max_cols or {}
    if not min_cols and not max_cols:
        raise ValueError("apply_minmax_delta: no min_cols or max_cols given")
    overlap = set(min_cols) & set(max_cols)
    if overlap:
        raise ValueError(
            f"apply_minmax_delta: aliases {sorted(overlap)} appear in both "
            "min_cols and max_cols"
        )
    vt = {f.name: f.dataType for f in view.schema.fields}
    bt = {f.name: f.dataType for f in base_new.schema.fields}
    dt = {f.name: f.dataType for f in delta.schema.fields}
    for side, cols, need in (
        ("view", vt, keys + list(min_cols) + list(max_cols)),
        ("base_new", bt, keys + sorted({*min_cols.values(), *max_cols.values()})),
        ("delta", dt, keys + sorted({*min_cols.values(), *max_cols.values()}) + [sign_col]),
    ):
        missing = [c for c in need if c not in cols]
        if missing:
            raise ValueError(f"apply_minmax_delta: {side} lacks {missing}")
    for c in keys:
        if not (vt[c] == bt[c] == dt[c]):
            raise ValueError(
                f"apply_minmax_delta: key {c!r} dtypes differ — view "
                f"{vt[c].simpleString()}, base {bt[c].simpleString()}, "
                f"delta {dt[c].simpleString()}"
            )
    for alias, src in {**min_cols, **max_cols}.items():
        if not (vt[alias] == bt[src] == dt[src]):
            raise ValueError(
                f"apply_minmax_delta: measure dtypes must match exactly — "
                f"view {alias!r} {vt[alias].simpleString()}, base/delta "
                f"{src!r} {bt[src].simpleString()}/{dt[src].simpleString()} "
                "(MIN/MAX preserve type; nothing widens)"
            )
    reserved = {"__has_del"} | {f"__dk_{k}" for k in keys}
    reserved.update(f"__i_{a}" for a in {*min_cols, *max_cols})
    clash = reserved.intersection(view.columns)
    if clash:
        raise ValueError(
            f"apply_minmax_delta: view columns {sorted(clash)} collide with "
            "reserved staging names (__has_del/__dk_*/__i_*); rename first"
        )

    sign = F.col(sign_col)
    # one batch-sized aggregate: per touched group, whether any delete
    # landed + the insert-side extrema for the algebraic path
    touched = delta.groupBy(*keys).agg(
        F.max(F.when(sign < 0, 1).otherwise(0)).alias("__has_del"),
        *[
            F.min(F.when(sign > 0, F.col(src))).alias(f"__i_{alias}")
            for alias, src in min_cols.items()
        ],
        *[
            F.max(F.when(sign > 0, F.col(src))).alias(f"__i_{alias}")
            for alias, src in max_cols.items()
        ],
    )
    touched = touched.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        "__has_del",
        *[f"__i_{a}" for a in list(min_cols) + list(max_cols)],
    )
    key_cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__dk_{k}"))
        key_cond = eq if key_cond is None else (key_cond & eq)

    all_keys = touched.select(*[f"__dk_{k}" for k in keys])
    del_keys = touched.filter(F.col("__has_del") == 1).select(
        *[f"__dk_{k}" for k in keys]
    )
    ins = touched.filter(F.col("__has_del") == 0)

    untouched = view.join(F.broadcast(all_keys), key_cond, "left_anti")

    # algebraic fold for insert-only groups (full outer so NEW groups
    # appear); LEAST/GREATEST return the non-NULL side, which is exactly
    # SQL MIN/MAX-ignore-NULL folding, and NULL when both are NULL
    view_ins = view.join(F.broadcast(ins.select(*[f"__dk_{k}" for k in keys])), key_cond, "left_semi")
    # no broadcast hint on the full outer: BroadcastHashJoin cannot build
    # a full-outer side, so Spark would ignore it — both sides here are
    # (touched-group)-sized anyway
    folded = view_ins.join(ins, key_cond, "full").select(
        *[F.coalesce(F.col(k), F.col(f"__dk_{k}")).alias(k) for k in keys],
        *[
            F.least(F.col(alias), F.col(f"__i_{alias}")).alias(alias)
            for alias in min_cols
        ],
        *[
            F.greatest(F.col(alias), F.col(f"__i_{alias}")).alias(alias)
            for alias in max_cols
        ],
    )
    # bounded recompute: ONLY delete-touched groups read the base
    recomputed = (
        base_new.join(F.broadcast(del_keys), key_cond, "left_semi")
        .groupBy(*keys)
        .agg(
            *[F.min(src).alias(alias) for alias, src in min_cols.items()],
            *[F.max(src).alias(alias) for alias, src in max_cols.items()],
        )
    )
    cols = view.columns
    return (
        untouched.select(*cols)
        .unionByName(folded.select(*cols))
        .unionByName(recomputed.select(*cols))
    )


def apply_topk_delta(
    view: DataFrame,
    base_new: DataFrame,
    delta: DataFrame,
    keys: list[str],
    id_col: str,
    score_col: str,
    k: int,
    sign_col: str = "op",
) -> DataFrame:
    """Maintain ``the top-k rows per group by (score DESC, id ASC)``
    through a signed changelog — the leaderboard/top-documents view,
    completing this module's family (aggregate → join → distinct →
    extrema → top-k). The ranking needs the same hybrid as
    ``apply_minmax_delta``, but with a sharper recompute trigger:

    - The changelog is an ENTITY changelog (CDC-style), one live row per
      id per group: per (keys, id), a delete refers to the PRE-batch row
      and an insert provides the POST-batch row, so delete + insert
      together in one batch = UPDATE (the new score lands; the old row —
      if it was a stored member — triggers the recompute below exactly
      like a plain member delete). An insert-then-delete of a row that
      never existed before the batch is NOT expressible in signed sets —
      compact such pairs away before applying (the q128 LWW discipline).
    - INSERTS fold algebraically: true-top-k(base ∪ inserts) ⊆
      (stored-top-k ∪ inserts), so re-ranking that union — view-sized —
      is exact. Base never read.
    - A DELETE that MISSES the stored top-k is a provable NO-OP: the
      view holds every group row when the group has < k rows, so a miss
      means the row ranked below the cut, and removing it promotes
      nothing. Fold path, base never read.
    - Only deletes that HIT a stored member force a recompute — of ONLY
      those groups, from a broadcast-semi-join-pruned slice of
      ``base_new`` (the POST-changelog base). Partition/bucket the base
      by ``keys`` → pruned scan.

    NULL scores are excluded everywhere (a NULL cannot rank; the
    recompute-equivalent carries ``WHERE score IS NOT NULL``); NULL ids
    are rejected at the changelog (an entity needs an identity); NULL
    keys group null-safely. ``id_col`` must be unique per group in the
    base — the caller's entity contract. Untouched groups pass through
    BYTE-EXACT. Dtypes must match exactly (ranking moves rows, nothing
    widens)."""
    if k < 1:
        raise ValueError(f"apply_topk_delta: k must be >= 1, got {k}")
    vt = {f.name: f.dataType for f in view.schema.fields}
    bt = {f.name: f.dataType for f in base_new.schema.fields}
    dt = {f.name: f.dataType for f in delta.schema.fields}
    for side, cols, need in (
        ("view", vt, keys + [id_col, score_col]),
        ("base_new", bt, keys + [id_col, score_col]),
        ("delta", dt, keys + [id_col, score_col, sign_col]),
    ):
        missing = [c for c in need if c not in cols]
        if missing:
            raise ValueError(f"apply_topk_delta: {side} lacks {missing}")
    for c in keys + [id_col, score_col]:
        if not (vt[c] == bt[c] == dt[c]):
            raise ValueError(
                f"apply_topk_delta: {c!r} dtypes differ — view "
                f"{vt[c].simpleString()}, base {bt[c].simpleString()}, "
                f"delta {dt[c].simpleString()} (nothing widens in a rank)"
            )
    reserved = {"__has_ins", "__has_del", "__rn", "__dk_id"} | {
        f"__dk_{c}" for c in keys
    } | {f"__dh_{c}" for c in keys}
    clash = reserved.intersection(view.columns)
    if clash:
        raise ValueError(
            f"apply_topk_delta: view columns {sorted(clash)} collide with "
            "reserved staging names (__has_ins/__has_del/__rn/__dk_*/"
            "__dh_*); rename them first"
        )

    from pyspark.sql import Window

    # 1. fold the changelog per entity (batch-sized); NULL ids rejected
    #    loudly IN-PLAN (the q142 assert_true discipline — no extra job)
    per_ent = (
        delta.select(
            *keys,
            F.when(
                F.col(id_col).isNotNull(), F.col(id_col)
            ).otherwise(
                F.raise_error(F.lit("apply_topk_delta: NULL id in changelog"))
            ).alias(id_col),
            score_col,
            sign_col,
        )
        .groupBy(*keys, id_col)
        .agg(
            F.max(F.when(F.col(sign_col) > 0, 1).otherwise(0)).alias("__has_ins"),
            F.max(F.when(F.col(sign_col) < 0, 1).otherwise(0)).alias("__has_del"),
            # the post-batch score rides the insert row (a delete's score
            # column is ignored — it names the pre-batch row by id)
            F.max(F.when(F.col(sign_col) > 0, F.col(score_col))).alias(score_col),
        )
    )
    inserts = per_ent.filter(
        (F.col("__has_ins") == 1) & F.col(score_col).isNotNull()
    ).select(*keys, id_col, score_col)
    deletes = per_ent.filter(F.col("__has_del") == 1).select(*keys, id_col)

    key_cond = ns_eq_cond(keys, [f"__dk_{c}" for c in keys])

    # 2. deletes that HIT a stored member → recompute groups. The hit set
    #    is carried under its OWN prefix (__dh_) so the fold/recompute
    #    split below can compare null-safely — a name-list anti-join here
    #    put a NULL-keyed group on BOTH paths, duplicating its view rows
    #    (r10, found via the leaderboard NULL-group-key gate; the r09
    #    gates never exercised NULL keys through the delete path)
    view_members = view.select(
        *[F.col(c).alias(f"__dk_{c}") for c in keys], F.col(id_col).alias("__dk_id")
    )
    hit_cond = key_cond & F.col(id_col).eqNullSafe(F.col("__dk_id"))
    del_hit_keys = (
        deletes.join(F.broadcast(view_members), hit_cond, "left_semi")
        .select(*[F.col(c).alias(f"__dh_{c}") for c in keys])
        .distinct()
    )
    dh_cond = ns_eq_cond(keys, [f"__dh_{c}" for c in keys])
    dk_dh_cond = ns_eq_cond([f"__dk_{c}" for c in keys], [f"__dh_{c}" for c in keys])
    # every touched group (fold ∪ recompute) leaves the untouched set
    all_keys = per_ent.select(*[F.col(c).alias(f"__dk_{c}") for c in keys]).distinct()
    fold_keys = all_keys.join(del_hit_keys, dk_dh_cond, "left_anti")

    untouched = view.join(F.broadcast(all_keys), key_cond, "left_anti")

    rank_w = Window.partitionBy(*keys).orderBy(F.col(score_col).desc(), F.col(id_col))
    # 3. fold path: stored rows ∪ inserted rows of fold groups, re-ranked
    #    (view-sized; miss-deletes provably cannot change the result)
    fold_pool = (
        view.join(F.broadcast(fold_keys), key_cond, "left_semi")
        .select(*view.columns)
        .unionByName(
            inserts.join(F.broadcast(fold_keys), key_cond, "left_semi").select(
                *view.columns
            )
        )
    )
    folded = (
        fold_pool.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    # 4. recompute path: ONLY member-delete groups read the base
    recomputed = (
        base_new.join(F.broadcast(del_hit_keys), dh_cond, "left_semi")
        .filter(F.col(score_col).isNotNull())
        .select(*view.columns)
        .withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    cols = view.columns
    return (
        untouched.select(*cols)
        .unionByName(folded.select(*cols))
        .unionByName(recomputed.select(*cols))
    )
