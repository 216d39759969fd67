"""t-digest — mergeable quantile sketch (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", arXiv:1902.04023).

The streaming-friendly quantile member of the sketch family next to GK
(q57), KMV (q106), and Count-Min (q121/q123): fixed-size centroid state,
associatively mergeable, with rank error bounded by the k1 scale function —
tightest at the tails (the p99/p999 a 100 TB latency/quality audit wants),
where GK's uniform rank guarantee is loosest.

Spark-first shape (the same two-level pattern as kmv_state/kmv_merge):

- level 1: ``mapInPandas`` folds each PARTITION's values into per-group
  partial digests — one Arrow batch digested at a time and merge-compressed
  into running per-group state, so the partition-local footprint is one
  batch of raw values + O(groups × delta) centroids, never the whole
  partition; nothing on the driver;
- level 2: one shuffle of the partial digests (rows = groups × partitions,
  each a few-KB centroid list — the raw values never shuffle), then
  ``applyInPandas`` per group merges sorted centroid lists with the same
  compression sweep. This is the map-side-combine discipline: at 100 TB
  the value stream is read once and reduced to digest rows before the only
  shuffle.

Determinism: the compression sweep is a sequential left-to-right pass over
centroids sorted by (mean, weight), so a digest is a pure function of its
input multiset AND the partition/Arrow-batch layout. Estimates are therefore stable
within a run but implementation-defined across engines — gates check them
the sketch way (exact quantiles as hashable columns + within-rank-band
booleans, the q57 pattern), never by raw value.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_SCHEMA = (
    "group string, means array<double>, weights array<double>, "
    "n bigint, vmin double, vmax double"
)


def _k(q: float, delta: float) -> float:
    """k1 scale function: k(q) = δ/2π · asin(2q−1). Clusters may span at
    most one k-unit, which concentrates resolution at both tails."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _compress(means: list[float], weights: list[float], delta: float) -> tuple[list[float], list[float]]:
    """One merge sweep over centroids sorted by mean: greedily absorb the
    next centroid while the combined cluster stays within one k-unit.
    Sequential and deterministic; output size is O(delta)."""
    if not means:
        return [], []
    total = float(sum(weights))
    out_m: list[float] = []
    out_w: list[float] = []
    q_left = 0.0
    m_cur, w_cur = means[0], float(weights[0])
    for m, w in zip(means[1:], weights[1:]):
        q_right = q_left + (w_cur + w) / total
        if _k(q_right, delta) - _k(q_left, delta) <= 1.0:
            m_cur = (m_cur * w_cur + m * w) / (w_cur + w)
            w_cur += w
        else:
            out_m.append(m_cur)
            out_w.append(w_cur)
            q_left += w_cur / total
            m_cur, w_cur = m, float(w)
    out_m.append(m_cur)
    out_w.append(w_cur)
    return out_m, out_w


def _digest_of(values, delta: float) -> tuple[list[float], list[float]]:
    vals = sorted(float(v) for v in values)
    return _compress(vals, [1.0] * len(vals), delta)


def _merge_group(key: tuple, rows: pd.DataFrame, delta: float) -> pd.DataFrame:
    """applyInPandas body shared by tdigest_build's level-2 merge and
    tdigest_merge (one definition — the row shape cannot drift between
    them): merge ONE group's digest rows into a single digest row."""
    merged = _merge_digest_rows(rows, delta)
    merged["group"] = key[0]
    return pd.DataFrame([merged], columns=["group", "means", "weights", "n", "vmin", "vmax"])


def _merge_digest_rows(rows: pd.DataFrame, delta: float) -> pd.Series:
    """Merge any number of partial-digest rows of ONE group: concatenate
    centroid lists, sort by (mean, weight), re-compress."""
    pairs: list[tuple[float, float]] = []
    for means, weights in zip(rows["means"], rows["weights"]):
        pairs.extend(zip(means, weights))
    pairs.sort()
    m, w = _compress([p[0] for p in pairs], [p[1] for p in pairs], delta)
    return pd.Series(
        {
            "means": m,
            "weights": w,
            "n": int(rows["n"].sum()),
            "vmin": float(rows["vmin"].min()),
            "vmax": float(rows["vmax"].max()),
        }
    )


def tdigest_build(
    df: DataFrame, group_col: str, value_col: str, delta: float = 200.0
) -> DataFrame:
    """Per-group t-digests over ``value_col`` (nulls/NaNs excluded, like
    every quantile aggregate): returns one row per group with the centroid
    arrays + exact count + exact min/max. See the module docstring for the
    two-level plan shape."""
    src = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull() & ~F.isnan("value"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fold batch-by-batch into per-group running digests: digest each
        # Arrow batch's values, then merge-compress into the running state.
        # NEVER pd.concat the whole partition — the bounded-state claim
        # (O(groups × delta) per partition) only holds incrementally; a
        # buffered partition of raw values is exactly the executor-OOM
        # shape this sketch exists to avoid (r06 review finding). The
        # emitted digest therefore depends on the batch layout as well as
        # the partition layout — same contract either way (see module
        # docstring: estimates gated by rank bands, never raw value).
        state: dict[str, tuple[list[float], list[float], int, float, float]] = {}
        for pdf in batches:
            # dropna=False: SQL GROUP BY keeps the null group, and so does
            # the level-2 Spark groupBy — pandas' default dropna=True here
            # would silently lose every null-group row before level 2 ever
            # saw it (r06 review)
            for g, vals in pdf.groupby("group", dropna=False)["value"]:
                if g is None or (isinstance(g, float) and math.isnan(g)):
                    g = None  # normalize pandas' NaN missing-key so the
                    # running-state dict lookup matches across batches
                arr = vals.to_numpy()
                bm, bw = _digest_of(arr, delta)
                prev = state.get(g)
                if prev is None:
                    state[g] = (bm, bw, len(arr), float(arr.min()), float(arr.max()))
                else:
                    pm, pw, pn, pmin, pmax = prev
                    pairs = sorted(zip(pm + bm, pw + bw))
                    mm, mw = _compress(
                        [p[0] for p in pairs], [p[1] for p in pairs], delta
                    )
                    state[g] = (
                        mm, mw, pn + len(arr),
                        min(pmin, float(arr.min())), max(pmax, float(arr.max())),
                    )
        if not state:
            return
        out = [
            {"group": g, "means": m, "weights": w, "n": n, "vmin": lo, "vmax": hi}
            for g, (m, w, n, lo, hi) in state.items()
        ]
        yield pd.DataFrame(out, columns=["group", "means", "weights", "n", "vmin", "vmax"])

    partial = src.mapInPandas(partials, DIGEST_SCHEMA)
    return partial.groupBy("group").applyInPandas(
        lambda key, rows: _merge_group(key, rows, delta), DIGEST_SCHEMA
    )


def tdigest_merge(digests: DataFrame, delta: float = 200.0) -> DataFrame:
    """Merge digest rows that share a group — e.g. per-day digests into a
    per-month digest after renaming the group column. Associative with
    ``tdigest_build``'s level-2 merge (property-tested: any sharding of the
    input yields digests whose quantile estimates satisfy the same rank
    bound)."""
    return digests.groupBy("group").applyInPandas(
        lambda key, rows: _merge_group(key, rows, delta), DIGEST_SCHEMA
    )


def _estimate(means: list[float], weights: list[float], vmin: float, vmax: float, q: float) -> float:
    """Standard t-digest quantile interpolation: centroid i sits at rank
    cum_i − w_i/2; piecewise-linear between those anchors, pinned to
    vmin/vmax at the extremes."""
    total = sum(weights)
    if total == 0:
        return float("nan")
    target = q * total
    anchors_r = [0.0]
    anchors_v = [vmin]
    cum = 0.0
    for m, w in zip(means, weights):
        anchors_r.append(cum + w / 2.0)
        anchors_v.append(m)
        cum += w
    anchors_r.append(total)
    anchors_v.append(vmax)
    for i in range(1, len(anchors_r)):
        if target <= anchors_r[i]:
            r0, r1 = anchors_r[i - 1], anchors_r[i]
            v0, v1 = anchors_v[i - 1], anchors_v[i]
            if r1 == r0:
                return v1
            return v0 + (v1 - v0) * (target - r0) / (r1 - r0)
    return vmax


def tdigest_quantiles(digests: DataFrame, probs: list[float]) -> DataFrame:
    """Quantile estimates from digest rows: (group, prob, est) — one output
    row per (group, prob). Digest rows are tiny (O(delta) doubles), so this
    is a map-side Arrow pass over one row per group."""

    def est(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for p in probs:
                    out.append(
                        {
                            "group": row["group"],
                            "prob": float(p),
                            "est": _estimate(
                                list(row["means"]), list(row["weights"]),
                                row["vmin"], row["vmax"], float(p),
                            ),
                        }
                    )
            yield pd.DataFrame(out, columns=["group", "prob", "est"])

    return digests.mapInPandas(est, "group string, prob double, est double")
