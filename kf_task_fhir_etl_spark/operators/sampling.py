"""Deterministic sampling / splitting / chunking operators for training-data
pipelines: hash-based train/test assignment, per-group quota sampling, and
fixed-window document chunking.

The reference (kids-first/kf-task-fhir-etl) has no sampling surface — these
are engine extensions in the spirit of its deterministic, re-runnable ETL
(`etl/ingest.py:519-531` re-runs must produce identical loads): every
operator here is a pure function of the row's key, never of partitioning,
row order, or an RNG, so a 100 TB re-run (or a per-partition retry) assigns
every row identically. All formulas are engine-portable (md5 over the
stringified key) so DuckDB oracles can recompute them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16-bit hash space for split thresholds: first 4 md5 hex chars.
_SPLIT_SPACE = 1 << 16


def hash_bucket(key: Column, space: int = _SPLIT_SPACE) -> Column:
    """Uniform bucket in [0, space) from the md5 of the stringified key.

    Codegen'd end-to-end (md5 + conv are JVM built-ins). Stable across
    engines: DuckDB computes the identical value as
    ``('0x' || substr(md5(key::VARCHAR), 1, 4))::INT % space``.
    """
    bucket16 = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
    return bucket16 % F.lit(space)


def deterministic_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to 'train' or 'test' by hashing its key — the
    map-side, shuffle-free train/test split. Unlike ``randomSplit`` (which
    re-draws per run and per retry), the assignment is a pure function of
    the key: adding new rows never reshuffles existing ones, so the split
    is stable under incremental ingest — the property LLM corpus pipelines
    need to keep eval contamination-free across snapshots."""
    thresh = int(train_frac * _SPLIT_SPACE)
    return df.withColumn(
        split_col,
        F.when(hash_bucket(F.col(key_col)) < thresh, F.lit("train")).otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum FRACTION of rows (vs ``quota_sample``'s absolute
    cap), deterministically: row survives iff its 16-bit md5 bucket falls
    under ``fractions[stratum] × 65536``. The sampling analogue of
    ``sampleBy`` with every RNG property removed — pure map-side filter,
    zero shuffles, stable under retries/incremental ingest, and the kept set
    of a smaller fraction is a SUBSET of a larger one (thresholds nest), so
    down-sampling a corpus never picks different documents. Strata absent
    from ``fractions`` get ``default_frac`` (0 → dropped)."""
    bucket = hash_bucket(F.col(key_col))
    thresh: Column = F.lit(int(default_frac * _SPLIT_SPACE))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(int(frac * _SPLIT_SPACE))).otherwise(
            thresh
        )
    return df.filter(bucket < thresh)


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by deterministic
    pseudo-random order (md5 of the key, key as tiebreak). One
    row_number window per group — a single hash shuffle on the group key,
    state bounded by ``quota`` per group after the filter. This is the
    source-balancing primitive (cap any one crawl/domain's share of a
    corpus); for skewed group sizes the window sort is per-group, not
    global, so one huge group never blocks the rest."""
    order = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str,
    order_col: str,
    token_col: str,
    seq_col: str = "seq_id",
    offset_col: str = "seq_offset",
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences: documents
    are laid out in deterministic order (``order_col``) within each group
    and assigned ``seq_id = floor(exclusive-cumulative-tokens / budget)`` —
    the contiguous-fill packing used to build pretraining batches, where a
    document starting before a boundary may straddle it and ``offset_col``
    records its start position inside the sequence.

    Relational by construction: one cumulative-sum window per group (a
    single hash shuffle on the group key + per-group sort), so packing a
    100 TB corpus is exactly as scalable as any windowed aggregate —
    parallelism = number of groups (pack within shard/source, never one
    global sequence), and determinism comes from the explicit order key,
    not row arrival order. Contrast an RDD/foreachPartition packer: order-
    dependent, retry-unstable, opaque to Catalyst."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return df.withColumn(seq_col, F.floor(cum_excl / F.lit(budget))).withColumn(
        offset_col, cum_excl % F.lit(budget)
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = 100,
    stride: int = 80,
    start_col: str = "chunk_start",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Explode each document into fixed-size overlapping character windows
    (size=100, stride=80 → 20-char overlap) — the context-window chunking
    step of an embedding/RAG pipeline, expressed as sequence + explode +
    substring: all codegen'd JVM built-ins, the explode is a Generate node
    (no UDF), and the fan-out happens map-side with no shuffle at all.
    1-based starts so DuckDB's ``generate_series``/``substr`` recompute it
    verbatim. Empty/null text yields one empty chunk at start 1 (the row is
    kept, not dropped — dedup/filtering decisions stay downstream)."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.coalesce(F.col(text_col), F.lit(""))), F.lit(1)), F.lit(stride)
    )
    return df.select(
        "*", F.explode(starts).alias(start_col)
    ).withColumn(chunk_col, F.substring(F.coalesce(F.col(text_col), F.lit("")), F.col(start_col), size))


def importance_sample(df: DataFrame, key_col: str, weight: Column) -> DataFrame:
    """Keep each row with probability = its own ``weight`` (clamped to
    [0,1]) — per-ROW acceptance, versus ``stratified_sample``'s per-group
    fractions: the importance/quality-proportional sampling step of a
    corpus mix (better documents survive more often). Deterministic: the
    row's md5 bucket is compared against weight·2¹⁶, so identical inputs
    always make identical decisions (retry/re-run/snapshot stable), and
    raising a row's weight can only ADD it to the sample, never swap it
    for a different row. Pure map-side filter, zero shuffle."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_bucket(F.col(key_col)) < w * F.lit(float(_SPLIT_SPACE)))


def budget_select(
    df: DataFrame,
    group_col: str,
    key_col: str,
    token_col: str,
    score: Column,
    budget: int,
) -> DataFrame:
    """Per-group token-budget selection: order each group's rows by
    (score desc, key) and keep rows while the running token total stays
    within ``budget`` — the greedy best-first fill used to cut a corpus to
    a target token count per domain. One cumulative-sum window per group
    (hash shuffle on the group key, per-group sort); the order is total,
    so the kept set is deterministic and engine-portable. The row that
    would cross the budget is excluded (strict knapsack bound)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("__score"), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__score", score)
        .withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
        .withColumnRenamed("__score", "sel_score")
    )


def weighted_sample(
    df: DataFrame, group_col: str, key_col: str, weight: Column, k: int
) -> DataFrame:
    """Per-group weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis exponential-clock reduction — each row draws the
    uniform u = md5(key)[:12 hex]/2⁴⁸ (48 exact mantissa bits, engine-
    portable) and keeps clock = -ln(u)/w; the k SMALLEST clocks per group
    are the sample. This is THE one-pass distributed reservoir: inclusion
    probabilities are proportional to weight, no RNG state, re-runs and
    retries pick the identical set, and at 100 TB it is one row_number
    window per group (the same shuffle any per-group top-k pays) — never a
    sequential reservoir walk. Clocks round to 10dp before ranking (ln is
    1-ulp-library-specific; 10dp is far above that and far below any real
    clock gap), ties break on the key. Weights must be > 0 — the gate below
    ENFORCES it: a non-positive (or NULL) weight yields a NULL clock and
    the row is dropped BEFORE ranking, so invalid-weight rows are never
    sampled — not even when a group has fewer than k valid rows
    (Efraimidis-Spirakis inclusion probability is proportional to weight;
    weight ≤ 0 means probability 0). Previously a negative weight produced
    a negative clock that sorted FIRST and was preferentially sampled
    (ADVICE r04); ranking NULLs last still padded them in when valid rows
    ran short, and a NaN weight slipped the ``> 0`` guard entirely (Spark
    orders NaN above every number) — both closed (r05 review). The
    2⁻⁴⁸-probability ``u = 0`` edge is excluded deterministically in BOTH
    engines (Spark's ``log(0)`` is NULL; the q116 oracle guards the same
    case), so the clock column is never NULL/NaN/Infinity. Keys must be
    non-NULL as well: a NULL key has no deterministic identity (md5(NULL)
    is NULL → NULL u → excluded), so such rows are never sampled —
    dedupe/repair keys upstream if they must participate."""
    u = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 48))
    valid = weight.isNotNull() & ~F.isnan(weight.cast("double")) & (weight > 0) & (u > 0)
    clock = F.when(valid, F.round(-F.log(u) / weight, 10))
    w = Window.partitionBy(group_col).orderBy(F.col("__clock"), F.col(key_col))
    return (
        df.withColumn("__clock", clock)
        .filter(F.col("__clock").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .withColumnRenamed("__clock", "sample_clock")
    )
