"""Bloom-filter join pruning — the canonical 100 TB shuffle-avoidance
technique, completing the sketch family (CMS q121/q123, KMV q106, t-digest
q126, GK/HLL q57): build a compact bit-set over the SMALL side's join keys,
broadcast it, and filter the BIG side map-side before any shuffle or exact
join. Blooms have no false negatives, so `prune → exact join` returns
EXACTLY the plain join's rows — the pruning is a pure physical optimization
the gate (q129) can hash against a plain SQL join oracle.

Spark-first shape (zero UDFs, zero driver state, zero big-side shuffle):

- **build**: each key explodes to ``num_hashes`` bit positions
  (``pmod(xxhash64(seed_i, key), num_bits)``), positions aggregate to
  64-bit words (``bit_or`` of ``1 << pos%64``), and the words fold into a
  SINGLE ROW holding a DENSE ``array<bigint>`` of length ``num_bits/64``
  (zero-filled gaps) — 128 KiB for a 1M-bit filter. The build is one
  aggregation of the SMALL side plus a word-sized densify join.
- **probe**: the one-row filter cross-joins (broadcast — one row) onto the
  big side, and membership is a fused boolean expression: AND over the
  ``num_hashes`` unrolled ``element_at(words, pos/64 + 1) & (1 << pos%64)
  ≠ 0`` checks — whole-stage-codegen'd JVM arithmetic per row, no explode,
  no groupBy, no shuffle. ``element_at`` on an ARRAY is a direct O(1)
  offset read; the r06 ``map<int,bigint>`` container was a LINEAR scan of
  the key array per lookup (Spark's ``GetMapValue`` has no hash index —
  VERDICT r06 measured 3× at 30k keys, ~10× at 300k, unbounded growth),
  which inverted the operator's purpose at dim-side scale. At 1000
  executors the dense array rides the broadcast and the big scan never
  moves.

NULL keys: ``xxhash64(NULL, seed)`` returns the SEED (not NULL — probed
empirically on Spark 4.1), so nulls are handled explicitly — excluded at
build and failed at probe, matching SQL join/semi-join semantics where
NULL never matches (pytest-pinned).

Spark itself applies runtime bloom pruning inside some shuffle joins
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator makes
the technique available as an EXPLICIT, composable step — prune early
behind other operators (e.g. before an expensive normalize), persist the
one-row filter via ``bloom_prepare``, or ship it across pipeline stages —
none of which the optimizer's internal variant can do.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k for n keys, m bits,
k hashes; the classic optimum is k = (m/n)·ln2. ``bloom_fpr_bound`` gives
the formula so callers (and the q129 gate) can assert observed FPR.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators.lifecycle import (
    is_checkpointed_relation as _is_checkpointed_relation,
)


def _key_kind(dtype: str) -> str:
    """Hash-compatibility class of a key dtype. xxhash64 hashes the SAME
    VALUE differently per physical type (int 7 ≠ bigint 7 — verified), so
    build and probe must normalize to one physical type per class or a
    type mismatch silently yields 100% false negatives (r06 review: a
    plain join would have implicitly cast and matched)."""
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return "integral"
    if dtype in ("float", "double"):
        return "fractional"
    return dtype  # strings, dates, binary … — must match exactly


def _canonical_key(col: Column, kind: str) -> Column:
    """One physical type per hash class: integral → bigint, fractional →
    double, everything else as-is."""
    if kind == "integral":
        return col.cast("bigint")
    if kind == "fractional":
        return col.cast("double")
    return col


def _one_shl(bits: Column) -> Column:
    """``CAST(1 AS BIGINT) << bits`` with a COLUMN shift amount — the
    catalyst ShiftLeft expression accepts one, but PySpark's ``shiftleft``
    wrapper artificially requires a Python int, so go through
    call_function."""
    return F.call_function("shiftleft", F.lit(1).cast("bigint"), bits.cast("int"))


def bloom_build(df: DataFrame, key_col: str, num_bits: int, num_hashes: int) -> DataFrame:
    """ONE-ROW Bloom filter over ``df[key_col]``'s non-null values:
    (words: dense array<bigint> of length num_bits/64, num_bits,
    num_hashes, key_kind). The only wide work is one groupBy over
    ≤ num_bits/64 word indexes plus a word-sized densify join against
    ``range(num_words)`` — all small-side sized, independent of the big
    side entirely.

    The densify step is a LEFT join + array_sort fold, both
    O(W log W) in the word count, never O(W²): the obvious alternative —
    ``transform(sequence(0, W−1), i → map[i])`` over the r06 map — pays
    GetMapValue's linear key scan PER ELEMENT, which is quadratic in W
    and already hurts at the ~2.5M words a 10M-key dim side needs."""
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if not (1 <= num_hashes <= 16):
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")
    num_words = num_bits // 64
    kind = _key_kind(dict(df.dtypes)[key_col])
    key = _canonical_key(F.col(key_col), kind)
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
                for i in range(num_hashes)
            ]
        )
    ).alias("pos")
    words = (
        df.filter(key.isNotNull())  # NULL never matches a join — keep it out
        .select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            # bit_or of single-bit words: shift a BIGINT one so positions
            # ≥ 31 do not overflow int arithmetic
            F.bit_or(_one_shl(F.col("pos") % 64)).alias("bits")
        )
    )
    dense = (
        df.sparkSession.range(num_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"))
    )
    return dense.agg(
        # array_sort on (w, bits) structs orders by w (struct ordering is
        # lexicographic by field position), so the extracted bits land at
        # their word index — collect_list alone has NO ordering guarantee
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias("words")
    ).select(
        "words",
        F.lit(num_bits).alias("num_bits"),
        F.lit(num_hashes).alias("num_hashes"),
        F.lit(kind).alias("key_kind"),
    )


def bloom_might_contain(key: Column, words: Column, num_bits: int, num_hashes: int) -> Column:
    """Membership expression: AND over the unrolled per-hash bit tests.
    Pure JVM arithmetic (codegen), no UDF; NULL keys are False (SQL join
    semantics — xxhash64 would otherwise hash NULL to the seed). The word
    lookup is ``element_at`` on a dense ARRAY — an O(1) offset read per
    hash, regardless of filter size (the index is provably in
    [1, num_bits/64] because pmod bounds pos, so ANSI mode cannot
    raise)."""
    test = None
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        word = F.element_at(words, (pos / 64).cast("int") + F.lit(1))
        bit = word.bitwiseAND(_one_shl(pos % 64))
        check = bit != 0
        test = check if test is None else (test & check)
    return key.isNotNull() & test


def bloom_prepare(bloom: DataFrame) -> DataFrame:
    """Materialize a filter once for repeat-prune use: returns the eagerly
    checkpointed one-row relation, which ``bloom_prune`` recognizes and
    reuses without re-checkpointing — N prunes against one filter run the
    build aggregation once and pin ONE set of blocks, not N (ADVICE r06:
    the per-call eager checkpoint accumulated pinned BlockManager entries
    in resident drivers). Release with ``etl.release_checkpoints([bloom])``
    when the filter retires — the shared ``lifecycle.prepared``
    contract (operators/lifecycle.py; the sketch shims were retired in
    r09, this named wrapper stays for the bloom-specific docs)."""
    from kf_task_fhir_etl_spark.operators.lifecycle import prepared

    return prepared(bloom)


def bloom_prune(big: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Filter ``big`` to rows whose key might be in the filter: broadcast
    the ONE-ROW bloom, cross join, test per row, drop the filter columns.
    The plan is scan → broadcast nested loop (1 row) → codegen'd filter —
    the big side never shuffles, which is the entire point.

    The bloom relation must be materialized before probing (its shape —
    num_bits/num_hashes/key_kind — is read to build the membership
    expression, and without a checkpoint every downstream action on the
    pruned frame would re-run the whole build aggregation; q129 consumes
    the pruned frame multiple ways — r06 review). An ALREADY checkpointed
    filter (``bloom_prepare``) is reused as-is, so repeat-prune callers
    materialize and pin the build exactly once AND hold the handle that
    ``etl.release_checkpoints`` can free deterministically. A raw build
    is checkpointed INTERNALLY instead — correct for one-shot use, but
    that internal handle is unreachable from the caller (releasing the
    raw build frame is a reflection no-op on its Aggregate plan), so its
    blocks are reclaimed only by GC + ContextCleaner; resident drivers
    must use the ``bloom_prepare`` path for a deterministic lifecycle
    (r07 review — the docstring previously promised a release path the
    unprepared caller does not actually have)."""
    # reserved-name guard BEFORE any checkpoint (r07 review, ninth pass):
    # a probe side already carrying __bloom_* columns would sail past the
    # shape validations and die in the cross join with an opaque
    # ambiguous-reference AnalysisException — raised after the internal
    # checkpoint materialized, leaking its blocks on every retry (the
    # ivm/zorder reserved-staging-name discipline)
    clash = {"__bloom_words", "__bloom_bits", "__bloom_hashes", "__bloom_kind"}.intersection(
        big.columns
    )
    if clash:
        raise ValueError(
            f"bloom_prune: probe columns {sorted(clash)} collide with the "
            "reserved __bloom_* staging names; rename them first"
        )
    took_internal_ckpt = not _is_checkpointed_relation(bloom)
    if took_internal_ckpt:
        bloom = bloom.localCheckpoint(eager=True)
    # repeat prunes against one PREPARED filter re-read an immutable shape
    # row — cache it on the frame object so only the first prune pays the
    # one-row job (r07 review, eighth pass: N prunes otherwise cost N
    # driver job submissions for metadata that cannot change after the
    # checkpoint). The attribute lives and dies with the caller's handle.
    row = getattr(bloom, "_bloom_shape_row", None)
    if row is None:
        row = bloom.first()  # reads the checkpoint, not a fresh build execution
        if row is not None:
            bloom._bloom_shape_row = row

    def _reject(msg: str) -> None:
        # the filter's kind/shape are DATA (literal columns), so
        # validation necessarily runs after materialization — release the
        # just-taken internal checkpoint before raising, or each rejected
        # retry pins one build's blocks until GC (r07 review, fourth
        # pass — the run_pipeline domain-clash discipline). A PREPARED
        # filter stays alive: its caller holds the handle and may fix the
        # probe side and retry.
        if took_internal_ckpt:
            from kf_task_fhir_etl_spark.etl import release_checkpoints

            release_checkpoints([bloom])
        raise ValueError(msg)

    if row is None:
        _reject("bloom_prune: empty bloom relation (build produced no row)")
    probe_kind = _key_kind(dict(big.dtypes)[key_col])
    if probe_kind != row["key_kind"]:
        _reject(
            f"bloom_prune: probe key {key_col!r} is {probe_kind}, filter was "
            f"built over {row['key_kind']} keys — xxhash64 is type-"
            "sensitive, so this would silently drop every matching row; "
            "cast one side"
        )
    b = bloom.select(
        F.col("words").alias("__bloom_words"),
        F.col("num_bits").alias("__bloom_bits"),
        F.col("num_hashes").alias("__bloom_hashes"),
        F.col("key_kind").alias("__bloom_kind"),
    )
    pruned = big.crossJoin(F.broadcast(b)).filter(
        bloom_might_contain(
            _canonical_key(F.col(key_col), probe_kind),
            F.col("__bloom_words"),
            row["num_bits"],
            row["num_hashes"],
        )
    )
    return pruned.drop("__bloom_words", "__bloom_bits", "__bloom_hashes", "__bloom_kind")


def bloom_fpr_bound(n_keys: int, num_bits: int, num_hashes: int) -> float:
    """Expected false-positive rate (1 − e^(−k·n/m))^k — the standard
    Bloom bound, used by q129's observed-FPR boolean."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / float(num_bits))) ** num_hashes
