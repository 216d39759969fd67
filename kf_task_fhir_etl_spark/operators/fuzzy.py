"""Fuzzy matching / entity resolution — blocked edit-distance joins.

The cardinal rule at scale is the same as every dedup operator in this
package: NEVER all-pairs. Candidate pairs come from an equi-join on a
blocking key derived from a stable region of the string (here: a prefix the
corruption model provably cannot touch; in practice: phonetic codes, sorted
token prefixes, or an LSH bucket from operators/dedup.py), and the exact
edit-distance only runs inside blocks. ``levenshtein`` is a JVM built-in
(codegen, no UDF) with identical semantics in DuckDB, so match decisions are
oracle-checkable.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_char_block(text: Column) -> Column:
    """Single-character blocking key. NOT the default: with ~36 possible
    blocks, Σ|dirty_b|·|clean_b| approaches all-pairs on a corpus-scale
    input. Use it only when a known corruption model makes position 1 the
    provably stable region AND the candidate sets are reference-list-sized
    (the q105 gate's case)."""
    return F.substring(text, 1, 1)


def prefix_length_block(text: Column, prefix: int = 2, len_bucket: int = 4) -> Column:
    """Default blocking key: (first ``prefix`` chars, length ÷ ``len_bucket``)
    — a composite that keeps blocks small at corpus scale (|alphabet|^prefix
    × length-buckets, thousands of blocks instead of first-char's ~36, and
    the max block shrinks multiplicatively since the two components are
    nearly independent). Recall contract: a match is found iff the true
    counterpart agrees on the prefix AND lands in the same length bucket —
    edits at positions > ``prefix`` that move the length by less than the
    bucket width usually stay co-blocked, but an edit AT a bucket boundary
    or in the prefix escapes. For guaranteed recall under a known
    corruption model, pass an explicit corruption-stable key (phonetic
    code, sorted-token prefix, LSH bucket)."""
    return F.concat(
        F.substring(text, 1, prefix),
        F.lit(":"),
        F.floor(F.length(text) / F.lit(len_bucket)).cast("string"),
    )


def blocked_fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    id_col: str,
    dirty_text: str,
    clean_text: str,
    block_fn: Callable[[Column], Column] = prefix_length_block,
    broadcast_clean: bool = True,
) -> DataFrame:
    """For every dirty record, the closest clean string by Levenshtein
    distance among candidates sharing its blocking key (ties → smallest
    candidate string). Returns (id, dirty_text, matched, dist).

    Plan shape: one equi-join on the block key (clean side broadcast when
    it is a reference list — the usual entity-resolution case — else a hash
    join on the block key), distances computed inside codegen, one
    row_number window per dirty id. Work is Σ_blocks |dirty_b|·|clean_b|;
    block design, not the operator, is the scale lever. Recall bound: a
    match is found iff the true counterpart shares the block key — pick the
    key from a region the expected corruptions can't touch."""
    bd = dirty.select(
        F.col(id_col).alias("id"),
        F.col(dirty_text).alias("dirty"),
        block_fn(F.col(dirty_text)).alias("__blk"),
    )
    bc = clean.select(
        F.col(clean_text).alias("__cand"), block_fn(F.col(clean_text)).alias("__blk")
    ).distinct()
    if broadcast_clean:
        bc = F.broadcast(bc)
    cand = bd.join(bc, "__blk").select(
        "id", "dirty", "__cand", F.levenshtein(F.col("dirty"), F.col("__cand")).alias("dist")
    )
    w = Window.partitionBy("id").orderBy("dist", "__cand")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("dirty").alias(dirty_text),
            F.col("__cand").alias("matched"),
            "dist",
        )
    )
