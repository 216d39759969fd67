"""Corpus quality filters and benchmark-contamination detection — the
document-level gatekeeping stage of an LLM training-data pipeline
(Gopher/C4-style repetition and shape heuristics; eval-set n-gram overlap).

Everything is a pure column expression or an equi-join:

- the repetition/shape metrics compile to codegen'd array expressions
  (``split``/``transform``/``filter``/``array_distinct``) evaluated per row —
  zero shuffle, zero Python, linear in document length;
- contamination is one explode + one equi-join on hashed n-grams: the only
  shuffle is on the n-gram key, the eval side is broadcast when small, and
  the per-doc aggregation reuses the doc key. At 100 TB this is the same
  shape as the MinHash candidate join (operators/dedup.py) — never all-pairs.

Formulas are engine-portable (ASCII regex classes, explicit fold orders), so
the DuckDB oracles recompute them exactly (q89/q90 and, via
operators/corpus.py compositions, q98-q100).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Word-level shape & repetition metrics (Gopher-style)
# ---------------------------------------------------------------------------


def words(text: Column) -> Column:
    """Whitespace word array of the trimmed text ([] for null/empty) — the
    shared tokenization of token_count/word_tokens."""
    t = F.trim(text)
    return F.when(t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def mean_word_length(text: Column) -> Column:
    """Average characters per word (0.0 when empty)."""
    w = words(text)
    return F.when(
        F.size(w) > 0,
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)) / F.size(w),
    ).otherwise(F.lit(0.0))


def distinct_word_ratio(text: Column) -> Column:
    """|distinct words| / |words| — low values mean heavy word reuse."""
    w = words(text)
    return F.when(F.size(w) > 0, F.size(F.array_distinct(w)) / F.size(w)).otherwise(F.lit(0.0))


def top_word_ratio(text: Column) -> Column:
    """Frequency of the most common word / |words| — the dominance analog of
    Gopher's top-n-gram character fraction. Max multiplicity == the longest
    equal-run of the SORTED word array, so one array_sort plus a single
    O(n) fold replaces the O(distinct × total) distinct-vs-all comparison
    (measured ~3× at sf0.1)."""
    w = words(text)
    best_run = F.aggregate(
        F.array_sort(w),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(F.size(w) > 0, best_run / F.size(w)).otherwise(F.lit(0.0))


def word_ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams in order ([] when fewer than n words).

    Built by zipping n aligned slices of the word array (one O(len) pass
    with per-element string concats) instead of transform-over-positions
    with a per-position slice+join — same grams in the same order,
    measured 3-5× faster at sf0.1 (the interpreted-HOF lesson from the
    rolling-fingerprint operator, SCALE.md)."""
    w = words(text)
    cnt = F.greatest(F.size(w) - (n - 1), F.lit(0))
    grams = F.slice(w, 1, cnt)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(w, j + 1, cnt), lambda acc, x: F.concat(acc, F.lit(" "), x)
        )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def dup_ngram_ratio(text: Column, n: int) -> Column:
    """1 − |distinct n-grams| / |n-grams| — Gopher's duplicate n-gram
    fraction in count form (0.0 when fewer than n words)."""
    g = word_ngrams(text, n)
    return F.when(
        F.size(g) > 0, F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g)
    ).otherwise(F.lit(0.0))


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of words containing at least one ASCII letter."""
    w = words(text)
    alpha = F.filter(w, lambda x: x.rlike("[A-Za-z]"))
    return F.when(F.size(w) > 0, F.size(alpha) / F.size(w)).otherwise(F.lit(0.0))


def quality_metrics(text: Column) -> dict[str, Column]:
    """All shape/repetition metrics, rounded to 6dp for engine parity."""
    return {
        "n_words": F.size(words(text)),
        "mean_word_len": F.round(mean_word_length(text), 6),
        "distinct_word_ratio": F.round(distinct_word_ratio(text), 6),
        "top_word_ratio": F.round(top_word_ratio(text), 6),
        "dup_bigram_ratio": F.round(dup_ngram_ratio(text, 2), 6),
        "dup_trigram_ratio": F.round(dup_ngram_ratio(text, 3), 6),
        "alpha_word_ratio": F.round(alpha_word_ratio(text), 6),
    }


# Default keep-thresholds (documented demo values — real pipelines sweep
# them per corpus; chosen so the synthetic documents table splits
# non-trivially into keep and drop).
GOPHER_THRESHOLDS = {
    "min_words": 20,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 10.0,
    "min_distinct_word_ratio": 0.25,
    "max_top_word_ratio": 0.20,
    "max_dup_trigram_ratio": 0.30,
}


def gopher_keep(text: Column, thresholds: dict | None = None) -> Column:
    """Boolean keep decision over the composite metric set."""
    t = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    m = quality_metrics(text)
    return (
        (m["n_words"] >= t["min_words"])
        & (m["n_words"] <= t["max_words"])
        & (m["mean_word_len"] >= t["min_mean_word_len"])
        & (m["mean_word_len"] <= t["max_mean_word_len"])
        & (m["distinct_word_ratio"] >= t["min_distinct_word_ratio"])
        & (m["top_word_ratio"] <= t["max_top_word_ratio"])
        & (m["dup_trigram_ratio"] <= t["max_dup_trigram_ratio"])
    )


def apply_quality_filters(
    docs: DataFrame, text_col: str = "text", thresholds: dict | None = None
) -> DataFrame:
    """Annotate every document with its metrics and the keep decision —
    the select is one codegen projection; downstream stages filter on
    ``keep`` so the predicate pushes into the scan."""
    text = F.col(text_col)
    m = quality_metrics(text)
    return docs.select(
        "*", *[expr.alias(name) for name, expr in m.items()]
    ).withColumn("keep", gopher_keep(text, thresholds))


# ---------------------------------------------------------------------------
# Benchmark-contamination detection
# ---------------------------------------------------------------------------


def ngram_set(docs: DataFrame, n: int, id_col: str, text_col: str, use_hash: bool = True) -> DataFrame:
    """(id, gram) rows of each document's DISTINCT word n-grams. With
    ``use_hash`` the gram string is xxhash64'd so the explode/shuffle carries
    8-byte keys instead of strings — the 100 TB form (collisions ~2⁻⁶⁴,
    deterministic)."""
    gram = F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    out = docs.select(F.col(id_col).alias("id"), gram)
    if use_hash:
        out = out.select("id", F.xxhash64("gram").alias("gram"))
    return out


def contamination_scores(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document eval-set overlap: |distinct doc n-grams ∩ eval n-grams|
    / |distinct doc n-grams| — the standard decontamination screen run
    before training (a doc sharing most of its n-grams with a benchmark is
    a leak, not a training example).

    Plan shape: both sides explode to distinct (id, gram) rows; the eval
    gram SET (distinct, dropped id) is broadcast when small (the usual case
    — benchmarks are tiny vs the corpus) or shuffle-joined on the hashed
    gram otherwise; a left-semi join marks hits and one groupBy(id) closes
    the score. No driver-side state at any size."""
    doc_grams = ngram_set(docs, n, id_col, text_col, use_hash)
    eval_grams = ngram_set(eval_docs, n, id_col, text_col, use_hash).select("gram").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = doc_grams.join(eval_grams, on=["gram"], how="leftsemi")
    totals = doc_grams.groupBy("id").agg(F.count(F.lit(1)).alias("total_ngrams"))
    matched = hits.groupBy("id").agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    return (
        totals.join(matched, on=["id"], how="left")
        .select(
            F.col("id").alias(id_col),
            "total_ngrams",
            F.coalesce("contaminated_ngrams", F.lit(0)).alias("contaminated_ngrams"),
            F.round(
                F.coalesce("contaminated_ngrams", F.lit(0)) / F.col("total_ngrams"), 6
            ).alias("contamination_ratio"),
        )
    )
