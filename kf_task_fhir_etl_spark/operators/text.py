"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All pure column expressions (codegen'd, zero
Python in the hot path) with engine-portable formulas so the DuckDB oracles
can recompute them exactly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators.dedup import word_tokens

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for null/empty)."""
    t = F.trim(text)
    return F.when(t.isNull() | (F.length(t) == 0), F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# BPE-ish tokenization: letter runs split into ≤4-char subwords, each digit
# its own token, each non-alphanumeric symbol its own token — the same
# greedy-left-to-right shape (and ~token-per-4-chars budget) as byte-pair
# vocabularies, without shipping a merges table. ASCII classes + alternation
# only, so Java regex (Spark) and RE2 (DuckDB regexp_extract_all) agree on
# every match.
BPE_ISH_PATTERN = r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"


def regex_token_count(text: Column, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-ish token count: non-overlapping matches of ``pattern`` (0 for
    null/empty). Stays in codegen via ``regexp_count`` — the budget-estimator
    companion to the whitespace ``token_count`` (a 12-letter word costs 3
    subword tokens here, 1 there)."""
    t = F.trim(text)
    return F.when(t.isNull() | (F.length(t) == 0), F.lit(0)).otherwise(
        F.regexp_count(t, F.lit(pattern))
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    clean = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(clean) / F.length(text)).otherwise(F.lit(0.0))


def stopword_count(text: Column, stopwords: tuple[str, ...]) -> Column:
    toks = word_tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS["en"]) -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text, stopwords) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]:
    0.4·min(len/500,1) + 0.3·(1−punct_ratio) + 0.3·stopword_ratio(en).
    The formula itself is the operator; weights are a demo default."""
    length_part = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.lit(0.4) * length_part + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text)) + F.lit(0.3) * stopword_ratio(text)


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    n = token_count(text)
    return {
        lang: F.when(n > 0, stopword_count(text, words) / n).otherwise(F.lit(0.0))
        for lang, words in STOPWORDS.items()
    }


def language_id(text: Column) -> Column:
    """Argmax of language scores; ties and all-zero → 'und'. Deterministic:
    languages compared in sorted order, strictly-greater wins.

    Column form (interpreted HOFs — fine for small batches); the table form
    below is the codegen'd hot path."""
    scores = language_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(scores):
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def language_id_table(df, text_col: str = "text", id_col: str = "doc_id"):
    """DataFrame-level language ID: explode tokens → conditional-sum per
    language → argmax. Every stage is whole-stage-codegen'd (the Column form
    filters token arrays with interpreted lambdas per language — measured 3×
    slower); the groupBy partially aggregates map-side so the shuffle is
    O(docs)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.col(text_col))).alias("t"),
    )
    aggs = [
        F.sum(F.when(F.col("t").isin(*words), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    ]
    counts = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *aggs)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(STOPWORDS):
        s = F.when(F.col("n") > 0, F.col(f"c_{lang}") / F.col("n")).otherwise(F.lit(0.0))
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    # empty/whitespace-only docs produce no token rows in the explode — they
    # are 'und' by definition and rejoin via anti-join
    classified = counts.select(F.col("id"), best_lang.alias("lang_id"))
    missing = df.select(F.col(id_col).alias("id")).join(classified, "id", "left_anti").select(
        "id", F.lit("und").alias("lang_id")
    )
    return classified.unionByName(missing)


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical text form: lowercase, strip non-alphanumerics to spaces,
    collapse whitespace."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_for_fingerprint(text))


def rolling_fingerprints(text: Column, window: int = 32, stride: int = 16, max_chars: int = 512) -> Column:
    """Rolling window fingerprints (winnowing-style): md5 of each
    ``window``-char slice of the normalized text at ``stride`` offsets —
    shared fingerprints across documents flag partial overlap. Map-side.

    NOTE: higher-order functions run interpreted in Spark — this array form
    is fine for per-row consumers, but the hot path is
    ``rolling_fingerprint_rows`` below (codegen'd explode, measured ~5×
    faster end-to-end at sf0.1 — same pattern as ``minhash_signatures``)."""
    t = F.substring(normalize_for_fingerprint(text), 1, max_chars)
    n_windows = F.greatest((F.length(t) - F.lit(window)) / F.lit(stride) + 1, F.lit(1)).cast("int")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_windows - 1),
            lambda i: F.md5(t.substr(i * stride + 1, F.lit(window))),
        )
    )


def rolling_fingerprint_rows(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 16,
    max_chars: int = 512,
):
    """Codegen form of ``rolling_fingerprints``: one (id, fp) row per
    DISTINCT window hash. Explode a position sequence and substring at the
    exploded index — every stage (sequence, explode, substr, md5) is a JVM
    built-in inside whole-stage codegen; the per-doc ``array_distinct`` of
    the array form becomes one (id, fp) distinct. Identical result set to
    exploding the array form (pinned in tests)."""
    t = F.substring(normalize_for_fingerprint(F.col(text_col)), 1, max_chars)
    base = df.select(F.col(id_col).alias("id"), t.alias("t"))
    n_windows = F.greatest(
        (F.length("t") - F.lit(window)) / F.lit(stride) + 1, F.lit(1)
    ).cast("int")
    pos = base.select("id", "t", F.explode(F.sequence(F.lit(0), n_windows - F.lit(1))).alias("i"))
    fp = F.md5(F.col("t").substr(F.col("i") * stride + F.lit(1), F.lit(window)))
    return pos.select("id", fp.alias("fp")).distinct()


def bigram_logprob_scores(
    docs, id_col: str = "doc_id", text_col: str = "text", smoothing: float = 0.5
):
    """Per-document average bigram negative log-probability under a bigram
    language model fit on the corpus itself — the CCNet-style fluency
    signal (low score ≈ the corpus's own idiom; high ≈ boilerplate, noise,
    other languages). Returns (id, n_bigrams, nll) with nll NULL for docs
    with fewer than two tokens (rows are anchored on the INPUT set — no
    silent drops).

    Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V), add-k smoothing,
    V = |unigram vocabulary|, c(w1·) = Σ_w2 c(w1,w2) (so contexts and
    bigram mass agree by construction). Plan shape at 100 TB: bigrams are
    a map-side slice/zip explode (no join to form pairs); model fitting is
    two hash aggregates OF the bigram table; scoring re-joins doc bigrams
    to the model on the (w1, w2) key — one shuffle join, never a per-row
    UDF. nll rounds to 6dp (ln is 1-ulp library-specific; the average over
    a doc's bigrams sits far above that)."""
    from kf_task_fhir_etl_spark.operators.filters import words

    toks = F.filter(words(F.lower(F.col(text_col))), lambda t: F.length(t) > 0)
    n = F.size(toks)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__t"), n.alias("__n"))
    pairs = base.filter(F.col("__n") >= 2).select(
        "id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, F.col("__n") - 1).alias("w1"),
                F.slice(F.col("__t"), 2, F.col("__n") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # model tables: bigram counts materialized once; contexts/vocab derive
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).localCheckpoint()
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = base.select(F.explode("__t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    k = F.lit(float(smoothing))
    scored = (
        pairs.join(bigrams, ["w1", "w2"])
        .join(contexts, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (-F.log((F.col("c12") + k) / (F.col("c1") + k * F.col("v")))).alias("__nll"),
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.round(F.avg("__nll"), 6).alias("nll"))
    )
    return (
        base.select("id")
        .join(scored, "id", "left")
        .na.fill({"n_bigrams": 0})
        .withColumnRenamed("id", id_col)
    )
