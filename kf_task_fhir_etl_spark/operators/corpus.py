"""Corpus-construction operators past the filter/dedup gate: TF-IDF keyword
extraction, PII redaction, temperature-scaled mixture resampling, and
sharded deterministic shuffling — the stages that turn a cleaned document
pool into an actual training corpus.

Design rules shared with operators/filters.py and operators/sampling.py:

- every transform is a codegen column expression or an equi-join — no Python
  in the hot path, no driver-side state at any corpus size;
- every stochastic-looking choice (sample membership, shuffle order) is a
  pure function of the row's key via md5, so re-runs, retries, and
  incremental ingests are stable and a DuckDB oracle can recompute the
  exact same decision;
- formulas are engine-portable (ASCII regex classes, explicit rounding
  before any threshold/rank comparison) so correctness gates hash VALUES,
  not just shapes.

The reference (kids-first/kf-task-fhir-etl) has no corpus surface — these
are engine extensions in the spirit of its deterministic re-runnable ETL
(`etl/ingest.py:519-531`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators.filters import words

# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


def term_counts(docs: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """(group, term, tf) — lowercased whitespace terms exploded and counted
    per group. The explode is a Generate node (map-side fan-out, no
    shuffle); the count is one hash aggregate on (group, term) with
    map-side partial combine, so each executor emits at most its local
    distinct-term set regardless of how many occurrences it scanned."""
    term = F.explode(words(F.lower(F.col(text_col)))).alias("term")
    return (
        docs.select(F.col(group_col).alias("group"), term)
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(docs: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Smoothed TF-IDF per (group, term): ``tf · ln((N+1)/(df+1))`` where N
    is the number of groups and df the number of groups containing the
    term.

    Plan shape at 100 TB: the tf aggregate is materialized ONCE
    (localCheckpoint — without it Catalyst plans three independent corpus
    scans for tf/df/N: the pruned subtrees differ, so runtime exchange
    reuse never fires, verified in tests/test_partitioning.py); df and N
    are aggregates OF that materialized table, N broadcasts via cross
    join, and the tf⋈df equi-join shuffles on the term key. Nothing is
    ever collected; scores round to 6dp so the DuckDB oracle (natural log,
    double division — bit-identical inputs) hashes the same values."""
    tf = term_counts(docs, group_col, text_col).localCheckpoint()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.count_distinct(F.col("group")).alias("n_groups"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "group",
            "term",
            "tf",
            "df",
            "n_groups",
            F.round(
                F.col("tf") * F.log((F.col("n_groups") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )


def top_terms(scored: DataFrame, k: int) -> DataFrame:
    """Top-k terms per group by (tfidf desc, term asc) — one row_number
    window over the group key; per-group sort, never global."""
    w = Window.partitionBy("group").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("group", "rnk", "term", "tf", "df", "tfidf")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied in order. Patterns restrict to ASCII
# classes + \b/\d, the subset where Java regex and DuckDB's RE2 agree.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Replace emails / IPv4 addresses / phone numbers with typed tokens.
    Each category is counted on the text AS THE REDACTOR SEES IT (after the
    previous categories' replacements), so every count equals the number of
    replacement tokens actually emitted — overlapping matches (a phone-
    shaped local part inside an email, digits the IP pattern would also
    claim) are attributed to exactly one category, the one that consumed
    them first in ``PII_PATTERNS`` order.

    Pure map-side: ``regexp_count`` + chained ``regexp_replace`` are JVM
    built-ins inside one codegen projection — the scrub pass over 100 TB is
    embarrassingly parallel with zero shuffle, exactly like the quality
    filter stage it runs next to."""
    red: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, repl)
    return df.select(
        "*", *[c.alias(nm) for nm, c in counts.items()], red.alias(out_col)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture resampling
# ---------------------------------------------------------------------------


def mixture_quotas(
    df: DataFrame, group_col: str, alpha: float, target_total: int
) -> DataFrame:
    """Per-group document quotas under temperature-scaled sampling:
    ``w_g = n_g^α / Σ n^α``, ``quota_g = min(n_g, floor(target · w_g))`` —
    the α-sampling rule multilingual/multi-domain pretraining uses to keep
    head domains from drowning tail domains (α=1 preserves the empirical
    mixture, α=0 is uniform, α≈0.5 the usual compromise).

    The group-count table is tiny (|domains| rows), so the normalizer is a
    one-row cross join and the whole quota computation is driver-free.
    ``w`` is rounded to 6dp before the floor so both engines threshold the
    same double."""
    stats = df.groupBy(F.col(group_col).alias("group")).agg(F.count(F.lit(1)).alias("n_docs"))
    denom = stats.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("denom")
    )
    return stats.crossJoin(F.broadcast(denom)).select(
        "group",
        "n_docs",
        F.least(
            F.col("n_docs"),
            F.floor(
                F.lit(float(target_total))
                * F.round(F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("denom"), 6)
            ),
        ).alias("quota"),
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_total: int = 200,
) -> DataFrame:
    """Resample the corpus to the temperature-scaled mixture: rank rows
    within each group by (md5(key), key) — the deterministic pseudo-random
    order shared with ``sampling.quota_sample`` — and keep the first
    ``quota_g``. One row_number window on the group key plus a broadcast
    join against the |domains|-row quota table. Stability contract:
    membership is a pure function of the key SET and the parameters, so
    re-runs/retries over the same corpus are stable, and on a FIXED corpus
    the kept sets nest as ``target_total`` grows (pytest-propertied).
    Under incremental ingest they do NOT nest — new documents shift both
    the per-group quotas and the md5 rank positions — unlike
    ``sampling.deterministic_split`` / ``stratified_sample``, whose
    per-row hash thresholds are ingest-stable."""
    quotas = mixture_quotas(df, group_col, alpha, target_total)
    order = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), on=F.col(group_col) == F.col("group"))
        .filter(F.col("__rn") <= F.col("quota"))
        .drop("__rn", "group", "n_docs", "quota")
    )


# ---------------------------------------------------------------------------
# Cross-corpus span deduplication (C4/CCNet-style repeated-passage removal)
# ---------------------------------------------------------------------------


def doc_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", span_words: int = 10
) -> DataFrame:
    """(id, pos, span) — each document cut into non-overlapping
    ``span_words``-word spans (the last span may be shorter). Pure map-side
    fan-out: sequence + slice + array_join inside one Generate node."""
    w = words(F.col(text_col))
    n = F.ceil(F.size(w) / F.lit(float(span_words)))
    spans = F.when(
        F.size(w) > 0,
        F.transform(
            F.sequence(F.lit(0), (n - 1).cast("int")),
            lambda i: F.array_join(F.slice(w, i * span_words + 1, span_words), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col).alias("id"), F.posexplode(spans).alias("pos", "span"))


def span_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", span_words: int = 10
) -> DataFrame:
    """Remove repeated passages ACROSS the corpus, keeping each span's first
    occurrence in (id, pos) order — the C4 three-sentence-span rule in word
    units — then reassemble every document from its surviving spans.
    Returns (id, n_spans, n_kept, kept_text).

    Plan shape: explode to spans (map-side), ONE window shuffle on the span
    text to pick first occurrences, one groupBy(id) to reassemble. At
    100 TB the span key should be xxhash64'd (narrow shuffle) exactly like
    the contamination screen; here the raw span is kept so the oracle can
    join on strings. Skew note: a pathologically common span (boilerplate)
    concentrates one window partition — pre-aggregate with a
    (span → min(id,pos)) groupBy instead if that bites; same result, and
    partial aggregation absorbs the skew map-side."""
    spans = doc_spans(docs, id_col, text_col, span_words)
    w_first = Window.partitionBy("span").orderBy("id", "pos")
    firsts = spans.withColumn("__rn", F.row_number().over(w_first)).filter(F.col("__rn") == 1)
    # anchor on the DOCUMENT set, not the span set: a null/empty/whitespace
    # doc yields zero spans but must still come back (n_spans=0) — same
    # keep-the-row contract as fully-deduplicated docs
    base = docs.select(F.col(id_col).alias("id")).distinct()
    totals = spans.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    rebuilt = firsts.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))), lambda s: s["span"]
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        base.join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


# ---------------------------------------------------------------------------
# Percentile-threshold quality filtering
# ---------------------------------------------------------------------------


def percentile_filter(
    df: DataFrame,
    group_col: str,
    score: Column,
    key_col: str,
    min_pr: float = 0.25,
) -> DataFrame:
    """Keep rows at or above the ``min_pr`` percentile of ``score`` WITHIN
    their group — the adaptive form of a fixed quality threshold (each
    domain keeps its best (1−min_pr) share, so a clean domain isn't
    truncated by a dirty domain's scale). One percent_rank window per
    group; the (score, key) order is total, so rank — and therefore
    membership — is deterministic and engine-portable. Adds ``score`` and
    6dp-rounded ``pr`` columns."""
    w = Window.partitionBy(group_col).orderBy("score", key_col)
    return (
        df.withColumn("score", score)
        .withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pr") >= F.lit(min_pr))
    )


# ---------------------------------------------------------------------------
# Sharded deterministic shuffle (training order)
# ---------------------------------------------------------------------------


def shuffle_shards(
    df: DataFrame, key_col: str, shards: int = 64, seed: int = 0
) -> DataFrame:
    """Assign every row a (shard, position) in a deterministic global
    shuffle: ``shard = md5₁₆(seed:key) mod shards`` and position = rank of
    the full md5 within the shard. This is how a 100 TB corpus gets its
    training order WITHOUT a global sort: one hash shuffle on the shard key,
    a per-shard sort (parallelism = shards), and readers stream shards in
    any order — versus ``orderBy(rand())``, which is a full-range global
    sort that re-draws every run and funnels tail skew into one task.

    The md5 hex string itself is the sort key (lexicographic order is
    engine-portable; no 64-bit integer parsing needed), and ``seed`` prefixes
    the hash input so epochs get independent orders from the same corpus."""
    keyed = F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    h = F.md5(keyed)
    shard = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % F.lit(shards)
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs (similar-doc detection without embeddings)
# ---------------------------------------------------------------------------


def tfidf_doc_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap_frac: float = 0.5,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_a < doc_b, cosine) pairs whose TF-IDF vectors' cosine ≥
    ``threshold`` — near-duplicate/derivative detection over SPARSE lexical
    vectors, the no-embedding complement to ``similarity`` (MinHash finds
    shingle overlap; this finds weighted-term overlap, robust to
    reordering).

    Vocabulary rule (part of the semantics, and the scale lever): terms
    with df > ``df_cap_frac``·N are dropped from the VECTORS themselves
    (weights and norms alike) — a term in most documents carries ~zero IDF
    anyway, and keeping it would make the term-key join emit ~N² pairs.
    Under the filtered vocabulary the cosine is EXACT: docs only meet
    through shared terms, and every shared term contributes to the dot via
    one (term-key) equi-join + one (pair-key) sum — work is
    Σ_terms df(term)², capped by the rule, never all-pairs. Weights and
    cosines round to 6dp before the threshold so a DuckDB oracle
    recomputes identical decisions."""
    # ONE canonical weight definition: reuse tfidf() (same tf/df/N formula
    # the q91 oracle mirrors) and apply the df cap on its output
    scored = tfidf(docs, id_col, text_col).withColumnRenamed("group", "id")
    vec = (
        scored.filter(F.col("df") <= F.col("n_groups") * F.lit(df_cap_frac))
        .select("id", "term", F.col("tfidf").alias("w"))
        .localCheckpoint()
    )
    norms = vec.groupBy("id").agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 6).alias("nrm"))
    a = vec.select(F.col("id").alias("ida"), "term", F.col("w").alias("wa"))
    b = vec.select(F.col("id").alias("idb"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("ida"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("idb"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "ida")
        .join(nb, "idb")
        .select(
            F.col("ida").alias("doc_a"),
            F.col("idb").alias("doc_b"),
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
