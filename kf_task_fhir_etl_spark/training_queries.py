"""Training-data-pipeline operator queries (dedup, similarity, text analysis)
plus general OLAP shapes (window top-k, event windows, sessionization) — each
paired with a DuckDB oracle recomputing the identical md5-based formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.catalog import load_table
from kf_task_fhir_etl_spark.operators import asof, dedup, similarity, text
from kf_task_fhir_etl_spark.queries import register

# ---------------------------------------------------------------------------
# Window function top-k per group (general OLAP; no reference counterpart —
# SURVEY.md §2.6 notes the reference has none).
# ---------------------------------------------------------------------------


@register(
    "q09_topk_per_group",
    oracle="""
    SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders)
    WHERE rnk <= 2
    ORDER BY o_custkey, rnk
    """,
)
def q09_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rnk")
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "q10_dedup_exact",
    oracle="""
    SELECT source, COUNT(*) AS n_survivors FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    GROUP BY source ORDER BY source
    """,
)
def q10_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = dedup.exact_dedup(docs, ["text"], "doc_id")
    return (
        survivors.groupBy("source").agg(F.count(F.lit(1)).alias("n_survivors")).orderBy("source")
    )


_MINHASH_ORACLE_CTE = """
    WITH sh AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(substr(text,1,200))-4, 1)),
               i -> substr(substr(text,1,200), i, 5))) AS shingles
        FROM documents), LATERAL (SELECT unnest(shingles) AS s)
    ), seeds AS (SELECT unnest(generate_series(0, 7)) AS seed
    ), minh AS (
      SELECT doc_id, seed, MIN(substr(md5(s), 1 + 3 * seed, 8)) AS mh
      FROM sh, seeds GROUP BY doc_id, seed
    ), bands AS (
      SELECT doc_id, seed // 2 AS band, md5(string_agg(mh, ',' ORDER BY seed)) AS digest
      FROM minh GROUP BY doc_id, seed // 2
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id
    )
"""


@register(
    "q11_minhash_lsh_candidates",
    oracle=_MINHASH_ORACLE_CTE + "SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b",
)
def q11_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(
        docs, num_hashes=8, bands=4, shingle_size=5, max_chars=200
    ).orderBy("id_a", "id_b")


@register(
    "q12_minhash_verified_pairs",
    oracle=_MINHASH_ORACLE_CTE
    + """
    , toks AS (
      SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents
    )
    SELECT p.id_a, p.id_b,
           ROUND(len(list_intersect(ta.t, tb.t))::DOUBLE /
                 (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))), 6) AS jacc
    FROM pairs p JOIN toks ta ON p.id_a = ta.doc_id JOIN toks tb ON p.id_b = tb.doc_id
    WHERE len(list_intersect(ta.t, tb.t))::DOUBLE /
          (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def q12_minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    candidates = dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4, shingle_size=5, max_chars=200)
    return dedup.verify_jaccard_pairs(docs, candidates, threshold=0.5).orderBy("id_a", "id_b")


@register(
    "q13_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tok
      FROM documents
    ), bits AS (
      SELECT doc_id, j,
             CASE WHEN 2 * SUM(((strpos('0123456789abcdef', substr(md5(tok), (j // 4) + 1, 1)) - 1)
                                >> (3 - (j % 4))) & 1) - COUNT(*) > 0
                  THEN '1' ELSE '0' END AS b
      FROM toks, (SELECT unnest(generate_series(0, 31)) AS j)
      GROUP BY doc_id, j
    )
    SELECT doc_id, string_agg(b, '' ORDER BY j) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def q13_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", dedup.simhash_bits(F.col("text"), 32).alias("simhash")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "q14_ann_cosine_topk",
    oracle="""
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 5)
    WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def q14_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries, k=3)


@register(
    "q15_embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def q15_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(emb, threshold=0.4)


def _lsh_sig_sql(planes: int, dim: int, vec_expr: str = "e", plane_offset: int = 0) -> str:
    """DuckDB SQL recomputing ``similarity.lsh_signature`` exactly: the
    md5-derived hyperplane components are inlined as double literals (repr
    round-trips the identical IEEE double), and each projection is written as
    an explicit left-to-right sum ``0.0 + e[1]*c1 + e[2]*c2 + …`` — the same
    fold order as Spark's ``F.aggregate``, so the accumulated double (and
    therefore the sign test) is bit-identical across engines."""
    from kf_task_fhir_etl_spark.operators.similarity import _hyperplane

    bits = []
    for p in range(plane_offset, plane_offset + planes):
        comps = _hyperplane(p, dim)
        terms = " + ".join(f"{vec_expr}[{j + 1}]*({comps[j]!r})" for j in range(dim))
        bits.append(f"(CASE WHEN (0.0 + {terms}) > 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def _q16_oracle() -> str:
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), sig AS (
      SELECT vec_id, e, {_lsh_sig_sql(planes=8, dim=64)} AS sig FROM base
    )
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.e, c.e), 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.e, c.e) DESC, c.vec_id ASC) AS rank
      FROM sig q JOIN sig c ON q.sig = c.sig AND q.vec_id != c.vec_id
      WHERE q.vec_id < 5)
    WHERE rank <= 3
    ORDER BY query_id, rank
    """


@register("q16_ann_lsh_topk", oracle=_q16_oracle())
def q16_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k. Approximate relative to brute force,
    but fully DETERMINISTIC given the data (md5-derived hyperplanes, no RNG)
    — so the DuckDB oracle recomputes the identical signature buckets from
    the same inlined plane constants and the driver hash-checks the exact
    result (VERDICT r01 asked for a gate here; this is stronger than a
    recall bound)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_lsh_topk(emb, queries, dim=64, k=3, planes=8)


@register(
    "q36_ann_ivf_topk",
    oracle="""
    SELECT query_id, rank, neighbor_id, cosine FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 5)
    WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def q36_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN with every list probed (nprobe == nlist):
    the inverted-file machinery — deterministic seeding, Arrow-batched list
    assignment, probe join, in-list rerank — runs end-to-end, and the result
    is provably exact, so the brute-force SQL is a true oracle. Recall at
    nprobe < nlist is covered in tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_ivf_topk(emb, queries, nlist=8, nprobe=8, k=3)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_LANG_SCORE_SQL = """
      len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
          t -> list_contains({words}, t)))::DOUBLE
      / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1)
"""


def _lang_case_sql() -> str:
    """argmax over sorted languages, strictly-greater wins, all-zero → und."""
    from kf_task_fhir_etl_spark.operators.text import STOPWORDS

    scores = {}
    for lang in sorted(STOPWORDS):
        words = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
        scores[lang] = _LANG_SCORE_SQL.format(words=words)
    # emulate the fold: best = und/0; for lang in sorted: if s > best: best = lang
    expr = "'und'"
    best = "0.0"
    for lang in sorted(scores):
        s = scores[lang]
        expr = f"CASE WHEN ({s}) > ({best}) THEN '{lang}' ELSE ({expr}) END"
        best = f"greatest(({s}), ({best}))"
    return expr


@register(
    "q17_language_id",
    oracle=f"""
    SELECT lang_id, COUNT(*) AS n FROM (
      SELECT {_lang_case_sql()} AS lang_id FROM documents)
    GROUP BY lang_id ORDER BY lang_id
    """,
)
def q17_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.language_id_table(docs)
        .groupBy("lang_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_id")
    )


@register(
    "q18_quality_score",
    oracle="""
    SELECT source,
           ROUND(AVG(
             0.4 * least(len(text) / 500.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN len(text) > 0
                 THEN len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / len(text)
                 ELSE 0.0 END)
             + 0.3 * (len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> list_contains(['the','and','of','to','a','in','is','it'], t)))::DOUBLE
                      / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1))
           ), 4) AS avg_quality
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q18_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.round(F.avg(text.quality_score(F.col("text"))), 4).alias("avg_quality"))
        .orderBy("source")
    )


@register(
    "q19_token_stats",
    oracle="""
    SELECT source,
           CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(text)), 2) AS avg_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q19_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(text.token_count(F.col("text"))).alias("total_tokens"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


@register(
    "q20_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def q20_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Event-stream shapes (batch form; streaming equivalents in streaming/)
# ---------------------------------------------------------------------------


@register(
    "q21_window_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q21_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH:00").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour_bucket", "event_type")
    )


@register(
    "q22_sessionization",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000 OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
)
def q22_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # Compare µs-epoch differences, NOT cast('long') (which truncates to whole
    # seconds and misclassifies sub-second gaps straddling the 30-min boundary
    # — the oracle's epoch_us comparison is exact at the engines' shared µs
    # resolution).
    new_session = F.when(
        prev.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# As-of / range joins — custom operators Spark lacks natively, composed from
# built-ins (operators/asof.py). DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------


@register(
    "q28_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), signups AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
           CAST(FLOOR(epoch(s.ts)) AS BIGINT) AS signup_epoch,
           ROUND(s.value, 2) AS signup_value
    FROM purchases p
    ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY purchase_id
    """,
)
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    joined = asof.asof_join(purchases, signups, key="user_id", ts_col="ts", right_payload=["value"])
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("long").alias("purchase_epoch"),
        F.col("ts_asof").cast("long").alias("signup_epoch"),
        F.round(F.col("value_asof"), 2).alias("signup_value"),
    ).orderBy("purchase_id")


@register(
    "q29_range_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS ts_epoch,
           (SELECT COUNT(*) FROM events e
            WHERE e.user_id = p.user_id
              AND e.ts <= p.ts AND e.ts > p.ts - INTERVAL 1 HOUR) AS n_in_range
    FROM purchases p
    ORDER BY user_id, ts_epoch
    """,
)
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    counted = asof.range_join_count(
        purchases, ev.select("user_id", "ts"), key="user_id", ts_col="ts", lookback_seconds=3600
    )
    return counted.select(
        "user_id", F.col("ts").cast("long").alias("ts_epoch"), "n_in_range"
    ).orderBy("user_id", "ts_epoch")


@register(
    "q37_stateful_user_totals_stream",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(COALESCE(SUM(value), 0), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q37_stateful_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming aggregate (``applyInPandasWithState``) run
    end-to-end: per-user cumulative (count, sum) state in update mode. The
    single-file source yields one microbatch, so each user's one emission IS
    its converged total — which the batch SQL aggregate oracles exactly.
    Multi-batch convergence is covered in tests/test_streaming.py."""
    from kf_task_fhir_etl_spark.streaming.events import read_events_stream, run_stream_to_memory
    from kf_task_fhir_etl_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(read_events_stream(spark, sf_dir))
    run_stream_to_memory(stream, "q37_totals_mem", output_mode="update")
    return spark.table("q37_totals_mem").orderBy("user_id")


_QUALITY_SQL = """
      0.4 * least(len(text) / 500.0, 1.0)
      + 0.3 * (1.0 - CASE WHEN len(text) > 0
          THEN len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / len(text)
          ELSE 0.0 END)
      + 0.3 * (len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                t -> list_contains(['the','and','of','to','a','in','is','it'], t)))::DOUBLE
               / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1))
"""


def _q38_oracle() -> str:
    return f"""
    WITH surv AS (
      SELECT * FROM documents
      WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    ), scored AS (
      SELECT source,
             {_lang_case_sql()} AS lang_id,
             ({_QUALITY_SQL}) AS q,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks
      FROM surv
    )
    SELECT source, lang_id, COUNT(*) AS n_docs,
           ROUND(AVG(q), 4) AS avg_quality, CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM scored
    WHERE lang_id != 'und' AND q >= 0.5
    GROUP BY source, lang_id
    ORDER BY source, lang_id
    """


@register("q38_corpus_prep_pipeline", oracle=_q38_oracle())
def q38_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators composed as a real training-corpus preparation job:
    exact dedup → language ID → language + quality filtering → per-(source,
    language) corpus stats — one lazy DAG, so Catalyst prunes columns through
    the whole chain and the dedup/langid shuffles pipeline into the final
    aggregate without materialization."""
    docs = load_table(spark, sf_dir, "documents")
    surv = dedup.exact_dedup(docs, ["text"], "doc_id")
    langs = text.language_id_table(surv)
    scored = (
        surv.join(langs, surv["doc_id"] == langs["id"])
        .withColumn("q", text.quality_score(F.col("text")))
        .filter((F.col("lang_id") != "und") & (F.col("q") >= 0.5))
    )
    return (
        scored.groupBy("source", "lang_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.sum(text.token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("source", "lang_id")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing gates (SURVEY has no counterpart; task-brief extension).
# A media table is fabricated deterministically from `documents` in BOTH
# engines (content = UTF-8 bytes of text), so the binary→mapInPandas→feature
# path in operators/multimodal.py is held to an exact DuckDB oracle: the md5
# stub decoder's byte values reproduce in SQL via hex-nibble arithmetic.
# ---------------------------------------------------------------------------

_MEDIA_CTE = """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             text,
             CASE WHEN doc_id % 3 = 0 THEN (doc_id % 16) * 64 + 64 END AS width,
             CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9) * 64 + 64 END AS height,
             CASE WHEN doc_id % 3 <> 0 THEN (doc_id % 7) * 1000 + 1000 END AS duration_ms
      FROM documents
    )
"""


def _media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table over `documents`: payload = UTF-8 bytes of
    the text, kind round-robined by id, typed metadata struct per kind.
    Mirrors `_MEDIA_CTE` exactly so oracles can recompute every value."""
    d = F.col("doc_id")
    return docs.select(
        d.alias("media_id"),
        F.when(d % 3 == 0, F.lit("image")).when(d % 3 == 1, F.lit("audio")).otherwise(F.lit("video")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.when(d % 3 == 0, ((d % 16) * 64 + 64).cast("int")).alias("width"),
            F.when(d % 3 == 0, ((d % 9) * 64 + 64).cast("int")).alias("height"),
            F.when(d % 3 != 0, ((d % 7) * 1000 + 1000).cast("int")).alias("duration_ms"),
        ).alias("meta"),
    )


def _hex_byte_sql(h: str, i: int) -> str:
    """SQL for byte i of the hex digest column ``h`` (0-based)."""
    return (
        f"(strpos('0123456789abcdef', substr({h}, {2 * i + 1}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr({h}, {2 * i + 2}, 1)) - 1"
    )


@register(
    "q39_multimodal_features",
    oracle=_MEDIA_CTE
    + ", feat AS (SELECT media_id, kind, md5(text) AS h, octet_length(encode(text)) AS n_bytes FROM m)\n"
    + "SELECT media_id, kind, n_bytes, "
    + ", ".join(f"{_hex_byte_sql('h', i)} AS b{i}" for i in range(8))
    + "\nFROM feat ORDER BY media_id",
)
def q39_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched mapInPandas feature extraction
    (multimodal.extract_features). Features are emitted as their raw md5
    byte values (feature*255 rounded) so the comparison is integer-exact."""
    from kf_task_fhir_etl_spark.operators import multimodal

    media = _media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        *[F.round(F.col("feature")[i] * 255, 0).cast("long").alias(f"b{i}") for i in range(8)],
    ).orderBy("media_id")


@register(
    "q40_multimodal_frame_sample",
    oracle=_MEDIA_CTE
    + """
    SELECT media_id, kind, unnest(
             CASE WHEN kind = 'video' AND duration_ms IS NOT NULL
                  THEN generate_series(0, duration_ms, 1000)
                  ELSE [0] END) AS ts_ms
    FROM m ORDER BY media_id, ts_ms
    """,
)
def q40_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp
    (multimodal.frame_sample), non-video rows pass through at ts 0."""
    from kf_task_fhir_etl_spark.operators import multimodal

    media = _media_from_documents(load_table(spark, sf_dir, "documents"))
    return (
        multimodal.frame_sample(media, every_ms=1000)
        .select("media_id", "kind", F.col("ts_ms").cast("long").alias("ts_ms"))
        .orderBy("media_id", "ts_ms")
    )


@register(
    "q41_multimodal_metadata_stats",
    oracle=_MEDIA_CTE
    + """
    SELECT kind, COUNT(*) AS n, ROUND(AVG(width), 6) AS avg_width,
           ROUND(AVG(duration_ms), 6) AS avg_duration_ms
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def q41_multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over the media table — the plan must prune the
    binary column from the scan (asserted in
    tests/test_skew.py::test_multimodal_metadata_scan_prunes_binary)."""
    from kf_task_fhir_etl_spark.operators import multimodal

    media = _media_from_documents(load_table(spark, sf_dir, "documents"))
    stats = multimodal.metadata_stats(media)
    return stats.select(
        "kind",
        "n",
        F.round("avg_width", 6).alias("avg_width"),
        F.round("avg_duration_ms", 6).alias("avg_duration_ms"),
    )


# ---------------------------------------------------------------------------
# Window frames, semi-structured extraction, and lateral explode (general
# OLAP widening; SURVEY.md §2.6/§2.7 record no reference counterpart).
# ---------------------------------------------------------------------------


@register(
    "q50_window_frames",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3
    FROM events ORDER BY user_id, event_id
    """,
)
def q50_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame window aggregates: per-user running total and 3-row moving
    sum. One shuffle on user_id serves BOTH windows (identical
    partitioning+ordering collapses them into a single Window node over one
    sort). The frame is ROWS, not RANGE, and the sort is tie-broken by
    event_id — with duplicate timestamps a RANGE frame or an untied sort
    would make running values engine-dependent. The sliding aggregate is a
    SUM, not an AVG: the inputs are 2-decimal values, so a short-window mean
    lands exactly on the ROUND half-boundary (x.xx5) where the engines'
    nearest doubles disagree — sums of 2-decimal values have no such
    boundary (memory: spark-duckdb-oracle-parity). Running aggregates are a
    sequential scan within each partition; the scale lever is the user_id
    partition count, never the frame itself."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 2).alias("moving_sum3"),
    ).orderBy("user_id", "event_id")


@register(
    "q51_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 10
    GROUP BY event_type ORDER BY event_type
    """,
)
def q51_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed value out of a JSON string
    column, filter on it, aggregate. ``get_json_object`` stays JVM-side
    (Jackson; inside whole-stage codegen) — no Python round-trip for JSON
    work. At scale the right fix is upstream: parse once with ``from_json``
    into a struct column and let Parquet store it columnar; this query gates
    the raw-string path used before that materialization."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q52_word_explode_topk",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word LIMIT 25
    """,
)
def q52_word_explode_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (flatten) → aggregate → top-N: the word-count shape.
    ``explode`` runs inside codegen (Generate node) — rows fan out map-side
    and partially aggregate BEFORE the shuffle, so the exchange carries one
    row per (partition, word), not one per token occurrence. The literal
    single-space split is shared with the oracle (Spark's ``split`` takes a
    regex; a bare space means the same thing in both engines). Top-25 is
    TakeOrderedAndProject, tie-broken by word."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(25)
    )


@register(
    "q53_time_bucket_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket_hour,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY bucket_hour, event_type
    ORDER BY bucket_hour, event_type
    """,
)
def q53_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: truncate event time to the
    hour and aggregate per (bucket, type). ``date_trunc`` is a codegen scalar —
    time bucketing never needs a UDF or a join against a calendar table. The
    bucket is emitted as a formatted STRING, not a timestamp, because raw
    timestamp hashing diverges between engines (µs vs ns rendering). At scale
    this is THE pattern for time-series downsampling: the shuffle key
    (bucket, type) has bounded cardinality (hours × types), partial
    aggregation collapses each map partition to a few thousand rows
    regardless of input size, and the rollup output can itself be stored and
    re-rolled to coarser grains (hour → day → month) without touching raw
    events. The session timezone is pinned UTC (session.py) so both engines
    truncate identically."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return (
        ev.groupBy(bucket.alias("bucket_hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("bucket_hour", "event_type")
    )


@register(
    "q54_star_broadcast_join",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 15 AND s.s_acctbal > 0
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q54_star_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema fact-to-dims join: lineitem (fact) against part and
    supplier (dims), both explicitly broadcast. This is the canonical 100 TB
    join shape — the fact table NEVER shuffles: each of its partitions
    hash-probes two replicated dim tables map-side, so the only exchange in
    the plan is the final small aggregation on p_brand. The dim filters
    (p_size, s_acctbal) are pushed into the parquet scans (PushedFilters)
    and shrink the broadcast payload before it ships. Contrast with q02/q23:
    FULL OUTER joins cannot broadcast (both sides must stream), which is why
    the parity cascade is sort-merge while this inner star is broadcast-hash.
    The plan shape is asserted in tests/test_partitioning.py."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


@register(
    "q55_decorrelated_avg_qty",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size <= 10
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q55_decorrelated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a correlated scalar subquery (per-part average
    quantity threshold) decorrelated by hand into the plan Catalyst would
    also pick — and that a 100 TB run needs: broadcast the filtered part
    keys FIRST so the per-key average aggregates only matching lineitem
    rows (a tiny fraction of the fact table), then self-join the threshold
    back on the same key. The threshold aggregate and the final probe share
    the l_partkey partitioning, so the second join adds no exchange on the
    already-shuffled side. The naive form — aggregate ALL parts, then
    filter — shuffles the full fact table twice; restricting before
    aggregating is the decorrelation payoff."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    matched = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = matched.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        matched.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q56_regional_revenue_chain",
    oracle="""
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q56_regional_revenue_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation through a six-table chain with the
    non-tree predicate c_nationkey = s_nationkey. Join order matters at
    scale and is declared accordingly: region→nation→supplier are pure dims
    (broadcast, fact side never shuffles for them), customer⋈orders and
    orders⋈lineitem are the two real fact shuffles, and the c_nationkey =
    s_nationkey equality rides along as a post-broadcast filter rather than
    forcing a customer×supplier shuffle pair. The region filter cuts the
    nation/supplier broadcast payload before it ships. Catalyst + AQE pick
    broadcast-hash for every dim edge automatically (asserted in
    tests/test_partitioning.py for the star shape)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# Minimum rows per group for q57's ±0.005 rank band to be wider than GK's
# ±1-rank data-value slack (see the gate docstring); smaller groups RAISE.
_GK_MIN_GROUP = 400


@register(
    "q57_approx_sketches",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS users_within_bound,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99,
           TRUE AS quantiles_within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q57_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregation: HyperLogLog++ distinct-count and the
    Greenwald-Khanna quantile sketch over events, per event_type. These are
    THE 100 TB cardinality/quantile tools: both sketches are fixed-size,
    mergeable state, so the aggregation is one map-side pass producing a
    few KB per partition and a trivially small final merge — no shuffle of
    raw values, no sort, unlike exact COUNT(DISTINCT) (which Expands rows)
    or exact percentiles (which collect per-group arrays, q47). rsd=0.01
    bounds HLL error at ~1%; accuracy=10000 bounds quantile rank error at
    1e-4.

    Sketch values themselves are implementation-defined (Spark HLL++ vs
    DuckDB HLL differ by design), so the raw estimates can never be
    cross-engine columns — but the CONTRACT each sketch makes is
    deterministic, and that is what this gate hash-checks (the r03 verdict
    pattern replacing the old rows-only check): alongside the exact
    answers (computed relationally, oracle-reproducible) the query emits
    ``users_within_bound`` = |HLL estimate − exact| ≤ max(5·rsd·exact, 5)
    and ``quantiles_within_bound`` = each GK estimate lies between the
    exact quantiles at rank q ∓ 0.005 (50× the 1/accuracy rank guarantee,
    and ≥ the ±1-rank slack from GK returning a data value where the band
    edges interpolate — so the band needs n ≳ 400 per group to be
    non-degenerate; the driver's sf0.01/sf0.1 groups are 2k-20k rows).
    A silently broken sketch
    call (wrong column, wrong rsd, a regression returning garbage) flips a
    boolean and fails the value hash — the failure mode the rows-only
    check could not see. The bands are 5-20× the published error bounds,
    so a correct sketch can never flip one by chance.

    Degeneracy guard (VERDICT r04 optional #8): the band edges are literal
    percentile probabilities (Spark requires them foldable), so the band
    cannot scale with group size — instead the gate ASSERTS every group has
    ≥ ``_GK_MIN_GROUP`` non-null values (the quantity the percentiles
    actually see) and raises on a smaller corpus, rather than
    emitting a within-bound boolean that could be false for a CORRECT
    sketch (pytest pins the raise on a 100-row group)."""
    ev = load_table(spark, sf_dir, "events")
    qa = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    # exact quantiles at the targets and at the band edges (rank slack
    # 0.005); percentile() is Spark's exact interpolated quantile — the
    # same definition as DuckDB's quantile_cont
    qe = F.percentile("value", F.array(*[F.lit(p) for p in
        [0.5, 0.9, 0.99, 0.495, 0.505, 0.895, 0.905, 0.985, 0.995]]))
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__hll"),
        qa.alias("__gk"),
        qe.alias("__ex"),
        # count NON-NULL values, not rows: the percentile band this guards
        # ignores nulls, so a 500-row group with 100 non-null values would
        # pass a row count yet still be band-degenerate (r06 review)
        F.count("value").alias("__n"),
    )
    in_band = lambda est, lo, hi: est.between(lo, hi)  # noqa: E731
    big_enough = F.assert_true(
        F.col("__n") >= _GK_MIN_GROUP,
        F.concat(
            F.lit("q57 GK band degenerate: group needs >= "),
            F.lit(str(_GK_MIN_GROUP)),
            F.lit(" rows for the ±0.005 rank band, got "),
            F.col("__n"),
        ),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("__hll") - F.col("exact_users"))
            <= F.greatest(F.ceil(F.col("exact_users") * 0.05), F.lit(5))
        ).alias("users_within_bound"),
        F.round(F.col("__ex").getItem(0), 6).alias("p50"),
        F.round(F.col("__ex").getItem(1), 6).alias("p90"),
        F.round(F.col("__ex").getItem(2), 6).alias("p99"),
        # assert_true evaluates per row (NULL when the guard holds, raises
        # otherwise) — fused into the boolean so the guard cannot be
        # optimized away
        F.when(
            big_enough.isNull(),
            in_band(F.col("__gk").getItem(0), F.col("__ex").getItem(3), F.col("__ex").getItem(4))
            & in_band(F.col("__gk").getItem(1), F.col("__ex").getItem(5), F.col("__ex").getItem(6))
            & in_band(F.col("__gk").getItem(2), F.col("__ex").getItem(7), F.col("__ex").getItem(8)),
        ).alias("quantiles_within_bound"),
    ).orderBy("event_type")


@register(
    "q58_embedding_centroids",
    oracle="""
    SELECT label, dim - 1 AS dim, ROUND(AVG(val), 4) + 0.0 AS centroid
    FROM (SELECT label, UNNEST(embedding) AS val,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    ORDER BY label, dim
    """,
)
def q58_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the reduce step of
    k-means / IVF training and of class-prototype computation, expressed
    relationally: posexplode the vector to (label, dim, val) rows, then one
    groupBy(label, dim) average. posexplode is a codegen Generate node (not
    a UDF), and the shuffle key (label × dim) has tiny bounded cardinality,
    so map-side partial aggregation collapses each partition to
    |labels|·|dims| rows no matter how many vectors it holds — the classic
    sum/count vector-mean at 100 TB. Contrast operators/similarity.py's
    IVF trainer, which does the same mean in numpy per Arrow batch; this is
    the pure-DataFrame form the optimizer can see through. The float→double
    cast happens before averaging in both engines (embedding is float32 on
    disk; DuckDB AVG promotes identically), and 4dp rounding absorbs
    summation-order drift."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg((F.round(F.avg(F.col("val").cast("double")), 4) + F.lit(0.0)).alias("centroid"))
        .orderBy("label", "dim")
    )


@register(
    "q59_stream_stream_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs,
           ROUND(SUM(b.value), 2) AS attributed_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
)
def q59_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join run end-to-end: clicks joined to the same
    user's purchases within one hour (the attribution-window shape), via two
    watermarked file-source streams and a range-bounded inner join
    (streaming/events.py::click_purchase_interval_join). The single-file
    source yields one microbatch, so the joined rows landed in the memory
    sink are the complete pair set — which the batch self-join oracle
    recomputes exactly; the per-user aggregation of the sink table is batch.
    Multi-batch behavior (state retention across triggers) is covered in
    tests/test_streaming.py."""
    from kf_task_fhir_etl_spark.streaming.events import (
        click_purchase_interval_join,
        read_events_stream,
        run_stream_to_memory,
    )

    ev = read_events_stream(spark, sf_dir)
    joined = click_purchase_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    run_stream_to_memory(joined, "q59_pairs_mem", output_mode="append")
    return (
        spark.table("q59_pairs_mem")
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("purchase_value"), 2).alias("attributed_value"),
        )
        .orderBy("user_id")
    )


@register(
    "q60_train_test_split",
    oracle="""
    SELECT split, source, COUNT(*) AS n_docs FROM (
      SELECT source,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 65536 < 52428
                  THEN 'train' ELSE 'test' END AS split
      FROM documents)
    GROUP BY split, source
    ORDER BY split, source
    """,
)
def q60_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test split (80/20) counted per split ×
    source — operators/sampling.py::deterministic_split. The assignment is a
    pure map-side function of doc_id (md5 → 16-bit bucket < threshold): no
    RNG, no shuffle, stable under retries and incremental ingest, unlike
    randomSplit. The only exchange in the plan is the small counting
    aggregate. Both engines compute the identical bucket from the same md5
    prefix."""
    from kf_task_fhir_etl_spark.operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id", train_frac=0.8)
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "source")
    )


@register(
    "q61_source_quota_sample",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
      FROM documents)
    WHERE rn <= 50
    ORDER BY source, doc_id
    """,
)
def q61_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling: keep at most 50 docs per source, chosen in
    deterministic pseudo-random order (md5 of doc_id) —
    operators/sampling.py::quota_sample, the source-balancing primitive that
    caps any one domain's share of a corpus. One hash shuffle on source, one
    per-group window sort; the emitted id set is identical across engines
    because the order key is the portable md5, not an RNG."""
    from kf_task_fhir_etl_spark.operators.sampling import quota_sample

    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, "source", "doc_id", quota=50).select("source", "doc_id").orderBy(
        "source", "doc_id"
    )


@register(
    "q62_doc_chunking",
    oracle="""
    SELECT doc_id, start AS chunk_start, substr(text, start, 100) AS chunk
    FROM documents, LATERAL (
      SELECT unnest(generate_series(1, greatest(len(text), 1), 80)) AS start)
    ORDER BY doc_id, chunk_start
    """,
)
def q62_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking (100 chars, stride 80 → 20-char
    overlap) — operators/sampling.py::chunk_text, the context-window
    preparation step of an embedding/RAG pipeline. sequence + explode +
    substring are all codegen'd built-ins; the fan-out is purely map-side
    (zero shuffles in the whole plan — the orderBy here exists only for the
    deterministic gate). Every emitted chunk hash-matches DuckDB's
    generate_series/substr recomputation."""
    from kf_task_fhir_etl_spark.operators.sampling import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    return chunk_text(docs, "text", size=100, stride=80).select(
        "doc_id", "chunk_start", "chunk"
    ).orderBy("doc_id", "chunk_start")


@register(
    "q63_dup_clusters",
    oracle=_MINHASH_ORACLE_CTE
    + """
    , sym AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs)
    , reach AS (
      WITH RECURSIVE r(node, x) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.node, s.b FROM r JOIN sym s ON r.x = s.a
      ) SELECT * FROM r)
    SELECT node AS doc_id, MIN(x) AS component FROM reach
    GROUP BY node ORDER BY doc_id
    """,
)
def q63_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: MinHash-LSH candidate pairs become an
    undirected graph, and iterative min-label propagation
    (operators/dedup.py::connected_components) resolves each document's
    component — the real deliverable of corpus dedup, where transitively
    linked docs (A~B, B~C, but A!~C) must still land in ONE cluster before
    picking a representative per cluster. Pair-at-a-time dedup (q12) cannot
    express this; it needs iteration, which the engine drives as a driver
    loop of shuffle-reusing joins with per-round lineage checkpoints. The
    DuckDB oracle recomputes the same components via a recursive-CTE
    transitive closure — exact agreement required on every doc's component
    id (min reachable doc_id). Singletons keep their own id."""
    docs = load_table(spark, sf_dir, "documents")
    candidates = dedup.minhash_lsh_candidates(
        docs, num_hashes=8, bands=4, shingle_size=5, max_chars=200
    )
    return dedup.connected_components(
        docs.select(F.col("doc_id").alias("node")), candidates, node_col="node"
    ).select(F.col("node").alias("doc_id"), "component").orderBy("doc_id")


def _q66_oracle() -> str:
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), sig AS (
      SELECT vec_id, e, {_lsh_sig_sql(planes=3, dim=64)} AS sig FROM base
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
    FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4
    ORDER BY id_a, id_b
    """


@register("q66_embedding_neardup_lsh", oracle=_q66_oracle())
def q66_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale near-dup path promised by q15's docstring: LSH
    signature bucketing wraps the exact block kernel, so the only shuffle is
    the signature hash-partition and each bucket verifies locally
    (operators/similarity.py::embedding_neardup_lsh). Approximate by design
    (cross-bucket pairs are missed) but deterministic — the oracle recomputes
    the identical signatures from the inlined hyperplane constants, so the
    result is hash-checked exactly, and q15 remains the exact-pair gate.
    planes=3 keeps the gate non-trivial at sf0.01 (10 surviving pairs;
    8 planes leaves 0 — every bucket a singleton)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_lsh(emb, threshold=0.4, dim=64, planes=3)


@register(
    "q67_bpe_token_budget",
    oracle=r"""
    SELECT source,
           CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(regexp_extract_all(trim(text),
                         '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) END) AS BIGINT) AS bpe_tokens,
           CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS ws_tokens
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q67_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token budgeting next to whitespace counts — the
    corpus-costing pass of a training pipeline (subword tokens ≈ what a
    model actually consumes; whitespace words undercount ~1.3-4×).
    ``regexp_count`` runs the greedy ASCII pattern inside codegen; the
    pattern uses only constructs Java regex and RE2 interpret identically,
    so DuckDB's ``regexp_extract_all`` length is an exact oracle. Pure
    map-side scan + one tiny aggregate shuffle — the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(text.regex_token_count(F.col("text"))).alias("bpe_tokens"),
            F.sum(text.token_count(F.col("text"))).alias("ws_tokens"),
        )
        .orderBy("source")
    )


@register(
    "q68_rolling_fingerprints",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                        '\s+', ' ', 'g')), 1, 512) AS t
      FROM documents
    ), wins AS (
      SELECT doc_id, md5(substr(t, (i - 1) * 16 + 1, 32)) AS fp
      FROM norm, LATERAL (
        SELECT unnest(generate_series(1,
                 greatest(floor((len(t) - 32) / 16.0 + 1), 1)::INT)) AS i)
    )
    SELECT DISTINCT doc_id, fp FROM wins ORDER BY doc_id, fp
    """,
)
def q68_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling fingerprints (operators/text.py::
    rolling_fingerprints): md5 over 32-char windows of the normalized text
    at stride 16 — the partial-overlap detection primitive (two documents
    sharing any window hash share a 32-char run). Runs the codegen'd
    explode form (``rolling_fingerprint_rows``; the interpreted array form
    measured ~5× slower at sf0.1); the only shuffles are the per-doc
    distinct and the gate's orderBy. The oracle recomputes every window
    hash via generate_series/substr; the floor() mirrors Spark's
    double→int truncation on the window count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.rolling_fingerprint_rows(docs, window=32, stride=16, max_chars=512)
        .select(F.col("id").alias("doc_id"), "fp")
        .orderBy("doc_id", "fp")
    )


@register(
    "q69_stratified_sample",
    oracle="""
    WITH sampled AS (
      SELECT source, doc_id FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 65536 <
            CASE source
              WHEN 'src0' THEN 65536
              WHEN 'src1' THEN 32768
              WHEN 'src2' THEN 16384
              ELSE 6553 END
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS first_kept
    FROM sampled GROUP BY source ORDER BY source
    """,
)
def q69_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum FRACTIONAL sampling
    (operators/sampling.py::stratified_sample) — ``sampleBy`` with the RNG
    removed: keep iff md5-bucket(key) < frac·2¹⁶, so the kept set is a pure
    function of the key (retry/ingest-stable) and smaller fractions are
    SUBSETS of larger ones (thresholds nest — re-mixing a corpus never
    swaps documents). Zero shuffles in the sampling itself; the oracle
    recomputes the identical bucket arithmetic. src0 keeps all, src1 half,
    src2 a quarter, everything else 10%."""
    from kf_task_fhir_etl_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs,
        "source",
        "doc_id",
        fractions={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_frac=0.1,
    )
    return (
        sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("first_kept"))
        .orderBy("source")
    )


@register(
    "q70_incremental_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q70_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance run end-to-end
    (operators/rollup.py): the events table arrives as two arbitrary
    batches, each is rolled up to the hour INDEPENDENTLY, the increments
    are MERGED (counts/sums add, HLL user sketches union — the mergeable
    replacement for non-mergeable COUNT DISTINCT), and the merged hourly
    rollup is re-rolled to day grain WITHOUT touching raw events. The
    oracle aggregates the raw table directly at day grain — exact agreement
    proves merge+reroll ≡ recompute, which is the invariant that lets a
    100 TB deployment maintain rollups incrementally forever. Sketch
    estimates are pytest-gated (test_operators.py), not hashed — they are
    approximate by contract."""
    from kf_task_fhir_etl_spark.operators import rollup

    ev = load_table(spark, sf_dir, "events")
    batch_a = ev.filter(F.col("event_id") % 2 == 0)
    batch_b = ev.filter(F.col("event_id") % 2 != 0)
    merged_hourly = rollup.merge_rollups(
        rollup.time_bucket_rollup(batch_a, "hour"),
        rollup.time_bucket_rollup(batch_b, "hour"),
    )
    daily = rollup.reroll_to_grain(merged_hourly, "day")
    return daily.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("bucket_day"),
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    ).orderBy("bucket_day", "event_type")


@register(
    "q71_sequence_packing",
    oracle=r"""
    WITH toks AS (
      SELECT source, doc_id,
             CASE WHEN len(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
      FROM toks)
    SELECT source, CAST(cum_excl // 512 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
           CAST(MIN(cum_excl % 512) AS BIGINT) AS first_offset
    FROM packed
    GROUP BY source, seq_id
    ORDER BY source, seq_id
    """,
)
def q71_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing (operators/sampling.py::pack_sequences):
    documents fill fixed 512-token sequences contiguously per source, in
    deterministic doc_id order — the batch-construction step between
    tokenization and training. One cumulative-sum window per source (single
    hash shuffle + per-group sort); the oracle recomputes the identical
    exclusive cumsum/floor arithmetic with SQL window frames, so every
    sequence boundary is hash-checked."""
    from kf_task_fhir_etl_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.withColumn("n_tok", text.token_count(F.col("text")))
    packed = pack_sequences(
        with_tokens, budget=512, group_col="source", order_col="doc_id", token_col="n_tok"
    )
    return (
        packed.groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
            F.min("seq_offset").alias("first_offset"),
        )
        .orderBy("source", "seq_id")
    )


def _q72_oracle() -> str:
    return (
        _MINHASH_ORACLE_CTE
        + f"""
    , sym AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs)
    , reach AS (
      WITH RECURSIVE r(node, x) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.node, s.b FROM r JOIN sym s ON r.x = s.a
      ) SELECT * FROM r)
    , comp AS (SELECT node AS doc_id, MIN(x) AS component FROM reach GROUP BY node)
    , scored AS (
      SELECT c.component, d.doc_id, ({_QUALITY_SQL}) AS q
      FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
    SELECT component, doc_id AS best_doc, n_docs FROM (
      SELECT component, doc_id, q,
             ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_docs
      FROM scored)
    WHERE rn = 1
    ORDER BY component
    """
    )


@register(
    "q73_salted_skew_join",
    oracle="""
    WITH hot AS (
      SELECT event_id, value,
             CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS k
      FROM events
    ), dim AS (
      SELECT DISTINCT k, 'g' || (k % 5) AS label FROM hot
    )
    SELECT d.label, COUNT(*) AS n, ROUND(SUM(h.value), 2) AS total_value
    FROM hot h JOIN dim d ON h.k = d.k
    GROUP BY d.label ORDER BY d.label
    """,
)
def q73_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew mitigation under the correctness gate: ~70% of events
    collapse onto one hot key, and the fact⋈dim equi-join runs through
    operators/skew.py::salted_join — the hot key's rows are spread across 8
    deterministic salt buckets (xxhash64 of the row's own event_id, no RNG)
    with the dim side replicated 8×, so no single task owns the hot key.
    The oracle is the PLAIN join: salting must be invisible in the result.
    This is the manual escape hatch for the skew AQE can't fix (broadcast-
    ineligible dims, hot keys in aggregations after the join)."""
    from kf_task_fhir_etl_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    hot = ev.select(
        "event_id",
        "value",
        F.when(F.col("user_id") % 10 < 7, F.lit(0)).otherwise(F.col("user_id")).alias("k"),
    )
    dim = hot.select("k").distinct().withColumn(
        "label", F.concat(F.lit("g"), (F.col("k") % 5).cast("string"))
    )
    return (
        salted_join(hot, dim, key="k", salt_from="event_id", buckets=8)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("label")
    )


@register("q72_canonical_docs", oracle=_q72_oracle())
def q72_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end deliverable of corpus dedup: duplicate CLUSTERS (q63's
    iterative connected components over MinHash-LSH candidates) reduced to
    one canonical representative each — the highest-quality member
    (q18's scoring formula), not an arbitrary min-id — plus the cluster
    size. Quality-based canonical selection is what production pipelines
    actually ship (keep the cleanest copy, drop the boilerplate mirrors);
    it composes components + scoring + one per-cluster window, all on the
    cluster key, so the selection adds exactly one shuffle beyond the
    clustering itself. The oracle recomputes components via recursive-CTE
    closure and the identical quality doubles."""
    docs = load_table(spark, sf_dir, "documents")
    candidates = dedup.minhash_lsh_candidates(
        docs, num_hashes=8, bands=4, shingle_size=5, max_chars=200
    )
    comp = dedup.connected_components(
        docs.select(F.col("doc_id").alias("node")), candidates, node_col="node"
    )
    scored = docs.join(comp, docs["doc_id"] == comp["node"]).withColumn(
        "q", text.quality_score(F.col("text"))
    )
    w = Window.partitionBy("component").orderBy(F.desc("q"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("best_doc"), "n_docs")
        .orderBy("component")
    )


def _q88_oracle() -> str:
    sig_cols = ", ".join(
        f"{_lsh_sig_sql(planes=3, dim=64, plane_offset=t * 3)} AS s{t}" for t in range(8)
    )
    any_collide = " OR ".join(f"a.s{t} = b.s{t}" for t in range(8))
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), exact_pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM base a JOIN base b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4
    ), sig AS (
      SELECT vec_id, e, {sig_cols} FROM base
    ), lsh_pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({any_collide})
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4
    ), hits AS (
      SELECT id_a, id_b FROM lsh_pairs INTERSECT SELECT id_a, id_b FROM exact_pairs
    )
    SELECT (SELECT COUNT(*) FROM exact_pairs) AS n_exact,
           (SELECT COUNT(*) FROM lsh_pairs) AS n_lsh,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           ROUND((SELECT COUNT(*) FROM hits)::DOUBLE
                 / (SELECT COUNT(*) FROM exact_pairs), 6) AS recall
    """


@register("q88_embedding_lsh_recall", oracle=_q88_oracle())
def q88_embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the scale-path near-dup operator (VERDICT r02 #6):
    the OR-amplified LSH pair set (8 tables x 3 planes,
    similarity.embedding_neardup_lsh) is scored against the exact block-pair
    ground truth (q15's operator) at threshold 0.4, emitting
    n_exact/n_lsh/n_hits/recall in ONE row. Everything is deterministic
    (md5 hyperplanes, no RNG), so the DuckDB oracle recomputes both pair
    sets from the same inlined plane constants and the driver hash-checks
    the recall VALUE, not just a bound — measured 0.915 at sf0.01
    (tables=1 gives 0.169; amplification behaves as (1-p^b)^L predicts).
    tests/test_operators.py asserts recall >= 0.8 as the documented floor.
    Scale shape: the recall join is candidate-bounded (pairs, not corpus);
    ground truth at 100 TB would come from a sampled stratum, but the
    operator composition is identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    # one FULL OUTER join of the two (deduplicated) pair sets yields all
    # three counts in a single pass — each heavy pipeline executes exactly
    # once in one job (separate count+semi-join consumers executed every
    # lineage twice; checkpointing instead serialized the pipelines into
    # sequential jobs and lost stage-level parallelism)
    exact = (
        similarity.embedding_neardup_pairs(emb, threshold=0.4)
        .select("id_a", "id_b", F.lit(1).alias("e"))
    )
    lsh = (
        similarity.embedding_neardup_lsh(emb, threshold=0.4, dim=64, planes=3, tables=8)
        .select("id_a", "id_b", F.lit(1).alias("l"))
    )
    both = exact.join(lsh, ["id_a", "id_b"], "full_outer")
    # count(), not sum(when...): count of an empty relation is 0, matching
    # the oracle's scalar COUNT(*) subqueries when no pairs exist at all
    return both.agg(
        F.count(F.col("e")).alias("n_exact"),
        F.count(F.col("l")).alias("n_lsh"),
        F.count(F.when(F.col("e").isNotNull() & F.col("l").isNotNull(), 1)).alias("n_hits"),
    ).select(
        "n_exact",
        "n_lsh",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_exact"), 6).alias("recall"),
    )


_Q89_METRIC_SQL = r"""
    WITH w AS (
      SELECT source,
             CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\s+') END AS w
      FROM documents
    ), m AS (
      SELECT source,
             len(w) AS n_words,
             CASE WHEN len(w) > 0
                  THEN ROUND(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 6)
                  ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(w) > 0
                  THEN ROUND(len(list_distinct(w))::DOUBLE / len(w), 6)
                  ELSE 0.0 END AS distinct_word_ratio,
             CASE WHEN len(w) > 0
                  THEN ROUND(list_max(list_transform(list_distinct(w),
                       d -> len(list_filter(w, x -> x = d))))::DOUBLE / len(w), 6)
                  ELSE 0.0 END AS top_word_ratio,
             CASE WHEN len(w) >= 2
                  THEN ROUND(1.0 - len(list_distinct(list_transform(range(1, len(w)),
                       i -> array_to_string(w[i:i+1], ' '))))::DOUBLE / (len(w) - 1), 6)
                  ELSE 0.0 END AS dup_bigram_ratio,
             CASE WHEN len(w) >= 3
                  THEN ROUND(1.0 - len(list_distinct(list_transform(range(1, len(w) - 1),
                       i -> array_to_string(w[i:i+2], ' '))))::DOUBLE / (len(w) - 2), 6)
                  ELSE 0.0 END AS dup_trigram_ratio
      FROM w)
"""


@register(
    "q89_quality_filter_funnel",
    oracle=_Q89_METRIC_SQL
    + """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_words BETWEEN 20 AND 100000
                          AND mean_word_len BETWEEN 2.0 AND 10.0
                          AND distinct_word_ratio >= 0.25
                          AND top_word_ratio <= 0.20
                          AND dup_trigram_ratio <= 0.30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(AVG(mean_word_len), 4) + 0.0 AS avg_word_len,
           ROUND(AVG(distinct_word_ratio), 4) + 0.0 AS avg_distinct_ratio,
           ROUND(AVG(top_word_ratio), 4) + 0.0 AS avg_top_word,
           ROUND(AVG(dup_bigram_ratio), 4) + 0.0 AS avg_dup_bigram,
           ROUND(AVG(dup_trigram_ratio), 4) + 0.0 AS avg_dup_trigram
    FROM m GROUP BY source ORDER BY source
    """,
)
def q89_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality gate (operators/filters.py): word-shape
    and repetition metrics (mean word length, distinct-word ratio, top-word
    dominance, duplicate bi/trigram fractions) feed a composite keep
    decision; the funnel reports per-source doc counts, kept counts, and
    metric means. Every metric is a codegen array expression evaluated per
    row — the whole filter stage is one projection with zero shuffle beyond
    the final per-source aggregate, exactly how a 100 TB filter pass should
    look (map-side decision, aggregate only for reporting). The DuckDB
    oracle recomputes each formula with list lambdas (same int-division and
    rounding), so keep decisions are hash-checked at the boundary values
    too."""
    from kf_task_fhir_etl_spark.operators import filters
    from kf_task_fhir_etl_spark.operators.parallelism import widen_for_cpu

    # widened (r13, guide §2.5): the per-doc quality metrics are CPU-dense
    # over a one-file scan; a no-op at scale, 32-way locally
    docs = widen_for_cpu(load_table(spark, sf_dir, "documents"))
    ann = filters.apply_quality_filters(docs)
    return (
        ann.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            (F.round(F.avg("mean_word_len"), 4) + 0.0).alias("avg_word_len"),
            (F.round(F.avg("distinct_word_ratio"), 4) + 0.0).alias("avg_distinct_ratio"),
            (F.round(F.avg("top_word_ratio"), 4) + 0.0).alias("avg_top_word"),
            (F.round(F.avg("dup_bigram_ratio"), 4) + 0.0).alias("avg_dup_bigram"),
            (F.round(F.avg("dup_trigram_ratio"), 4) + 0.0).alias("avg_dup_trigram"),
        )
        .orderBy("source")
    )


@register(
    "q90_contamination_screen",
    oracle=r"""
    WITH wdocs AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ), doc_grams AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(range(1, len(w) - 3),
                    i -> array_to_string(w[i:i+4], ' ')))) AS gram
      FROM wdocs WHERE len(w) >= 5
    ), eval_grams AS (
      SELECT DISTINCT UNNEST(list_distinct(list_transform(range(1, len(w[1:30]) - 3),
                    i -> array_to_string((w[1:30])[i:i+4], ' ')))) AS gram
      FROM wdocs WHERE doc_id % 50 = 0 AND len(w[1:30]) >= 5
    ), scored AS (
      SELECT d.doc_id,
             COUNT(*) AS total_ngrams,
             CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS contaminated_ngrams
      FROM doc_grams d LEFT JOIN eval_grams e ON d.gram = e.gram
      GROUP BY d.doc_id)
    SELECT doc_id, total_ngrams, contaminated_ngrams,
           ROUND(contaminated_ngrams::DOUBLE / total_ngrams, 6) AS contamination_ratio
    FROM scored
    WHERE ROUND(contaminated_ngrams::DOUBLE / total_ngrams, 6) >= 0.1
    ORDER BY contamination_ratio DESC, doc_id
    """,
)
def q90_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/filters.py::contamination_scores):
    an eval set is built as 30-word prefixes of every 50th document (the
    realistic leak: benchmarks quoting corpus passages), and every document
    is scored by the fraction of its distinct word 5-grams present in the
    eval n-gram set. Flags both the quoted sources themselves AND their
    transitive near-duplicates (e.g. a doc that merely copies a quoted doc)
    — the screen a pretraining pipeline runs before the tokenizer. Plan
    shape: explode to distinct (doc, xxhash64(gram)) rows, broadcast the
    eval gram set, left-semi mark, one groupBy(doc) — the only shuffle is
    the per-doc aggregate; the oracle joins the raw gram strings (hashing is
    a pure shuffle-width optimization, collision odds ~2⁻⁶⁴)."""
    from kf_task_fhir_etl_spark.operators import filters

    docs = load_table(spark, sf_dir, "documents")
    w = filters.words(F.col("text"))
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", F.array_join(F.slice(w, 1, 30), " ").alias("text")
    )
    scores = filters.contamination_scores(docs, eval_docs, n=5)
    return scores.filter(F.col("contamination_ratio") >= 0.1).orderBy(
        F.desc("contamination_ratio"), "doc_id"
    )


# ---------------------------------------------------------------------------
# q154 — incremental connected components (operators/graph_delta.py;
# VERDICT r09 Next #5 — IVM × iterative-graph: insert-only folds, deletes
# recompute only their touched components)
# ---------------------------------------------------------------------------


# the post-changelog recompute both q154 and q159 hash against — ONE oracle
# string, two maintenance surfaces (the q144/q152 precedent): same late
# inserts, same 10%-share deletes, same min-node-id labels
_Q154_CC_RECOMPUTE_SQL = """
    , new_edges AS (
      SELECT id_a, id_b FROM pairs
      WHERE (id_a % 7 = 3 OR id_b % 7 = 3) OR ((id_a + id_b) % 10 <> 0)
    ), nodes AS (
      SELECT doc_id FROM documents WHERE doc_id % 7 <> 3
      UNION
      SELECT id_a FROM pairs WHERE id_a % 7 = 3 OR id_b % 7 = 3
      UNION
      SELECT id_b FROM pairs WHERE id_a % 7 = 3 OR id_b % 7 = 3
    ), sym AS (
      SELECT id_a AS x, id_b AS y FROM new_edges
      UNION ALL SELECT id_b, id_a FROM new_edges
    ), reach AS (
      WITH RECURSIVE r(node, x) AS (
        SELECT doc_id, doc_id FROM nodes
        UNION
        SELECT r.node, s.y FROM r JOIN sym s ON r.x = s.x
      ) SELECT * FROM r)
    SELECT node AS doc_id, MIN(x) AS component FROM reach
    GROUP BY node ORDER BY doc_id
    """



def _cc_delta_scaffold(spark: SparkSession, sf_dir: str):
    """The (pairs, old-labeling, old-forest) inputs BOTH incremental-CC
    gates maintain from — "inputs a real pipeline has materialized" (the
    q154 cost-accounting note), now literally materialized: staged once
    per (sf, content fingerprint) as parquet and shared by q154 and q159,
    so the bench measures the MAINTENANCE work, not a per-gate rebuild of
    identical scaffolding. Parquet staging also resets Catalyst size
    stats at the storage boundary (the r11 SCALE.md autopsy), exactly as
    production state storage would. Returns (pairs, comps, forest)."""
    import os as _os

    from kf_task_fhir_etl_spark.catalog import staged_layout
    from kf_task_fhir_etl_spark.operators import graph_delta

    def build(tmp: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        pairs = dedup.minhash_lsh_candidates(
            docs, num_hashes=8, bands=4, shingle_size=5, max_chars=200
        ).localCheckpoint(eager=True)
        late = (F.col("id_a") % 7 == 3) | (F.col("id_b") % 7 == 3)
        old_edges = pairs.filter(~late)
        old_nodes = docs.filter(F.col("doc_id") % 7 != 3).select(
            F.col("doc_id").alias("node")
        )
        comps = dedup.connected_components(old_nodes, old_edges, node_col="node")
        forest = graph_delta.spanning_forest(
            old_nodes, old_edges, node_col="node", comps=comps
        )
        pairs.write.parquet(_os.path.join(tmp, "pairs"))
        comps.write.parquet(_os.path.join(tmp, "comps"))
        forest.write.parquet(_os.path.join(tmp, "forest"))
        from kf_task_fhir_etl_spark import etl

        etl.release_checkpoints([pairs, comps, forest])

    stage = staged_layout("ccdelta_scaffold", sf_dir, ["documents"], build)
    return (
        spark.read.parquet(_os.path.join(stage, "pairs")),
        spark.read.parquet(_os.path.join(stage, "comps")),
        spark.read.parquet(_os.path.join(stage, "forest")),
    )


@register(
    "q154_incremental_components",
    oracle=_MINHASH_ORACLE_CTE + _Q154_CC_RECOMPUTE_SQL,
)
def q154_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q63 dup-cluster labeling MAINTAINED through a signed edge
    changelog (operators/graph_delta.py::apply_components_delta) instead
    of recomputed: docs with doc_id % 7 = 3 arrive late — their candidate
    pairs are the INSERTS (new nodes included, exercising the singleton
    bootstrap) — while old pairs with (id_a + id_b) % 10 = 0 are DELETED
    (splitting clusters unless a surviving or inserted path re-bridges
    them; the 10% delete share keeps the touched-component recompute a
    real but bounded slice of the cluster graph). Inserts fold on the batch-sized component graph (broadcast
    remap, the labeling never reshuffled); deletes recompute ONLY their
    touched components from the post-changelog intra-component edge
    slice. The oracle recomputes components from scratch over the
    post-changelog graph by the q63 recursive-CTE transitive closure:
    incremental ≡ recompute, the IVM-family contract, on min-node-id
    labels exactly. (The candidate pairs and old labeling are inputs a
    real pipeline has materialized — staged once per content fingerprint
    as parquet and shared with q159 via ``_cc_delta_scaffold``, so the
    gate measures the maintenance work, not a scaffolding rebuild.)"""
    from kf_task_fhir_etl_spark.operators import graph_delta

    pairs, comps, _forest = _cc_delta_scaffold(spark, sf_dir)
    late = (F.col("id_a") % 7 == 3) | (F.col("id_b") % 7 == 3)
    old_edges = pairs.filter(~late)
    deleted = old_edges.filter((F.col("id_a") + F.col("id_b")) % 10 == 0)
    delta = (
        pairs.filter(late).withColumn("op", F.lit(1))
        .unionByName(deleted.withColumn("op", F.lit(-1)))
    )
    edges_new = pairs.filter(late | ((F.col("id_a") + F.col("id_b")) % 10 != 0))
    out = graph_delta.apply_components_delta(
        comps, edges_new, delta, node_col="node", comp_col="component"
    )
    return out.select(F.col("node").alias("doc_id"), "component").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q159 — forest-maintained incremental connected components
# (operators/graph_delta.py::apply_components_delta_forest; VERDICT r10
# Next #4 — the spanning-forest certificate SCALE.md named)
# ---------------------------------------------------------------------------


@register(
    "q159_incremental_components_forest",
    oracle=_MINHASH_ORACLE_CTE + _Q154_CC_RECOMPUTE_SQL,
)
def q159_incremental_components_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q154's changelog replayed through the SPANNING-FOREST-maintained
    labeling (apply_components_delta_forest): the stored state gains a
    forest (bootstrap: spanning_forest over the old graph — labels reused,
    one BFS — staged with the scaffold), and the delete
    path pays the bounded recompute ONLY for deletes that hit a TREE
    edge (state read from the shared ``_cc_delta_scaffold`` parquet
    staging, as a real pipeline would read its stored labeling+forest).
    Near-dup clusters are dense, so most of the 10%-share deletes
    are non-tree — certified no-ops by the forest, zero labeling I/O
    (the unit suite pins the zero-CC/zero-BFS claim with call counters;
    this gate pins the RESULT: labels hash-identical to q154's oracle,
    which is the literal from-scratch recompute of the post-changelog
    graph — one oracle string, two maintenance surfaces)."""
    from kf_task_fhir_etl_spark.operators import graph_delta

    pairs, comps, forest = _cc_delta_scaffold(spark, sf_dir)
    late = (F.col("id_a") % 7 == 3) | (F.col("id_b") % 7 == 3)
    old_edges = pairs.filter(~late)
    deleted = old_edges.filter((F.col("id_a") + F.col("id_b")) % 10 == 0)
    delta = (
        pairs.filter(late).withColumn("op", F.lit(1))
        .unionByName(deleted.withColumn("op", F.lit(-1)))
    )
    edges_new = pairs.filter(late | ((F.col("id_a") + F.col("id_b")) % 10 != 0))
    out, _forest2 = graph_delta.apply_components_delta_forest(
        comps, forest, edges_new, delta, node_col="node", comp_col="component"
    )
    return out.select(F.col("node").alias("doc_id"), "component").orderBy("doc_id")
