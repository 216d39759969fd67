"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Hash functions are md5-based (hex strings) so every stage is reproducible in
any engine — the DuckDB oracles in ``queries.py`` recompute the identical
signatures. At scale:

- **signatures are map-side**: one row in, one row out, no explode — the
  MinHash signature is ``transform(seeds, s → array_min(transform(shingles,
  sh → md5(s|sh))))`` evaluated inside codegen;
- **the only shuffle is the LSH bucket join** (hash-partition by band value),
  which is exactly the work LSH exists to bound;
- **verification joins are candidate-only**: exact Jaccard runs on the
  candidate pairs, never all O(n²) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(text: Column, k: int = 5, max_chars: int = 500) -> Column:
    """Distinct character k-grams of the first ``max_chars`` chars (bounding
    per-row work so a pathological 1 GB document can't stall an executor)."""
    t = F.substring(text, 1, max_chars)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    return F.array_distinct(grams)


def word_tokens(text: Column, distinct: bool = False) -> Column:
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.array_distinct(toks) if distinct else toks


def minhash_signature(text: Column, num_hashes: int = 8, shingle_size: int = 5, max_chars: int = 500) -> Column:
    """MinHash signature as an array of ``num_hashes`` md5-min strings.
    Entirely map-side; lexicographic min over md5 hex strings is a valid
    uniform min-hash family (seeded by prefixing the hash input).

    NOTE: higher-order functions are interpreted (not codegen'd) in Spark —
    for the hot path prefer ``minhash_signatures`` below, which computes the
    same family through codegen'd explode/groupBy (~10× faster)."""
    sh = char_shingles(text, shingle_size, max_chars)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(seed.cast("string"), F.lit("|"), s)))
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 5,
    max_chars: int = 500,
) -> DataFrame:
    """Codegen-friendly MinHash: one md5 per distinct shingle, ``num_hashes``
    hash functions derived as overlapping 8-hex-char (32-bit) slices of that
    digest, min-aggregated per document.

    Every stage is whole-stage-codegen'd (explode → md5 → partial-agg min):
    the map-side partial aggregation collapses each document's shingles to one
    row before the shuffle, so the shuffle is O(docs), not O(docs×shingles).
    This outruns the interpreted higher-order-function form ~10×.
    """
    if not 1 <= num_hashes <= 8:
        raise ValueError("num_hashes must be in [1, 8] (32 hex chars / stride 3)")
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), shingle_size, max_chars)).alias("s"),
    )
    hashed = sh.select("id", F.md5(F.col("s")).alias("h"))
    mins = [F.min(F.substring("h", 1 + 3 * i, 8)).alias(f"mh{i}") for i in range(num_hashes)]
    return hashed.groupBy("id").agg(*mins).select(
        "id", F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band digests: md5 over each contiguous signature slice. Docs sharing
    any band digest are candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.array_join(F.slice(signature, b * rows_per_band + 1, rows_per_band), ",")).alias("digest"),
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 5,
    max_chars: int = 500,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) that collide in ≥1 LSH band.

    Plan shape: scan → map-side signature/bands → explode bands →
    shuffle on (band, digest) → self-join inside buckets → distinct pairs.

    ``max_bucket``: optional hot-bucket cap for degenerate corpora (a bucket
    of b docs yields b²/2 pairs — on near-identical corpora one bucket can
    dominate the whole job). Buckets larger than the cap are dropped with the
    standard LSH argument that their members collide in other bands too.
    Off by default so results stay exactly reproducible by the SQL oracle.
    """
    rows_per_band = num_hashes // bands
    signatures = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size, max_chars)
    sig = signatures.select(
        "id",
        F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.digest").alias("digest"))
    if max_bucket is not None:
        small = (
            sig.groupBy("band", "digest")
            .count()
            .filter(F.col("count") <= max_bucket)
            .select("band", "digest")
        )
        sig = sig.join(small, on=["band", "digest"], how="left_semi")
    left = sig.alias("l")
    right = sig.alias("r")
    return (
        left.join(right, on=["band", "digest"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard(tokens_a: Column, tokens_b: Column) -> Column:
    """Exact Jaccard over two *distinct-token* arrays (column expression)."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b))
    union = F.size(tokens_a) + F.size(tokens_b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verify_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-Jaccard verification of candidate pairs via a broadcast
    token dictionary + Arrow-batched set intersection.

    The relational form (join token arrays onto 10⁵-10⁶ pairs twice, then
    ``array_intersect``) moves pairs × tokens through two shuffles; here the
    token sets ship once as a broadcast (O(docs)) and each partition verifies
    its pairs locally — the same broadcast-the-small-dimension pattern as the
    embedding near-dup kernel. Ceiling is the token dict size; past that,
    fall back to the join form restricted to the oversized ids."""
    rows = df.select(F.col(id_col).alias("id"), word_tokens(F.col(text_col), distinct=True).alias("t")).collect()
    token_sets = {r["id"]: frozenset(r["t"]) for r in rows}
    b_tokens = df.sparkSession.sparkContext.broadcast(token_sets)

    def verify(batches):
        import pandas as pd

        toks = b_tokens.value
        for pdf in batches:
            a_ids = pdf["id_a"].to_numpy()
            b_ids = pdf["id_b"].to_numpy()
            out_a, out_b, out_j = [], [], []
            for ida, idb in zip(a_ids, b_ids):
                ta, tb = toks.get(ida, frozenset()), toks.get(idb, frozenset())
                union = len(ta) + len(tb) - len(ta & tb)
                j = (len(ta & tb) / union) if union else 0.0
                if j >= threshold:
                    out_a.append(ida)
                    out_b.append(idb)
                    out_j.append(round(j, 6))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "jacc": out_j})

    return candidates.mapInPandas(verify, schema="id_a long, id_b long, jacc double")


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Near-duplicate removal: keep a document unless a candidate with a
    smaller id verifies at word-Jaccard ≥ threshold (greedy min-id survivor —
    the standard scalable approximation of connected-component dedup)."""
    candidates = minhash_lsh_candidates(df, id_col, text_col, **lsh_kwargs)
    toks = df.select(F.col(id_col).alias("id"), word_tokens(F.col(text_col), distinct=True).alias("toks"))
    verified = (
        candidates.join(toks.withColumnsRenamed({"id": "id_a", "toks": "toks_a"}), "id_a")
        .join(toks.withColumnsRenamed({"id": "id_b", "toks": "toks_b"}), "id_b")
        .filter(jaccard(F.col("toks_a"), F.col("toks_b")) >= threshold)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return df.join(verified, on=[df[id_col] == verified.dup_id], how="left_anti")


_HEX = "0123456789abcdef"


def _md5_bit(value: Column, j: int) -> Column:
    """Bit j (0-based, MSB-first per nibble) of md5(value) — portable across
    engines via hex-char arithmetic."""
    ch = F.substring(F.md5(value), j // 4 + 1, 1)
    nibble = F.conv(ch, 16, 10).cast("int")
    return F.shiftright(nibble, 3 - (j % 4)).bitwiseAND(F.lit(1))


def simhash_bits(text: Column, bits: int = 32) -> Column:
    """SimHash as a ``bits``-char '0'/'1' string: bit j is the sign of the
    sum over distinct tokens of (2·bit_j(md5(token)) − 1). Map-side only."""
    toks = word_tokens(text, distinct=True)
    bit_chars = [
        F.when(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + (_md5_bit(t, j) * 2 - 1)) > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return F.concat(*bit_chars)


def hamming(a: Column, b: Column, bits: int = 32) -> Column:
    """Hamming distance between two equal-length bit strings."""
    pairs = F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: (x != y).cast("int"))
    return F.aggregate(F.slice(pairs, 1, bits), F.lit(0), lambda acc, v: acc + v)


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the bit string (pigeonhole — any pair
    within ``max_hamming ≤ bands−1`` shares an exact band), bucket-join,
    verify full Hamming distance."""
    width = bits // bands
    sig = df.select(F.col(id_col).alias("id"), simhash_bits(F.col(text_col), bits).alias("sig"))
    band_rows = sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), F.substr("sig", b * width + 1, F.lit(width)).alias("chunk")),
            )
        ).alias("b"),
    ).select("id", "sig", F.col("b.band").alias("band"), F.col("b.chunk").alias("chunk"))
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    return (
        left.join(right, on=["band", "chunk"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), F.col("l.sig").alias("sig_a"), F.col("r.sig").alias("sig_b"))
        .distinct()
        .filter(hamming(F.col("sig_a"), F.col("sig_b"), bits) <= max_hamming)
        .select("id_a", "id_b")
    )


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: hash-group on content, survivor = min id. One shuffle,
    partial-aggregated map-side first."""
    content_hash = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]))
    w_df = df.withColumn("__h", content_hash)
    winners = w_df.groupBy("__h").agg(F.min(F.col(id_col)).alias(id_col))
    return df.join(winners, on=[id_col], how="left_semi")
