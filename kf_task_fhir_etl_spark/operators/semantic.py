"""Semantic (embedding-cluster-bounded) deduplication — the SemDeDup shape:
assign every embedding to its nearest prototype, then look for near-duplicate
pairs ONLY within a cluster, never across the whole corpus.

Why this is the 100 TB form: exact near-dup is O(n²) pairs; LSH
(operators/similarity.py) bounds candidates by hash buckets; SemDeDup bounds
them by semantic clusters instead — with K clusters of roughly n/K members,
the pair space shrinks by a factor of K while recall concentrates exactly
where semantic duplicates live (two near-identical documents embed next to
each other, hence into the same cluster). Cluster assignment is a broadcast
cross-join against a K×dim prototype table (kilobytes even at K=64k), and
the within-cluster kernel shuffles on the cluster key only. Clusters too
large for one kernel group split into block pairs INSIDE the operator —
``semantic_dedup_dropped(blocks>1, split_min=...)`` routes them through
``similarity.block_replicate`` (the q15 block-pair shape keyed by cluster)
while sub-threshold clusters keep the 1× single-group path.

Determinism/parity: prototypes are per-label mean vectors rounded to 4dp
(the q58-proven cross-engine reduction), cosines round to 6dp before every
comparison, and ties break on the smallest cluster id — so a DuckDB oracle
recomputes assignment AND the dropped set exactly, and re-runs/retries
never flip a decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators.similarity import as_double, cosine_udf


def label_prototypes(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, centroid) — the per-label mean vector, computed relationally:
    posexplode to (label, dim, val), one groupBy(label, dim) average
    (map-side partial sums collapse each partition to |labels|·|dims| rows),
    then re-assemble the vector with an order-pinned array_sort over
    (dim, val) structs. Component means round to 4dp so the oracle's AVG
    reproduces them bit-for-bit (q58's proven tolerance)."""
    per_dim = (
        emb.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("label", "dim")
        .agg((F.round(F.avg(F.col("val").cast("double")), 4) + F.lit(0.0)).alias("cavg"))
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cavg"))), lambda s: s["cavg"]
        ).alias("centroid")
    )


def kmeans_prototypes(
    emb: DataFrame,
    k: int = 4,
    iters: int = 1,
    round_digits: int | None = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, centroid) prototypes for UNLABELED corpora — the
    deterministic k-means trainer (``similarity.ivf_train_matrix``: md5
    seeds + Lloyd rounds, per-round 12dp rounding) reshaped into the
    prototype contract ``semantic_dedup_dropped(prototypes=...)`` expects.
    Real SemDeDup clusters unsupervised; ``label_prototypes`` is the
    shortcut when a label column already exists. The label is the int
    list_id, satisfying the integral-label contract by construction.
    Built from the trainer's driver-resident centroid matrix directly —
    no extra corpus scan, no long-form reassembly (the K×dim matrix is
    broadcast-sized state by design)."""
    from kf_task_fhir_etl_spark.operators.similarity import ivf_train_matrix

    cent_n = ivf_train_matrix(
        emb, nlist=k, iters=iters, round_digits=round_digits, id_col=id_col, vec_col=vec_col
    )
    rows = [(lid, [float(x) for x in cent_n[lid]]) for lid in range(cent_n.shape[0])]
    return emb.sparkSession.createDataFrame(rows, "label int, centroid array<double>")


def assign_clusters(
    emb: DataFrame,
    prototypes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-prototype assignment: broadcast the K-row prototype table,
    score every (vector, prototype) cosine, keep the argmax per vector
    (cosine desc rounded to 6dp, cluster id asc on ties). The window
    partitions on the vector id — the same key the cross-join already
    carries — and K is a constant factor, not a shuffle width."""
    # the corpus side may itself carry a `label` column (the embeddings
    # table does) — alias the prototype columns before the cross join
    proto = prototypes.select(
        F.col("label").alias("__proto_label"), F.col("centroid").alias("__centroid")
    )
    # Arrow-vectorized cosine (same float64 numerics as the pair kernels);
    # the interpreted HOF expression form measured ~6x slower at sf0.1 on
    # the |corpus|×K cross join
    scored = emb.crossJoin(F.broadcast(proto)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col("__proto_label").alias("cluster"),
        F.round(cosine_udf(as_double(F.col(vec_col)), F.col("__centroid")), 6).alias(
            "cos_to_centroid"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos_to_centroid"), F.asc("cluster"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _dropped_kernel(threshold: float):
    """applyInPandas kernel for one cluster: the in-cluster cosine triangle
    (same float64 normalize-then-matmul numerics as similarity._pair_kernel,
    so DuckDB's ``list_cosine_similarity`` reproduces every value at 6dp),
    reduced IN the kernel to each member's max similarity to a smaller-id
    neighbor — the pair matrix never leaves the executor."""
    import numpy as np
    import pandas as pd

    def kernel(key, pdf):
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        if len(ids) < 2:
            return pd.DataFrame({"cluster": [], "vec_id": [], "max_cos": []}).astype(
                {"cluster": "int32", "vec_id": "int64", "max_cos": "float64"}
            )
        M = np.vstack(pdf["vec"].to_numpy()[order]).astype(np.float64)
        from kf_task_fhir_etl_spark.operators.similarity import _safe_norms

        Mn = M / _safe_norms(M)
        sims = np.round(Mn @ Mn.T, 6)
        # max over strictly-smaller-id rows for each column (rounded before
        # the max, so max-of-rounded == the oracle's MAX over rounded pairs)
        upper = np.where(np.triu(np.ones_like(sims, dtype=bool), k=1), sims, -np.inf)
        best = upper.max(axis=0)
        mask = best >= threshold
        return pd.DataFrame(
            {
                "cluster": np.full(mask.sum(), int(key[0]), dtype="int32"),
                "vec_id": ids[mask],
                "max_cos": best[mask],
            }
        )

    return kernel


def semantic_dedup_dropped(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    blocks: int = 1,
    split_min: int = 0,
    prototypes: DataFrame | None = None,
) -> DataFrame:
    """(cluster, vec_id, max_cos) of every document dropped by semantic
    dedup: within its cluster it has a neighbor with a SMALLER id at
    cosine ≥ threshold (min-id survivor rule — the same pair-dominance
    policy as ``dedup.exact_dedup``), and ``max_cos`` records its strongest
    such neighbor.

    One shuffle on the cluster key feeds a per-cluster Arrow triangle
    kernel (vectorized matmul, ~40× the interpreted pair-join expression at
    sf0.1); the O(m²) similarity matrix lives only inside the executor and
    reduces to one row per dropped member before anything is emitted.
    Per-cluster working set (m²·8 bytes) is the executor-memory knob — the
    SemDeDup regime keeps m ≈ n/K small; for OUTLIER clusters too large
    for one group, pass ``blocks > 1``: clusters with more than
    ``split_min`` members split into deterministic xxhash64 blocks and
    every (cluster, blockᵢ ≤ blockⱼ) pair becomes its own kernel group
    (``similarity.block_replicate`` — the q15 block-pair shape keyed by
    cluster), cutting the per-group working set to 2m/blocks × dim at the
    cost of m·blocks replication. Clusters at or under ``split_min`` keep
    the 1× single-group path (the overwhelming majority in the SemDeDup
    regime pay nothing for the escape hatch). Result identical either way
    — every in-cluster pair meets in exactly one group; equivalence
    pinned in tests.

    ``prototypes`` (a ``(label, centroid)`` DataFrame) makes the operator
    work on UNLABELED corpora — pass the deterministic k-means centroids
    from ``kmeans_prototypes`` (or any cluster model). When omitted, the
    per-label mean prototypes of ``label_col`` are used (the pre-labeled
    case). Either way the prototype label must be an integral type: the
    kernel group key is materialized as int, and a lossy cast (e.g. a
    string label silently becoming NULL) would collapse every cluster into
    one NULL group — the O(n²)-over-the-whole-corpus failure this guard
    exists to prevent."""
    protos = (
        prototypes if prototypes is not None else label_prototypes(emb, label_col, vec_col)
    )
    raw = assign_clusters(emb, protos, id_col, vec_col)
    ctype = dict(raw.dtypes)["cluster"]
    if ctype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"semantic_dedup_dropped: cluster label must be integral, got {ctype!r} "
            f"— a cast('int') on a non-integer label would yield NULLs and merge "
            f"all clusters into one group; map labels to ints first"
        )
    assigned = raw.select(F.col("cluster").cast("int").alias("cluster"), "id", "vec")

    def _single_group(part: DataFrame) -> DataFrame:
        return part.groupBy("cluster").applyInPandas(
            _dropped_kernel(threshold), schema="cluster int, vec_id long, max_cos double"
        )

    if blocks <= 1:
        return _single_group(assigned).withColumnRenamed("vec_id", id_col)

    from kf_task_fhir_etl_spark.operators.similarity import _pair_kernel, block_replicate

    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("__m"))
    sized = assigned.join(F.broadcast(sizes), "cluster")
    small = sized.filter(F.col("__m") <= split_min).drop("__m")
    big = sized.filter(F.col("__m") > split_min).drop("__m")

    inner = _pair_kernel(threshold)

    def kernel(key, pdf):
        out = inner((key[1], key[2]), pdf)
        out.insert(0, "cluster", key[0])
        return out

    pairs = (
        block_replicate(big.withColumnRenamed("vec", "v"), blocks)
        .groupBy("cluster", "gi", "gj")
        .applyInPandas(kernel, schema="cluster int, id_a long, id_b long, cosine double")
    )
    big_dropped = pairs.groupBy("cluster", F.col("id_b").alias("vec_id")).agg(
        F.max("cosine").alias("max_cos")
    )
    return (
        _single_group(small)
        .unionByName(big_dropped)
        .withColumnRenamed("vec_id", id_col)
    )
