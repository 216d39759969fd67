"""Incremental connected-components maintenance — a signed EDGE changelog
updates an existing (node, component) labeling without recomputing the
whole graph (VERDICT r09 Next #5: the IVM line × the iterative-graph
line). The split follows the literature's tractability boundary:

- **Edge INSERTS maintain algebraically.** An inserted edge merges (at
  most) two components; since every component's label is already the MIN
  node id of its member set, the merge is min-label propagation on the
  COMPONENT GRAPH — nodes are the touched labels, edges are the inserted
  edges' (label_a, label_b) pairs — a graph bounded by the batch size,
  never the data. Relabeling is one broadcast remap join against the full
  labeling. This is the union-by-min-label fold (Shiloach-Vishkin's
  hooking step applied to an already-contracted graph).
- **Edge DELETES recompute boundedly.** A deletion can split a component,
  and no label summary can testify to the surviving connectivity — so
  ONLY the components a deleted edge touched are recomputed, from the
  post-changelog edge slice INTERNAL to those components (every
  post-changelog edge that crosses old component boundaries is
  necessarily an inserted edge — old edges connect within old components
  by definition — so the insert fold above is exactly the cross-boundary
  complement). Untouched components pass through byte-exact.

Ordering of the phases is load-bearing: deletes first produce the
intermediate labeling L1 (splits materialized), THEN inserts map their
endpoints to L1 labels — an inserted edge that re-bridges a split, or
bridges a split fragment to an untouched component, lands in the label
graph with the right endpoints.

Contracts (the ivm.py discipline): ``edges_new`` is the POST-changelog
edge set (a real pipeline has it; deriving it here would rescan what the
caller already wrote — the apply_minmax_delta precedent); deletes name
edges that existed under ``comps``' labeling; the node universe is
``comps``'s nodes ∪ insert-edge endpoints (deleting every edge of a node
leaves it a singleton, it never vanishes); NULL endpoints are dropped at
intake like ``connected_components``; labels equal the min node id
reachable, so the maintained result is bit-identical to a from-scratch
``connected_components`` recompute on the post-changelog graph — the q154
gate's contract.

Cost at 100 TB: the full labeling is touched by ONE broadcast-probe
anti/semi pair (delete-touched components) and ONE broadcast remap join
(insert-merged labels) — both delta-bounded probes; the edge table is
touched only by the touched-component slice joins. The recompute scope is
the touched components' induced subgraph — worst case one giant
component, which is the inherent price of deletion without maintaining a
spanning forest (the next refinement the literature offers).

Reference anchor: the reference pipeline has no graph surface; this
extends the engine's own connected_components (operators/dedup.py,
q63/q72) and IVM (q133/q144-q149) families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.operators.dedup import connected_components


def apply_components_delta(
    comps: DataFrame,
    edges_new: DataFrame,
    delta: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    edge_cols: tuple[str, str] = ("id_a", "id_b"),
    sign_col: str = "op",
    max_iter: int = 25,
) -> DataFrame:
    """Maintain a connected-components labeling through a signed edge
    changelog. ``comps``: (node_col, comp_col) — the current labeling.
    ``edges_new``: the post-changelog edge set. ``delta``: edge_cols +
    sign_col (+1 insert, −1 delete). Returns the updated labeling with
    the same schema and the same min-node-id label convention."""
    a, b = edge_cols
    for side, df, need in (
        ("comps", comps, [node_col, comp_col]),
        ("edges_new", edges_new, [a, b]),
        ("delta", delta, [a, b, sign_col]),
    ):
        missing = [c for c in need if c not in df.columns]
        if missing:
            raise ValueError(f"apply_components_delta: {side} lacks {missing}")
    clean = delta.filter(F.col(a).isNotNull() & F.col(b).isNotNull() & (F.col(a) != F.col(b)))
    ins = clean.filter(F.col(sign_col) > 0).select(a, b)
    dels = clean.filter(F.col(sign_col) < 0).select(a, b)

    # ---- phase 1: delete-touched components recompute boundedly ----------
    del_nodes = (
        dels.select(F.col(a).alias(node_col))
        .unionByName(dels.select(F.col(b).alias(node_col)))
        .distinct()
    )
    del_comps = (
        comps.join(F.broadcast(del_nodes), node_col, "left_semi")
        .select(F.col(comp_col).alias("__dc"))
        .distinct()
    )
    members = comps.join(
        F.broadcast(del_comps), F.col(comp_col) == F.col("__dc"), "left_semi"
    )
    # post-changelog edges INTERNAL to a touched component under the OLD
    # labeling (both endpoints in the same touched component — inserted
    # intra edges included, so a delete compensated by an insert inside
    # one component recomputes to the still-connected truth); no broadcast
    # hint: `members` is component-sized, not delta-sized
    ma = members.select(F.col(node_col).alias(a), F.col(comp_col).alias("__ca"))
    mb = members.select(F.col(node_col).alias(b), F.col(comp_col).alias("__cb"))
    sub_edges = (
        edges_new.join(ma, a).join(mb, b).filter(F.col("__ca") == F.col("__cb")).select(a, b)
    )
    recomputed = connected_components(
        members.select(node_col), sub_edges, node_col=node_col, edge_cols=(a, b),
        max_iter=max_iter,
    ).select(node_col, F.col("component").alias(comp_col))
    untouched = comps.join(
        F.broadcast(del_comps), F.col(comp_col) == F.col("__dc"), "left_anti"
    )
    l1 = untouched.select(node_col, comp_col).unionByName(recomputed)

    # ---- phase 2: inserts fold on the component graph --------------------
    ins_nodes = (
        ins.select(F.col(a).alias(node_col))
        .unionByName(ins.select(F.col(b).alias(node_col)))
        .distinct()
    )
    new_nodes = ins_nodes.join(comps.select(node_col), node_col, "left_anti").select(
        node_col, F.col(node_col).alias(comp_col)
    )
    l1p = l1.unionByName(new_nodes)
    lab = l1p.select(F.col(node_col).alias("__n"), F.col(comp_col).alias("__l"))
    # endpoint → L1 label: two delta-driven joins (the batch-sized insert
    # set is the broadcast side; the labeling is never shuffled for this)
    e1 = (
        F.broadcast(ins)
        .join(lab, F.col(a) == F.col("__n"))
        .select(F.col(b), F.col("__l").alias("__la"))
    )
    pairs = (
        F.broadcast(e1)
        .join(lab, F.col(b) == F.col("__n"))
        .select(F.col("__la"), F.col("__l").alias("__lb"))
        .filter(F.col("__la") != F.col("__lb"))
        .distinct()
    )
    touched_labels = (
        pairs.select(F.col("__la").alias(node_col))
        .unionByName(pairs.select(F.col("__lb").alias(node_col)))
        .distinct()
    )
    mapping = connected_components(
        touched_labels, pairs, node_col=node_col, edge_cols=("__la", "__lb"),
        max_iter=max_iter,
    ).select(
        F.col(node_col).alias("__from"), F.col("component").alias("__to")
    ).filter(F.col("__from") != F.col("__to"))
    remapped = l1p.join(
        F.broadcast(mapping), F.col(comp_col) == F.col("__from"), "left"
    ).select(
        node_col, F.coalesce(F.col("__to"), F.col(comp_col)).alias(comp_col)
    )
    return remapped


def apply_sssp_inserts(
    dist: DataFrame,
    edges_new: DataFrame,
    delta_edges: DataFrame,
    weight_col: str = "w",
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    dist_col: str = "dist",
    directed: bool = False,
    max_rounds: int = 50,
    handles_out: list[DataFrame] | None = None,
) -> DataFrame:
    """Maintain multi-source shortest-path distances through an
    INSERT-ONLY edge batch — the tractable half of dynamic SSSP, on the
    same literature boundary as ``apply_components_delta``: edge
    insertion only LOWERS distances, so Bellman-Ford simply CONTINUES
    from the current table and converges to exactly the from-scratch
    answer; deletion can raise distances, which without a maintained
    shortest-path forest needs recompute (``sssp_distances``) — out of
    scope by design.

    ``dist``: (node_col, dist_col), the current distances (reachable
    nodes only — the ``sssp_distances`` convention). ``edges_new``: the
    POST-changelog edge set, the propagation medium (an improvement at v
    must flow onward through v's OLD edges too — the apply_minmax_delta
    ``base_new`` precedent). ``delta_edges``: the inserted edges
    (src, dst, weight_col); symmetrized unless ``directed``.

    Plan shape: the SEED frontier is the inserted edges' one-hop
    relaxation against the current table — ONE broadcast-delta join,
    batch-sized — and each later round is ``sssp_distances``' frontier
    template (relax out of the improved set, min-aggregate, one
    full-outer merge checkpoint) over the post-changelog edges, so the
    per-round cost is bounded by the improvement wavefront, never a full
    restart from the sources. An insert that improves nothing costs the
    seed join and one empty-frontier check. ``max_rounds`` counts
    productive rounds and raises loudly (also the negative-cycle exit
    for negative delta weights). Integer weights stay exact (bigint);
    see the sssp_distances float caveat otherwise."""
    from kf_task_fhir_etl_spark.etl import release_checkpoints

    def _sym(frame: DataFrame) -> DataFrame:
        fwd = frame.select(
            F.col(src).alias("s"), F.col(dst).alias("t"), F.col(weight_col).alias("w")
        )
        if directed:
            out = fwd
        else:
            out = fwd.unionByName(
                frame.select(
                    F.col(dst).alias("s"), F.col(src).alias("t"), F.col(weight_col).alias("w")
                )
            )
        return out.filter(
            F.col("s").isNotNull() & F.col("t").isNotNull() & F.col("w").isNotNull()
            & (F.col("s") != F.col("t"))
        )

    d = _sym(delta_edges)
    e = _sym(edges_new).groupBy("s", "t").agg(F.min("w").alias("w")).repartition("s").localCheckpoint()

    def _merge(table: DataFrame, cand: DataFrame) -> DataFrame:
        return (
            table.join(
                cand.withColumnRenamed(node_col, "__n"),
                F.col(node_col) == F.col("__n"),
                "full",
            )
            .select(
                F.coalesce(F.col(node_col), F.col("__n")).alias(node_col),
                F.least(F.col(dist_col), F.col("__cand")).alias(dist_col),
                (
                    F.col(dist_col).isNull()
                    | (F.col("__cand").isNotNull() & (F.col("__cand") < F.col(dist_col)))
                ).alias("__improved"),
            )
            .localCheckpoint()
        )

    # seed: relax ONLY the inserted edges against the current distances
    seed = (
        dist.join(F.broadcast(d), dist[node_col] == F.col("s"))
        .select(F.col("t").alias(node_col), (F.col(dist_col) + F.col("w")).alias("__cand"))
        .groupBy(node_col)
        .agg(F.min("__cand").alias("__cand"))
    )
    state = _merge(dist.select(node_col, dist_col), seed)
    frontier = state.filter(F.col("__improved")).select(node_col, dist_col)
    improved_n = frontier.count()
    rounds = 0
    while improved_n > 0:
        rounds += 1
        if rounds > max_rounds:
            release_checkpoints([e, state], blocking=False)
            raise RuntimeError(
                f"apply_sssp_inserts: still relaxing after max_rounds="
                f"{max_rounds} productive rounds — raise the guard for long "
                "improvement chains, or check the delta for a negative-"
                "weight cycle"
            )
        cand = (
            e.join(frontier.withColumnRenamed(node_col, "s"), "s")
            .select(F.col("t").alias(node_col), (F.col(dist_col) + F.col("w")).alias("__cand"))
            .groupBy(node_col)
            .agg(F.min("__cand").alias("__cand"))
        )
        merged = _merge(state.select(node_col, dist_col), cand)
        release_checkpoints([state], blocking=False)
        state = merged
        frontier = state.filter(F.col("__improved")).select(node_col, dist_col)
        improved_n = frontier.count()
    release_checkpoints([e], blocking=False)
    if handles_out is not None:
        handles_out.append(state)
    return state.select(node_col, dist_col)
