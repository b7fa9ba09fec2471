"""Connected components over an edge list — the clustering step that turns
near-duplicate *pairs* (minhash/ngram/embedding dedup output) into duplicate
*groups* with one canonical survivor per group.

Algorithm: iterative minimum-label propagation. Every node starts labeled
with its own id; each round every node adopts the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed = graph
diameter (near-dup graphs are overwhelmingly tiny cliques/chains, so 2-4
rounds in practice; ``max_iter`` bounds pathological chains).

Scale design (100 TB corpora → billions of nodes, edges ≪ nodes²):
  * each round is one shuffle: edges ⋈ labels on node id, then a min-
    aggregate on the destination id — both hash on the same key, so AQE
    reuses the exchange layout;
  * convergence check is a driver-side label-sum comparison (labels are
    elementwise non-increasing, so an unchanged exact sum is a fixpoint
    proof) — one scalar aggregate per round, no new-vs-old join;
  * for adversarial long-chain graphs switch to the large-star/small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce"),
    which converges in O(log^2 n) rounds — same join/agg primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id of its connected component.

    ``nodes``: one row per node (``id_col``); isolated nodes allowed.
    ``edges``: undirected pairs (``src_col``, ``dst_col``), any orientation.
    Returns (id_col, component) — component = min id reachable from the node.
    """
    # Symmetrize once; edges are reused every round so cache them.
    sym = (
        edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
        .union(edges.select(F.col(dst_col).alias("_a"), F.col(src_col).alias("_b")))
        .distinct()
    )
    sym.cache()

    # Only edge-touched nodes can ever change labels — propagate over that
    # (typically tiny) subgraph and union the untouched singletons at the
    # end. On a 100 TB corpus the near-dup graph is orders of magnitude
    # smaller than the node set; looping over all nodes would make every
    # round cost O(corpus) instead of O(edges).
    # localCheckpoint (eager): the returned lazy frame's singleton branch
    # must read materialized ids, not re-derive them through the (possibly
    # very expensive) edge-producing plan after the loop finishes.
    touched = (
        sym.select(F.col("_a").alias("_id")).distinct().localCheckpoint(eager=True)
    )
    labels = touched.select("_id", F.col("_id").alias("_lbl"))

    # Convergence test: labels only ever decrease elementwise (min of self,
    # neighbors, label-of-label), so the label SUM is strictly decreasing
    # until the fixpoint — an unchanged sum proves convergence. One scalar
    # aggregate per round on the just-materialized frame, no new-vs-old
    # join. decimal(38,0) keeps the sum exact at billions of 64-bit ids.
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("_lbl").cast("decimal(38,0)")).alias("_s")
        ).collect()[0]["_s"]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # Neighbor labels: for each edge (a, b), b receives a's current label.
        neighbor = (
            sym.join(labels, sym["_a"] == labels["_id"])
            .select(F.col("_b").alias("_id"), F.col("_lbl"))
        )
        # localCheckpoint truncates the lineage each round — without it the
        # logical plan nests one join+agg per iteration and Catalyst
        # re-optimizes an exponentially growing tree (driver OOM by ~10
        # rounds). Eager so the convergence check below reads materialized
        # blocks. (Cluster caveat: localCheckpoint blocks don't survive
        # executor loss; long jobs on preemptible nodes should use
        # checkpoint() with a reliable checkpoint dir instead.)
        propagated = (
            labels.union(neighbor)
            .groupBy("_id")
            .agg(F.min("_lbl").alias("_lbl"))
        )
        # Pointer-doubling shortcut: additionally adopt the label OF my
        # label ("my root's root"), halving path lengths every round —
        # convergence drops from O(diameter) to O(log diameter) rounds,
        # which is what makes adversarial chain graphs safe under a small
        # max_iter. One extra self-join per round on the already-small
        # label table.
        p = propagated
        new_labels = (
            p.alias("x")
            .join(
                p.select(F.col("_id").alias("_lid"), F.col("_lbl").alias("_llbl")),
                F.col("x._lbl") == F.col("_lid"),
                "left",
            )
            .select(
                F.col("x._id").alias("_id"),
                F.least(
                    F.col("x._lbl"), F.coalesce(F.col("_llbl"), F.col("x._lbl"))
                ).alias("_lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds; "
            "the graph's effective diameter exceeds 2^max_iter — raise "
            "max_iter (rounds are O(log diameter) with shortcutting)"
        )

    singletons = (
        nodes.select(F.col(id_col).alias("_id"))
        .join(touched, "_id", "left_anti")
        .select("_id", F.col("_id").alias("_lbl"))
    )
    out = labels.union(singletons).select(
        F.col("_id").alias(id_col), F.col("_lbl").alias("component")
    )
    sym.unpersist()
    return out


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Cluster near-duplicate pairs into groups; canonical = min id.

    Returns (id_col, cluster_id, is_canonical). Downstream dedup keeps
    ``is_canonical`` rows — one survivor per duplicate group, singletons
    survive trivially (their cluster is themselves).
    """
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col=pair_a, dst_col=pair_b
    )
    return comp.select(
        F.col(id_col),
        F.col("component").alias("cluster_id"),
        (F.col(id_col) == F.col("component")).alias("is_canonical"),
    )
