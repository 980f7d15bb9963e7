"""Graph analytics over pair tables: PageRank power iteration.

The near-dup pair graph is a real pipeline artifact (operators/dedup
produces it); centrality over it ranks documents by how embedded they
are in duplication neighborhoods — a canonical-selection signal
complementary to quality scores (keep_best_per_cluster), and the same
dataflow serves citation/link graphs.

Spark-first shape: fixed-round power iteration as a driver loop
BUILDING one lazy plan — each round is a (src)-keyed join of the rank
vector to the edge list plus a (dst)-keyed aggregate, i.e. exactly
two key-partitioned shuffles per round, no driver data movement. At
cluster scale the two standard refinements apply: localCheckpoint
every few rounds to cut lineage (exposed as ``checkpoint_every``),
and pre-partitioning edges by src so the rank join reuses one
exchange across all rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED pair table.

    Nodes are the ids appearing in any pair (isolated docs are out of
    the graph by definition); every node therefore has degree >= 1 —
    no dangling-mass correction needed. Returns (node, pr) with pr
    rounded to 6 (power iteration is float; 6 digits is far above the
    ~1e-13 cross-engine summation drift after 10 rounds and far below
    rank resolution).
    """
    e = pairs.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).unionByName(
        pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    # (s, d, dg): loop-invariant, but referenced by EVERY iteration's
    # branch of the final DAG — without materialization Spark
    # recomputes the whole upstream pair derivation once per round
    # (measured ~2x on the near-dup graph). localCheckpoint stores it
    # executor-side once; blocks are GC-reclaimed when the result DF
    # goes out of scope.
    ed = e.join(deg, "s").localCheckpoint(eager=False)
    # r11: the node count is ONE scalar — collect it once instead of
    # crossJoin(broadcast(n1)) in every iteration, which executed a
    # separate broadcast job per round (measured: 22 jobs for the
    # 10-iteration fixture query; each job is pure scheduling latency
    # around a 1-row table). Same IEEE expression: (1-d)/n and 1/n are
    # the identical double divisions on the identical count-derived
    # double, so ranks are bit-equal. One COUNT to the driver is a
    # scalar at any corpus size.
    # count from the CHECKPOINTED edge table so this one construction
    # job also materializes the pin (counting `deg` directly would
    # execute the upstream pair derivation once for the count and
    # again for ed's checkpoint)
    nd = float(ed.select("s").distinct().count())
    ranks = deg.select(F.col("s").alias("node")).select(
        "node", (F.lit(1.0) / F.lit(nd)).alias("rank")
    )
    for i in range(iters):
        contrib = (
            ed.join(ranks, ed["s"] == ranks["node"])
            .groupBy("d")
            .agg(F.sum(F.col("rank") / F.col("dg")).alias("c"))
        )
        ranks = contrib.select(
            F.col("d").alias("node"),
            (
                (1.0 - damping) / F.lit(nd) + damping * F.col("c")
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("pr"))


def label_propagation(
    pairs: DataFrame,
    iters: int = 4,
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    checkpoint_every: int | None = 2,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    UNDIRECTED pair table: every node starts as its own label; each
    round it adopts the most frequent label among its neighbors
    (ties -> smallest label). Returns (node, label) after exactly
    ``iters`` rounds.

    Communities are a coarser signal than connected components (which
    merge through every bridge): LPA stops at low-conductance cuts,
    so a chain of borderline near-dup links does NOT collapse two
    dense duplicate clusters into one — the failure mode of
    CC-based dedup on quote/boilerplate bridges.

    Determinism: the tie rule makes each round a pure function of the
    previous labeling, so a FIXED iteration count gives a
    reproducible result (classic async/random-order LPA is not;
    synchronous LPA can oscillate on bipartite structures, which the
    fixed count also sidesteps — document the count, don't iterate
    to convergence). Per round: one join on the edge key + one
    (node,label) count + one per-node argmax — two key-partitioned
    shuffles, zero driver data movement; the edge table is
    localCheckpoint'd once like :func:`pagerank`, and periodic
    checkpoints cut the O(iters) lineage growth.
    """
    e = pairs.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).unionByName(
        pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    ).localCheckpoint(eager=False)
    labels = e.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for i in range(iters):
        votes = (
            e.join(labels, e["s"] == labels["node"])
            .groupBy("d", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # min of (-count, label) == most votes, smallest label on tie
        labels = (
            votes.groupBy("d")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("w"))
            .select(F.col("d").alias("node"), F.col("w.label").alias("label"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def khop_reachability(
    pairs: DataFrame,
    seeds: DataFrame,
    hops: int,
    src_col: str = "doc_id_a",
    dst_col: str = "doc_id_b",
    node_col: str = "node",
) -> DataFrame:
    """(node, min_hop): every node within ``hops`` undirected steps of
    the seed set, with its BFS layer (0 = seed). Frontier expansion as
    an unrolled loop building ONE lazy plan: layer h+1 = distinct
    neighbors of layer h, and min_hop resolves as a final min-per-node
    aggregate over the layered union — no visited-set anti-join per
    round, which would serialize the layers (correct BFS still falls
    out because a node first reached at layer h also appears in every
    later layer it is re-reached in; min() recovers the first).

    Per hop: one (src)-keyed join frontier->edges + one distinct —
    two key-partitioned shuffles, frontier-sized (never graph-sized).
    ``hops`` is small and fixed (impact radii, contamination blast
    zones, fraud rings); for unbounded reachability use the
    connected-components operators instead (dedup.py's
    large-star/small-star loop), which converge in O(log n) rounds.
    """
    if hops < 0:
        raise ValueError("hops must be >= 0")
    edges = pairs.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).unionByName(
        pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    )
    frontier = seeds.select(F.col(node_col).alias("n")).distinct()
    layers = [frontier.select("n", F.lit(0).alias("hop"))]
    for h in range(1, hops + 1):
        frontier = (
            edges.join(frontier, edges["s"] == frontier["n"])
            .select(F.col("d").alias("n"))
            .distinct()
        )
        layers.append(frontier.select("n", F.lit(h).alias("hop")))
    allhops = layers[0]
    for lay in layers[1:]:
        allhops = allhops.unionByName(lay)
    return allhops.groupBy(F.col("n").alias(node_col)).agg(
        F.min("hop").alias("min_hop")
    )
