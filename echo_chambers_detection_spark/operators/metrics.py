"""Echo-chamber metrics (SURVEY.md §2.4 A4-A12) as distributed aggregations.

Reference semantics (project/metrics/metrics.py, metrics_interface.py):
the metrics layer pulls everything into driver RAM (dicts + NetworkX) and
loops per-edge with one sklearn cosine call each, and per-community over
the whole edge list (O(C·E), metrics.py:111-124,148-189). Here the same
numbers come out of a handful of groupBy aggregations over an edge list
whose similarities are computed once, JVM-side.

Node-set discipline (metrics_interface.py:95-108): communities are
filtered to nodes with embeddings, embeddings to nodes with communities,
and the graph keeps only edges with both endpoints in that member set —
`restrict_to_members` reproduces exactly this.

NaN/null conventions: the reference mixes 0-defaults (global ecs,
metrics.py:8-12), NaN (per-community table, metrics.py:161-181), and a
10000 sentinel (standalone conductance, metrics.py:120). SQL NULL stands
in for NaN; the sentinel is preserved where the reference has it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from echo_chambers_detection_spark.functions.vector import cosine_similarity


def restrict_to_members(
    edges: DataFrame, labels: DataFrame, embeddings: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Mutual semi-join filtering (reference metrics_interface.py:95-108;
    SURVEY.md P7/P8): members = labeled ∩ embedded; graph keeps only
    edges with both endpoints in members.

    edges:      (u1, u2) distinct undirected pairs, u1 < u2
    labels:     (node, label), noise label -1 already excluded upstream
    embeddings: (node, vector)

    Returns (edges_m, members(node, label)).
    """
    members = labels.join(embeddings.select("node"), "node", "leftsemi")
    m1 = members.select(F.col("node").alias("u1"))
    m2 = members.select(F.col("node").alias("u2"))
    edges_m = edges.join(m1, "u1", "leftsemi").join(m2, "u2", "leftsemi")
    return edges_m, members


def edge_similarities(edges: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Attach both endpoints' labels-agnostic cosine similarity to each edge
    (reference per-edge loop, metrics.py:143-146; SURVEY.md J6/F7).
    One join per endpoint, one codegen'd array expr per edge."""
    e1 = embeddings.select(
        F.col("node").alias("u1"), F.col("vector").alias("_v1")
    )
    e2 = embeddings.select(
        F.col("node").alias("u2"), F.col("vector").alias("_v2")
    )
    return (
        edges.join(e1, "u1", "left")
        .join(e2, "u2", "left")
        .withColumn("sim", cosine_similarity("_v1", "_v2"))
        .drop("_v1", "_v2")
    )


def _labeled_edges(
    edges: DataFrame, members: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """(u1, u2, l1, l2, sim) — the single worktable every metric reads."""
    lab1 = members.select(F.col("node").alias("u1"), F.col("label").alias("l1"))
    lab2 = members.select(F.col("node").alias("u2"), F.col("label").alias("l2"))
    return (
        edge_similarities(edges, embeddings)
        .join(lab1, "u1", "left")
        .join(lab2, "u2", "left")
    )


def global_metrics(
    edges_m: DataFrame, members: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """One-row frame: homophily, cohesion, separation, ecs.

    Reference: ecs() + homophily() (metrics.py:8-35,101-106). Note the
    reference's global variant defaults empty sides to 0 (metrics.py:9,12),
    unlike the per-community NaN — preserved via coalesce. Single pass:
    conditional averages instead of two driver-side lists (SURVEY.md A4/A5).
    """
    we = _labeled_edges(edges_m, members, embeddings)
    same = F.col("l1") == F.col("l2")
    agg = we.agg(
        F.avg("sim").alias("homophily"),
        F.coalesce(F.avg(F.when(same, F.col("sim"))), F.lit(0.0)).alias("cohesion"),
        F.coalesce(
            1 - F.avg(F.when(~same, F.col("sim"))), F.lit(0.0)
        ).alias("separation"),
    )
    return agg.withColumn("ecs", F.col("cohesion") * F.col("separation"))


def modularity(edges_m: DataFrame, members: DataFrame) -> DataFrame:
    """One-row frame with the reference's modularity (metrics.py:57-98):
    communities of size >= 2 only; if fewer than two such communities the
    result is NULL (reference returns NaN); otherwise the induced subgraph
    on their union is scored with the closed form
        Q = Σ_c [ L_c/m − (d_c / 2m)² ]
    (identical to nx.community.modularity on an unweighted graph) — a pure
    group-by over edges + degrees instead of a driver-side subgraph.

    Community sizes are taken over GRAPH nodes (reference iterates
    G.nodes(), metrics.py:77-87), so isolated members don't count.
    """
    g_nodes = (
        edges_m.select(F.col("u1").alias("node"))
        .unionAll(edges_m.select(F.col("u2").alias("node")))
        .distinct()
    )
    members = members.join(g_nodes, "node", "leftsemi")
    sizes = members.groupBy("label").agg(F.count("*").alias("sz"))
    valid = sizes.where(F.col("sz") >= 2).select("label")
    vm = members.join(valid, "label", "leftsemi")

    m1 = vm.select(F.col("node").alias("u1"), F.col("label").alias("l1"))
    m2 = vm.select(F.col("node").alias("u2"), F.col("label").alias("l2"))
    sub = edges_m.join(m1, "u1", "inner").join(m2, "u2", "inner")

    deg = (
        sub.select(F.col("u1").alias("node"), F.col("l1").alias("label"))
        .unionAll(sub.select(F.col("u2").alias("node"), F.col("l2").alias("label")))
        .groupBy("node", "label")
        .agg(F.count("*").alias("degree"))
    )
    d_c = deg.groupBy("label").agg(F.sum("degree").alias("d_c"))
    l_c = (
        sub.where(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("label"))
        .agg(F.count("*").alias("l_c"))
    )
    per_c = d_c.join(l_c, "label", "left").na.fill({"l_c": 0})

    totals = sub.agg(F.count("*").alias("m_edges")).crossJoin(
        valid.agg(F.count("*").alias("n_valid"))
    )
    q = (
        per_c.crossJoin(F.broadcast(totals))
        .select(
            (
                F.col("l_c") / F.col("m_edges")
                - F.pow(F.col("d_c") / (2 * F.col("m_edges")), 2)
            ).alias("term"),
            "n_valid",
        )
        .groupBy("n_valid")
        .agg(F.sum("term").alias("q"))
    )
    return q.select(
        F.when((F.col("n_valid") >= 2), F.col("q")).alias("modularity")
    )


def community_metrics(
    edges_m: DataFrame, members: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """The per-community table (reference per_community_table,
    metrics.py:127-205; SURVEY.md A12), one distributed pipeline.

    Columns: label, size, cohesion, separation, ecs, conductance,
    variance, homophily, density_internal, internal_edge_count.

    Reference quirks preserved:
    - community node sets are members that appear in the graph
      (metrics.py:136-139);
    - an inter-community edge contributes to BOTH sides' external sets
      (the per-community loop re-scans all edges, metrics.py:148-159) —
      expressed as explode(array(l1, l2));
    - conductance NaN (here NULL) when a side's volume is 0
      (metrics.py:173), unlike the standalone 10000 sentinel;
    - per-community homophily is defined as cohesion (metrics.py:183).
    """
    # tracked eager checkpoint instead of a bare .cache(): we feeds the
    # internal/external branches below, and a cache's pinned RDD has no
    # recorded id, so callers could never release it (leak census r10).
    # The frame is community-graph sized (edges_m is already compacted),
    # so the eager materialization costs what the first cache fill did.
    from echo_chambers_detection_spark.operators.graph import (
        carry_ckpt,
        tracked_checkpoint,
    )

    we = tracked_checkpoint(_labeled_edges(edges_m, members, embeddings))

    g_nodes = (
        edges_m.select(F.col("u1").alias("node"))
        .unionAll(edges_m.select(F.col("u2").alias("node")))
        .distinct()
    )
    comm_nodes = members.join(g_nodes, "node", "leftsemi")

    sizes = comm_nodes.groupBy("label").agg(F.count("*").alias("size"))

    internal = (
        we.where(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("label"))
        .agg(
            F.count("*").alias("internal_edge_count"),
            F.avg("sim").alias("cohesion"),
        )
    )

    ext = (
        we.where(~F.col("l1").eqNullSafe(F.col("l2")))
        .select(
            F.explode(F.array("l1", "l2")).alias("label"),
            "sim",
        )
        .where(F.col("label").isNotNull())
        .groupBy("label")
        .agg(
            F.count("*").alias("cut_edges"),
            F.avg("sim").alias("_mean_ext_sim"),
        )
    )

    deg = (
        edges_m.select(F.col("u1").alias("node"))
        .unionAll(edges_m.select(F.col("u2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    vol = (
        comm_nodes.join(deg, "node", "left")
        .na.fill({"degree": 0})
        .groupBy("label")
        .agg(F.sum("degree").alias("vol_c"))
    )
    total = edges_m.agg((2 * F.count("*")).alias("total_deg"))

    # variance: two-pass centroid -> mean squared distance, fully exploded
    mem_vec = comm_nodes.join(embeddings, "node", "inner").select(
        "label", "node", F.posexplode("vector").alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    centroid = mem_vec.groupBy("label", "dim").agg(F.avg("val").alias("cval"))
    sqd = (
        mem_vec.join(centroid, ["label", "dim"])
        .groupBy("label", "node")
        .agg(F.sum(F.pow(F.col("val") - F.col("cval"), 2)).alias("sqd"))
    )
    variance = sqd.groupBy("label").agg(F.avg("sqd").alias("variance"))

    out = (
        sizes.join(internal, "label", "left")
        .join(ext, "label", "left")
        .join(vol, "label", "left")
        .join(variance, "label", "left")
        .crossJoin(F.broadcast(total))
        .na.fill({"internal_edge_count": 0, "cut_edges": 0})
    )
    min_vol = F.least(F.col("vol_c"), F.col("total_deg") - F.col("vol_c"))
    possible = F.col("size") * (F.col("size") - 1) / 2
    return carry_ckpt(
        out.select(
            "label",
            "size",
            "cohesion",
            (1 - F.col("_mean_ext_sim")).alias("separation"),
            (F.col("cohesion") * (1 - F.col("_mean_ext_sim"))).alias("ecs"),
            F.when(min_vol > 0, F.col("cut_edges") / min_vol).alias(
                "conductance"
            ),
            "variance",
            F.col("cohesion").alias("homophily"),
            F.when(possible > 0, F.col("internal_edge_count") / possible)
            .alias("density_internal"),
            "internal_edge_count",
        ).orderBy(F.desc_nulls_last("ecs"), "label"),
        we,
    )


def conductance_with_sentinel(edges_m: DataFrame, members: DataFrame) -> DataFrame:
    """Standalone conductance with the reference's arbitrary 10000 sentinel
    for an empty side (compute_conductance, metrics.py:108-124)."""
    g_nodes = (
        edges_m.select(F.col("u1").alias("node"))
        .unionAll(edges_m.select(F.col("u2").alias("node")))
        .distinct()
    )
    comm_nodes = members.join(g_nodes, "node", "leftsemi")
    lab1 = comm_nodes.select(F.col("node").alias("u1"), F.col("label").alias("l1"))
    lab2 = comm_nodes.select(F.col("node").alias("u2"), F.col("label").alias("l2"))
    we = edges_m.join(lab1, "u1", "left").join(lab2, "u2", "left")

    cut = (
        we.where(~F.col("l1").eqNullSafe(F.col("l2")))
        .select(F.explode(F.array("l1", "l2")).alias("label"))
        .where(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count("*").alias("cut_edges"))
    )
    deg = (
        edges_m.select(F.col("u1").alias("node"))
        .unionAll(edges_m.select(F.col("u2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    vol = (
        comm_nodes.join(deg, "node", "left")
        .na.fill({"degree": 0})
        .groupBy("label")
        .agg(F.sum("degree").alias("vol_c"))
    )
    total = edges_m.agg((2 * F.count("*")).alias("total_deg"))
    min_vol = F.least(F.col("vol_c"), F.col("total_deg") - F.col("vol_c"))
    return (
        vol.join(cut, "label", "left")
        .na.fill({"cut_edges": 0})
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            F.when(min_vol > 0, F.col("cut_edges") / min_vol)
            .otherwise(F.lit(10000.0))
            .alias("conductance"),
        )
    )
