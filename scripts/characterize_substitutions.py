"""VERDICT item 8: characterize our community-structure outputs against the
reference's shipped cluster CSVs (/root/reference/*_clusters.csv).

The reference artifacts are GDS runs over its real 77,392-user Bluesky
co-engagement graph; our runs are over the synthetic sf0.1 user graph, so
this is an order-of-magnitude shape comparison (cluster count, noise
fraction, size skew), not a value match. Output: a markdown table to paste
into COVERAGE.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from echo_chambers_detection_spark.session import get_spark
from echo_chambers_detection_spark.catalog import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

REF = {
    "kcore_user_graph": ("kcore", "core_value"),
    "label_propagation_communities": ("label_propagation", "community"),
    "louvain_user_communities": ("louvain", "community"),
    "leiden_communities": ("leiden", "community"),
    "modularity_optimization_communities": ("modularity_optimization", "community"),
    "density_clusters": ("hdbscan", "cluster"),
    "hdbscan_clusters": ("hdbscan", "cluster"),
}


def stats_of(labels: pd.Series) -> dict:
    vc = labels.value_counts()
    n = len(labels)
    noise = int((labels == -1).sum()) if labels.dtype.kind in "if" else int((labels == "-1").sum())
    return {
        "n": n,
        "clusters": int(labels.nunique()),
        "noise_pct": 100.0 * noise / max(n, 1),
        "top_frac": float(vc.iloc[0]) / max(n, 1),
        "singletons": int((vc == 1).sum()),
    }


def planted_graph(n_comm: int = 60, size: int = 25, intra_deg: int = 8, bridges: int = 2):
    """Deterministic planted-partition graph shaped like the reference's
    detected structure (60ish communities): each community is a ring +
    hash-chosen chords (avg intra degree ~intra_deg), with `bridges`
    inter-community edges per community. No RNG — edges come from md5."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    edges = []
    for c in range(n_comm):
        nodes = [f"c{c:03d}n{i:03d}" for i in range(size)]
        for i in range(size):
            edges.append((nodes[i], nodes[(i + 1) % size], 1.0))
        # chords: deterministic pseudo-random pairs
        for j in range(size * (intra_deg - 2) // 2):
            a = h(f"{c}:{j}:a") % size
            b = h(f"{c}:{j}:b") % size
            if a != b:
                edges.append((nodes[min(a, b)], nodes[max(a, b)], 1.0))
        for j in range(bridges):
            c2 = (c + 1 + h(f"{c}:{j}:t") % (n_comm - 1)) % n_comm
            a = h(f"{c}:{j}:x") % size
            b = h(f"{c}:{j}:y") % size
            edges.append((f"c{c:03d}n{a:03d}", f"c{c2:03d}n{b:03d}", 1.0))
    # dedup canonical pairs
    seen = {}
    for u, v, w in edges:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        seen[key] = w
    return [(u, v, w) for (u, v), w in seen.items()], n_comm * size


def run_planted(spark) -> None:
    from echo_chambers_detection_spark.operators.graph import (
        label_propagation,
        leiden,
        louvain,
        modularity_optimization,
    )

    edges, n_nodes = planted_graph()
    df = spark.createDataFrame(edges, "u1 string, u2 string, weight double").localCheckpoint()
    print(f"\nplanted graph: {n_nodes} nodes, {len(edges)} edges, 60 planted communities")
    print("| algorithm | clusters found | top-cluster frac |")
    print("|---|---|---|")
    for name, fn in [
        ("louvain", louvain),
        ("leiden", leiden),
        ("label_propagation", label_propagation),
        ("modularity_optimization", modularity_optimization),
    ]:
        out = fn(df.select("u1", "u2")) if name == "label_propagation" else fn(df)
        pdf = out.toPandas()
        col = "community" if "community" in pdf.columns else pdf.columns[-1]
        s = stats_of(pdf[col])
        print(f"| {name} | {s['clusters']} | {s['top_frac']:.3f} |", flush=True)

    # true HDBSCAN* over FastRP embeddings of the planted graph — the
    # reference's exact pipeline shape (embed the graph, cluster the
    # embeddings with hierarchy/stability semantics)
    from echo_chambers_detection_spark.operators.graph import fastrp
    from echo_chambers_detection_spark.operators.hdbscan import hdbscan_cluster

    emb = fastrp(df, dim=32).withColumnRenamed("embedding", "vector")
    pdf = hdbscan_cluster(emb, min_pts=4, min_cluster_size=5, k=12).toPandas()
    s = stats_of(pdf["cluster"])
    print(
        f"| hdbscan (FastRP dim=32) | {s['clusters']} "
        f"| {s['top_frac']:.3f} | noise {s['noise_pct']:.1f}% |",
        flush=True,
    )


def main() -> None:
    spark = get_spark(app_name="characterize")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for qname, (ref_name, label_col) in REF.items():
        ref = pd.read_csv(f"/root/reference/{ref_name}_clusters.csv")
        rs = stats_of(ref["label"])
        df = QUERY_REGISTRY[qname].spark(spark, SF_DIR).toPandas()
        col = label_col if label_col in df.columns else df.columns[-1]
        os_ = stats_of(df[col])
        rows.append((qname, ref_name, rs, os_))
        print(f"{qname}: ours={os_} ref={rs}", flush=True)

    print("\n| query | ref artifact | ref clusters | ours | ref noise% | ours | ref top-cluster frac | ours |")
    print("|---|---|---|---|---|---|---|---|")
    for qname, ref_name, rs, os_ in rows:
        print(
            f"| `{qname}` | {ref_name}_clusters.csv ({rs['n']} users) "
            f"| {rs['clusters']} | {os_['clusters']} (of {os_['n']}) "
            f"| {rs['noise_pct']:.1f} | {os_['noise_pct']:.1f} "
            f"| {rs['top_frac']:.2f} | {os_['top_frac']:.2f} |"
        )
    run_planted(spark)


if __name__ == "__main__":
    main()
