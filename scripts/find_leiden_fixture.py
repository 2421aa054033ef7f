"""Search small graph families for a fixture where plain Louvain merges
two sparsely-bridged cliques into one community but Leiden keeps (or pulls)
them apart — the VERDICT item-6 test. Both algorithms are deterministic
(hash-parity synchronous moves, max-gain targets), so any hit here is a
stable regression fixture.

Families tried:
  A. two cliques (k1, k2) + b unit bridges (endpoints spread round-robin)
  B. ring of n cliques of size k, single bridges
  C. two cliques sharing a 2-path through a midpoint node
  D. two cliques + a hub node adjacent to h members of each
"""
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echo_chambers_detection_spark.session import get_spark
from echo_chambers_detection_spark.operators.graph import (
    leiden,
    louvain,
    weighted_modularity,
)


def clique(prefix, k):
    nodes = [f"{prefix}{i:02d}" for i in range(k)]
    return [(a, b, 1.0) for a, b in itertools.combinations(nodes, 2)], nodes


def run(spark, name, edges, groups):
    df = spark.createDataFrame(edges, "u1 string, u2 string, weight double")
    lv = {r["node"]: r["community"] for r in louvain(df).collect()}
    ld = {r["node"]: r["community"] for r in leiden(df).collect()}

    def labels(assign):
        return [frozenset(assign[n] for n in g) for g in groups]

    lv_l, ld_l = labels(lv), labels(ld)
    lv_merged = (
        all(len(s) == 1 for s in lv_l) and len(set().union(*lv_l)) < len(groups)
    )
    ld_sep = len({next(iter(s)) for s in ld_l if len(s) == 1}) == len(groups) and all(
        len(s) == 1 for s in ld_l
    )
    q_lv = weighted_modularity(
        df, spark.createDataFrame(list(lv.items()), "node string, community string")
    ).first()["q"]
    q_ld = weighted_modularity(
        df, spark.createDataFrame(list(ld.items()), "node string, community string")
    ).first()["q"]
    tag = "<<< HIT" if (lv_merged and ld_sep and q_ld >= q_lv - 1e-12) else ""
    print(
        f"{name}: louvain_merged={lv_merged} leiden_separated={ld_sep} "
        f"q_lv={q_lv:.4f} q_ld={q_ld:.4f} {tag}",
        flush=True,
    )
    return bool(tag)


def main():
    spark = get_spark(app_name="find-leiden-fixture", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    hits = []

    # family E — two cliques, single HEAVY bridge: at singleton init the
    # bridge endpoints' max-gain targets are each other, which can seed a
    # cross-clique community that greedy local moves then grow into a full
    # merge even when the separated partition has higher modularity.
    for k, w in [(5, 2.0), (5, 3.0), (5, 4.0), (6, 2.0), (6, 3.0), (6, 4.0), (7, 3.0), (7, 4.0)]:
        ea, na = clique("a", k)
        eb, nb = clique("b", k)
        edges = ea + eb + [(na[0], nb[0], w)]
        if run(spark, f"E k={k} w={w}", edges, [na, nb]):
            hits.append(("E", k, w))

    # family D — hub adjacent to h members of each clique
    for k, h in [(4, 2), (5, 2), (5, 3), (6, 3)]:
        ea, na = clique("a", k)
        eb, nb = clique("b", k)
        edges = ea + eb
        for i in range(h):
            edges.append((na[i], "hub", 1.0))
            edges.append(("hub", nb[i], 1.0))
        if run(spark, f"D k={k} h={h}", edges, [na, nb]):
            hits.append(("D", k, h))

    # family B — ring of cliques
    for n, k in [(3, 4), (4, 4), (5, 4)]:
        edges, groups = [], []
        for c in range(n):
            e, nodes = clique(f"r{c}", k)
            edges += e
            groups.append(nodes)
        for c in range(n):
            edges.append((groups[c][0], groups[(c + 1) % n][1], 1.0))
        if run(spark, f"B ring n={n} k={k}", edges, groups):
            hits.append(("B", n, k))

    print("HITS:", hits)


if __name__ == "__main__":
    main()
