"""Property-based check of the community mirrors on disjoint clique
unions — the provable-optimum family behind the clique-modules oracle
trio (catalog/graph.py::_clique_modules_edges). On a disjoint union of
cliques the modularity optimum is exactly one community per clique
(cross-component merges strictly lose modularity; a minority side of
any within-clique split always gains by joining the majority), so
louvain_local / leiden_local / modularity_local must return
{node: min clique member} for ANY clique layout, any label
permutation. The mirrors share move-schedule semantics with the
distributed loops (tests/test_local_graph_parity.py), so this pins the
operator family transitively; the catalog trio pins the distributed
paths directly against DuckDB."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from echo_chambers_detection_spark.operators.localgraph import (
    leiden_local,
    louvain_local,
    modularity_local,
)


@st.composite
def clique_layout(draw):
    sizes = draw(st.lists(st.integers(2, 7), min_size=1, max_size=5))
    n = sum(sizes)
    # permute the label space so clique membership is uncorrelated with
    # string order — min-member canonicalization must hold regardless
    perm = draw(st.permutations(list(range(n))))
    labels = [f"n{perm[i]:02d}" for i in range(n)]
    cliques, at = [], 0
    for s in sizes:
        cliques.append(labels[at : at + s])
        at += s
    return cliques


def _sym_rows(cliques):
    rows = []
    for members in cliques:
        for i, u in enumerate(members):
            for v in members[i + 1 :]:
                rows.append((u, v, 1.0))
                rows.append((v, u, 1.0))
    return pd.DataFrame(rows, columns=["src", "dst", "weight"])


def _expected(cliques):
    return {u: min(members) for members in cliques for u in members}


@pytest.mark.parametrize(
    "runner",
    [
        pytest.param(
            lambda rows, m: louvain_local(rows, m, 3, 8), id="louvain"
        ),
        pytest.param(
            lambda rows, m: leiden_local(rows, m, 3, 8), id="leiden"
        ),
        pytest.param(
            lambda rows, m: modularity_local(rows, m, 8), id="modopt"
        ),
    ],
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(cliques=clique_layout())
def test_clique_union_reaches_provable_optimum(runner, cliques):
    rows = _sym_rows(cliques)
    m = float(rows["weight"].sum()) / 2.0
    got = runner(rows, m)
    assert got == _expected(cliques)
