"""Property tests for the numpy kernels behind the small-graph fast path
(operators/localgraph.py). No SparkSession — these pin the kernels
against independent reference formulations so the distributed-vs-local
parity suite (test_local_graph_parity.py) rests on audited primitives.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from echo_chambers_detection_spark.operators.localgraph import (
    _group_sum,
    _segment_argmax,
    connected_components_local,
    kcore_local,
)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=199), max_size=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_group_sum_dense_matches_sort_path(keys, seed):
    rng = np.random.default_rng(seed)
    key = np.array(keys, dtype=np.int64)
    w = rng.uniform(-5, 5, len(key))
    uk_sort, ws_sort = _group_sum(key, w)  # sort path (no size)
    uk_dense, ws_dense = _group_sum(key, w, size=200)
    assert np.array_equal(uk_sort, uk_dense)
    # identical summation values: both paths add the same float64 terms
    # (bincount and reduceat may order adds differently, so allow ulps)
    np.testing.assert_allclose(ws_sort, ws_dense, rtol=1e-12, atol=1e-12)


@given(
    n_groups=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_segment_argmax_matches_lexsort_reference(n_groups, seed):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(1, 6, n_groups)
    g_src = np.repeat(np.sort(rng.choice(100, n_groups, replace=False)), sizes)
    k = len(g_src)
    # coarse score grid so ties actually occur
    score = rng.integers(0, 3, k).astype(np.float64)
    g_nbr = rng.integers(0, 50, k).astype(np.int64)

    nodes, best = _segment_argmax(g_src, score, g_nbr)

    o2 = np.lexsort((g_nbr, score, g_src))
    gs = g_src[o2]
    last = np.r_[gs[1:] != gs[:-1], True]
    assert np.array_equal(nodes, gs[last])
    assert np.array_equal(best, g_nbr[o2][last])


def _random_sym_edges(rng, n, p):
    """Symmetrized directed rows [(src, dst, 1.0)] over string ids."""
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                a, b = f"v{i:03d}", f"v{j:03d}"
                rows.append((a, b, 1.0))
                rows.append((b, a, 1.0))
    return rows


def _kcore_reference(rows):
    """Textbook peel incrementing k by exactly 1 — an independent
    formulation of core numbers (no min-degree jumping, no orphan
    subtlety: the inner loop re-checks degrees until stable at each k)."""
    adj: dict[str, set[str]] = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
    core = {}
    alive = set(adj)
    k = 0
    while alive:
        k += 1
        while True:
            low = {v for v in alive if len(adj[v] & alive) < k}
            if not low:
                break
            for v in low:
                core[v] = k - 1
            alive -= low
    return core


@pytest.mark.parametrize("seed,p", [(0, 0.08), (1, 0.2), (2, 0.5), (3, 0.02)])
def test_kcore_local_matches_incremental_peel(seed, p):
    rng = np.random.default_rng(seed)
    rows = _random_sym_edges(rng, 40, p)
    if not rows:
        pytest.skip("empty graph draw")
    assert kcore_local(rows) == _kcore_reference(rows)


@pytest.mark.parametrize("seed,p", [(0, 0.03), (1, 0.08), (2, 0.15)])
def test_connected_components_local_matches_bfs(seed, p):
    rng = np.random.default_rng(seed)
    rows = _random_sym_edges(rng, 60, p)
    if not rows:
        pytest.skip("empty graph draw")
    adj: dict[str, set[str]] = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
    expect = {}
    for start in sorted(adj):
        if start in expect:
            continue
        stack, seen = [start], {start}
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        root = min(seen)
        for v in seen:
            expect[v] = root
    assert connected_components_local(rows) == expect
