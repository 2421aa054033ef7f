"""Property test for the shared vectorized k-NN kernel
(operators/hdbscan._rowwise_topk): against a brute-force (dist, dst)
selection on random matrices with deliberately heavy ties — the tie
regime is exactly where the pre-vectorization kernel was
shuffle-order-dependent (ADVICE r3). Pure numpy, no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from echo_chambers_detection_spark.operators.hdbscan import _rowwise_topk


@st.composite
def _case(draw):
    n_rows = draw(st.integers(1, 8))
    n_cols = draw(st.integers(1, 12))
    k = draw(st.integers(1, 6))
    # quantized values force ties; sprinkle infs (masked self/zero pairs)
    vals = draw(
        st.lists(
            st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0, np.inf]),
            min_size=n_rows * n_cols,
            max_size=n_rows * n_cols,
        )
    )
    d = np.array(vals, dtype="float64").reshape(n_rows, n_cols)
    # shuffled string ids (duplicated prefixes stress lexicographic order)
    ids = draw(st.permutations([f"id{i:03d}" for i in range(n_cols)]))
    rows = np.array([f"r{i:02d}" for i in range(n_rows)], dtype=object)
    return d, rows, np.array(ids, dtype=object), k


@given(_case())
@settings(max_examples=200, deadline=None)
def test_rowwise_topk_matches_bruteforce(case):
    d, rows, cols, k = case
    src, dst, dist = _rowwise_topk(d, rows, cols, k)
    got: dict[str, list] = {}
    for s, t, w in zip(src, dst, dist):
        got.setdefault(s, []).append((w, t))
    for i, r in enumerate(rows):
        want = sorted(
            (float(d[i, j]), cols[j])
            for j in range(d.shape[1])
            if np.isfinite(d[i, j])
        )[:k]
        assert got.get(r, []) == want, r


def test_rowwise_topk_empty_and_all_inf():
    rows = np.array(["a"], dtype=object)
    cols = np.array(["x", "y"], dtype=object)
    src, dst, dist = _rowwise_topk(
        np.full((1, 2), np.inf), rows, cols, 3
    )
    assert len(src) == len(dst) == len(dist) == 0
    src, dst, dist = _rowwise_topk(
        np.zeros((0, 0)), rows[:0], cols[:0], 3
    )
    assert len(src) == 0
