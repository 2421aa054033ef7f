"""IVF coarse-quantizer ANN (operators/ann.py::ivf_index/ivf_topk):
determinism, exhaustive-probe exactness, pruned-probe recall and
candidate reduction on the sf0.001 embeddings."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from echo_chambers_detection_spark.operators.ann import (
    cosine_topk,
    ivf_index,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from echo_chambers_detection_spark.catalog import _emb

    return _emb(spark, SF).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def query(spark):
    from echo_chambers_detection_spark.catalog import _query_vec

    return _query_vec(spark, SF)


def test_ivf_index_deterministic_and_total(emb):
    a1 = {r["post_cid"]: r["cluster"] for r in ivf_index(emb, k=8, iters=2)[0].collect()}
    a2 = {r["post_cid"]: r["cluster"] for r in ivf_index(emb, k=8, iters=2)[0].collect()}
    assert a1 == a2
    assert len(a1) == emb.count()  # every vector lands in exactly one cell


def test_training_subset_bounded_and_deterministic(emb):
    """Sample-based quantizer training (VERDICT r5 #4): the hash-gated
    subset is ~cap-sized, a pure function of the ids (repartitioning
    must not change membership), and a cap >= n is the identity."""
    from echo_chambers_detection_spark.operators.ann import (
        _training_subset,
        l2_normalize,
    )

    norm = emb.select(
        F.col("post_cid").alias("_id"), l2_normalize("vector").alias("_vec")
    )
    n = norm.count()
    full, sampled = _training_subset(norm, n + 10)
    assert not sampled and full is norm
    cap = max(10, n // 4)
    sub, sampled = _training_subset(norm, cap)
    assert sampled
    ids1 = {r["_id"] for r in sub.select("_id").collect()}
    assert 0 < len(ids1) <= 2 * cap
    sub2, _ = _training_subset(norm.repartition(7), cap)
    assert {r["_id"] for r in sub2.select("_id").collect()} == ids1


def test_ivf_sampled_training_exhaustive_probe_still_exact(emb, query):
    """Exhaustive probe is training-invariant: even a tiny training
    sample must return the exact top-k when every cell is probed."""
    exact = [
        (r["post_cid"], r["score"])
        for r in cosine_topk(emb, query, k=10).collect()
    ]
    got = [
        (r["post_cid"], r["score"])
        for r in ivf_topk(
            emb, query, k_results=10, n_cells=8, nprobe=8, iters=2,
            train_cap=50,
        ).collect()
    ]
    assert got == exact


def test_ivf_exhaustive_probe_equals_exact(emb, query):
    exact = [(r["post_cid"], r["score"]) for r in cosine_topk(emb, query, k=10).collect()]
    ivf = [
        (r["post_cid"], r["score"])
        for r in ivf_topk(emb, query, k_results=10, n_cells=8, nprobe=8, iters=2).collect()
    ]
    assert ivf == exact


def test_ivf_pruned_probe_recall_and_reduction(emb, query):
    exact_ids = {r["post_cid"] for r in cosine_topk(emb, query, k=10).collect()}
    got = ivf_topk(emb, query, k_results=10, n_cells=8, nprobe=2, iters=2)
    got_ids = {r["post_cid"] for r in got.collect()}
    recall = len(exact_ids & got_ids) / len(exact_ids)
    # the query cell plus one neighbor must hold most of the true top-10
    assert recall >= 0.5, recall
    # candidate reduction: probing 2 of 8 cells scans well under half
    assignments, _ = ivf_index(emb, k=8, iters=2)
    sizes = {r["cluster"]: r["n"] for r in assignments.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    probed = sum(sorted(sizes.values(), reverse=True)[:2])
    assert probed < 0.75 * sum(sizes.values())


def test_ivf_persisted_index_probe_only(emb, query, tmp_path):
    """Build-once/probe-many (VERDICT r3 #2): ivf_index_build persists
    centroids + assignments; ivf_topk_from_index with exhaustive probe
    reproduces the exact top-k, and a second probe against the same
    index needs no rebuild (same results, no Lloyd pass — the index
    directory is untouched)."""
    import os

    from echo_chambers_detection_spark.operators.ann import (
        ivf_index_build,
        ivf_topk_from_index,
    )

    idx = str(tmp_path / "ivf")
    ivf_index_build(emb, idx, n_cells=8, iters=2)
    assert os.path.exists(os.path.join(idx, "centroids"))
    assert os.path.exists(os.path.join(idx, "assignments", "_SUCCESS"))

    exact = [
        (r["post_cid"], r["score"])
        for r in cosine_topk(emb, query, k=10).collect()
    ]
    got1 = [
        (r["post_cid"], r["score"])
        for r in ivf_topk_from_index(
            emb, idx, query, k_results=10, nprobe=8
        ).collect()
    ]
    assert got1 == exact
    mtimes = {
        f: os.path.getmtime(os.path.join(idx, "assignments", f))
        for f in os.listdir(os.path.join(idx, "assignments"))
    }
    got2 = [
        (r["post_cid"], r["score"])
        for r in ivf_topk_from_index(
            emb, idx, query, k_results=10, nprobe=2
        ).collect()
    ]
    # pruned probe: still k results, with a concrete recall floor
    # against the exact top-10 (ADVICE r4: the old disjunction was
    # vacuously true) — nprobe=2 of 8 cells on this clustered fixture
    # keeps the query's own cell, so most of the head survives
    assert len(got2) == 10
    assert len(set(got2) & set(exact)) >= 6
    assert mtimes == {
        f: os.path.getmtime(os.path.join(idx, "assignments", f))
        for f in os.listdir(os.path.join(idx, "assignments"))
    }, "probe-only query rewrote the index"


def test_ivf_probe_matches_inline_ivf(emb, query, tmp_path):
    """The persisted-index path and the inline ivf_topk agree in the
    exhaustive configuration (same quantizer, same rerank)."""
    from echo_chambers_detection_spark.operators.ann import (
        ivf_index_build,
        ivf_topk_from_index,
    )

    idx = str(tmp_path / "ivf2")
    ivf_index_build(emb, idx, n_cells=8, iters=2)
    a = [
        tuple(r)
        for r in ivf_topk_from_index(
            emb, idx, query, k_results=10, nprobe=8
        ).collect()
    ]
    b = [
        tuple(r)
        for r in ivf_topk(
            emb, query, k_results=10, n_cells=8, nprobe=8, iters=2
        ).collect()
    ]
    assert a == b


def test_pq_train_deterministic_and_shapes(emb):
    from echo_chambers_detection_spark.operators.ann import pq_train

    b1, c1 = pq_train(emb, m=8, k=8, iters=2)
    b2, c2 = pq_train(emb, m=8, k=8, iters=2)
    assert b1.shape == (8, 8, 8)  # 64-d embeddings, 8 subspaces
    assert (b1 == b2).all()
    codes1 = {r["post_cid"]: r["codes"] for r in c1.collect()}
    codes2 = {r["post_cid"]: r["codes"] for r in c2.collect()}
    assert codes1 == codes2
    assert all(len(v) == 8 for v in codes1.values())
    assert all(0 <= x < 8 for v in codes1.values() for x in v)


def test_pq_topk_recall_vs_float(emb, query):
    """PQ-ADC + exact rerank: >= 7 of the float top-10 survive at
    refine=8 on the sf0.001 embeddings — RANDOM vectors, PQ's
    hardest regime (no cluster structure for the codebooks to model),
    so this is the floor of the quality contract, not the typical."""
    from echo_chambers_detection_spark.operators.ann import pq_topk

    exact_ids = [r["post_cid"] for r in cosine_topk(emb, query, k=10).collect()]
    got = pq_topk(
        emb, query, k_results=10, m=8, n_centroids=16, iters=2, refine=8
    )
    got_ids = [r["post_cid"] for r in got.collect()]
    assert len(set(exact_ids) & set(got_ids)) >= 7, (exact_ids, got_ids)
    # reranked scores are EXACT cosine, so any overlap agrees exactly
    exact_scores = dict(
        (r["post_cid"], r["score"])
        for r in cosine_topk(emb, query, k=1000).collect()
    )
    for r in got.collect():
        assert exact_scores[r["post_cid"]] == r["score"]


def test_pq_persisted_index_matches_inline(emb, query, tmp_path):
    """pq_index_build + pq_topk_from_index returns exactly what the
    inline train+search does at the same parameters, and the probe
    does not touch the stored index."""
    import os

    from echo_chambers_detection_spark.operators.ann import (
        pq_index_build,
        pq_topk,
        pq_topk_from_index,
    )

    idx = str(tmp_path / "pq")
    pq_index_build(emb, idx, m=8, k=8, iters=2)
    assert os.path.exists(os.path.join(idx, "codebooks"))
    assert os.path.exists(os.path.join(idx, "codes", "_SUCCESS"))
    a = [
        tuple(r)
        for r in pq_topk_from_index(
            emb, idx, query, k_results=10, refine=4
        ).collect()
    ]
    b = [
        tuple(r)
        for r in pq_topk(
            emb, query, k_results=10, m=8, n_centroids=8, iters=2, refine=4
        ).collect()
    ]
    assert a == b and len(a) == 10


def test_pq_exhaustive_refine_equals_exact(emb, query):
    """refine=None (the oracle configuration, VERDICT r4 #1): every
    ADC-scored code row survives to the exact rerank, so PQ returns
    the true cosine top-k bit-for-bit — the PQ analogue of IVF's
    nprobe=n_cells exhaustive probe."""
    from echo_chambers_detection_spark.operators.ann import pq_topk

    exact = [
        (r["post_cid"], r["score"])
        for r in cosine_topk(emb, query, k=10).collect()
    ]
    got = [
        (r["post_cid"], r["score"])
        for r in pq_topk(
            emb, query, k_results=10, m=8, n_centroids=8, iters=2,
            refine=None,
        ).collect()
    ]
    assert got == exact
