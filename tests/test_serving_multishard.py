"""Multi-shard serving topology (VERDICT r11 #7): TWO OS processes,
each holding a DISJOINT cell shard of one IVF index (same centroids,
assignments split by cell id), behind a thin fan-out client that
queries both over real sockets and merges top-k. The merged answer
must reproduce the single-index batch `ivf_topk` ids AND scores —
proving the cell-keyed layout's claim that the shard split is a
partition filter (the reference's scaled-out Qdrant role)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import urllib.request

import pytest

SF = "/root/testdata/sf0.001"
EMB_PARQUET = SF + "/embeddings.parquet"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CELLS = 16


@pytest.fixture(scope="module")
def emb(spark):
    from echo_chambers_detection_spark.catalog import _emb

    return _emb(spark, SF).localCheckpoint(eager=True)


def _split_index(full_idx: str, out_root: str) -> list[str]:
    """Write two shard index dirs: full centroids (every shard routes
    over the whole codebook), assignments filtered to a disjoint half
    of the cells — the 'shard split = partition filter' layout."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cent = pq.read_table(os.path.join(full_idx, "centroids"))
    assign = pq.read_table(os.path.join(full_idx, "assignments"))
    shards = []
    for name, keep in (
        ("shard_lo", pc.less(assign.column("cluster"), N_CELLS // 2)),
        (
            "shard_hi",
            pc.greater_equal(assign.column("cluster"), N_CELLS // 2),
        ),
    ):
        d = os.path.join(out_root, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(cent, os.path.join(d, "centroids"))
        pq.write_table(assign.filter(keep), os.path.join(d, "assignments"))
        shards.append(d)
    return shards


@pytest.fixture(scope="module")
def shard_ports(emb, tmp_path_factory):
    from echo_chambers_detection_spark.operators.ann import ivf_index_build

    root = str(tmp_path_factory.mktemp("multishard"))
    full_idx = os.path.join(root, "full")
    ivf_index_build(emb, full_idx, n_cells=N_CELLS, iters=2)
    procs, ports = [], []
    try:
        for shard in _split_index(full_idx, root):
            proc = subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "echo_chambers_detection_spark.serving.http_api",
                    "--ivf",
                    f"ivf={shard},{EMB_PARQUET}",
                ],
                cwd=REPO,
                stdout=subprocess.PIPE,
                text=True,
            )
            procs.append(proc)
            line = proc.stdout.readline()
            assert line, "shard server died before binding"
            ports.append(json.loads(line)["port"])
        yield ports
    finally:
        for proc in procs:
            proc.send_signal(signal.SIGTERM)
        for proc in procs:
            proc.wait(timeout=10)


def _search(port: int, vector, k: int, nprobe: int):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search",
        data=json.dumps(
            {"index": "ivf", "vector": vector, "k": k, "nprobe": nprobe}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        return json.loads(resp.read())["results"]


def _fanout_topk(ports, vector, k: int) -> list[dict]:
    """The thin merge client: local top-k from every shard (exhaustive
    nprobe — each shard only holds its own cells, extra probes hit
    empty slots), then one global re-sort with the batch cosine_topk
    ordering (score desc, NULLs last, id asc)."""
    cands = []
    for port in ports:
        cands.extend(_search(port, vector, k, nprobe=N_CELLS))
    cands.sort(
        key=lambda r: (
            r["score"] is None,
            -(r["score"] or 0.0),
            r["id"],
        )
    )
    return cands[:k]


def _qvec():
    import pyarrow.parquet as pq

    t = pq.read_table(EMB_PARQUET, columns=["vec_id", "embedding"])
    for rid, v in zip(
        t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
    ):
        if str(rid) == "0":
            return v
    raise AssertionError("vec_id=0 missing from test embeddings")


def test_shards_are_disjoint_and_complete(shard_ports):
    """Every indexed id lives in exactly one shard: per-shard k=10000
    sweeps must partition the candidate set."""
    qv = _qvec()
    seen: dict[str, int] = {}
    for port in shard_ports:
        for r in _search(port, qv, k=100_000, nprobe=N_CELLS):
            assert r["id"] not in seen, f"id {r['id']} in two shards"
            seen[r["id"]] = port
    import pyarrow.parquet as pq

    n_indexed = pq.read_table(EMB_PARQUET, columns=["vec_id"]).num_rows
    assert len(seen) == n_indexed


def test_fanout_merge_matches_single_index_batch(spark, emb, shard_ports):
    """Fan-out + merge over the two shard PROCESSES == the batch
    single-index ivf_topk top-10, ids and scores exact."""
    from echo_chambers_detection_spark.catalog import _query_vec
    from echo_chambers_detection_spark.operators.ann import ivf_topk

    batch = [
        {"id": r["post_cid"], "score": r["score"]}
        for r in ivf_topk(
            emb,
            _query_vec(spark, SF),
            k_results=10,
            n_cells=N_CELLS,
            nprobe=N_CELLS,
            iters=2,
        ).collect()
    ]
    merged = _fanout_topk(shard_ports, _qvec(), k=10)
    assert merged == batch
