"""Single-query navigable-graph beam search over the persisted k-NN
graph — no Spark. Completes the serving trio (IvfProbe cells, PqProbe
ADC codes, GraphAnnProbe graph walk), the same seam as the reference's
standing Qdrant collection (project/qdrant/consumer_post.py:42-49): the
batch side builds the k-NN graph once (`operators/hdbscan.knn_graph` /
`knn_graph_ann`, persisted as a plain (src, dst) parquet) and
`operators/graphann.graph_ann_topk` walks it per batch; this is the
point-query twin of that walk.

Semantics mirror `graph_ann_topk` exactly, step for step:

- entry at the binary-smallest node id (the batch default);
- each hop expands every out-neighbor of the CURRENT beam not already
  in the beam (a node dropped from the beam earlier may be re-scored —
  the batch left_anti is against the live frontier, not a visited set),
  scores by cosine, keeps top `beam` by (sim desc, node asc);
- early exit when a hop leaves the beam set unchanged (fixpoint: the
  next expansion would explore identical neighborhoods);
- hop bound defaults to ceil(log2 n) + beam like the batch operator;
- final top-k by (sim desc, node asc), HALF_UP 6-digit rounding —
  zero-norm vectors score None and sort last, the batch NULLS LAST.

Memory is the graph's adjacency (two int arrays) plus the vectors a
serving shard holds anyway. At 100 TB the k-NN graph shards by source
node; a shard's walker holds its nodes' adjacency + vectors and
forwards beam candidates that leave the shard — the standard
distributed-HNSW layout, and the reason the entry points are data
(`hub_entries`) rather than code.
"""

from __future__ import annotations

import numpy as np

from echo_chambers_detection_spark.serving.ivf_probe import _round_half_up6


class GraphAnnProbe:
    """Resident k-NN graph + vectors; `probe_one` answers point queries
    without a Spark job.

    Parameters
    ----------
    edges_path: parquet file/dir of the k-NN graph, columns
        (src, dst) — e.g. `knn_graph_ann(...)` output written by the
        batch side.
    embeddings_path: parquet file/dir of the embedding table.
    id_col / vec_col: column names in the embeddings parquet.
    """

    def __init__(
        self,
        edges_path: str,
        embeddings_path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        import pyarrow.parquet as pq

        emb_tbl = pq.read_table(embeddings_path, columns=[id_col, vec_col])
        ids = [str(i) for i in emb_tbl.column(id_col).to_pylist()]
        vecs = emb_tbl.column(vec_col).to_pylist()
        order = sorted(range(len(ids)), key=lambda r: ids[r])
        self.ids = [ids[r] for r in order]
        self.x = np.asarray([vecs[r] for r in order], dtype="float64")
        self.norms = np.linalg.norm(self.x, axis=1)
        self._row_of = {nid: r for r, nid in enumerate(self.ids)}

        e_tbl = pq.read_table(edges_path, columns=["src", "dst"])
        srcs = [str(s) for s in e_tbl.column("src").to_pylist()]
        dsts = [str(d) for d in e_tbl.column("dst").to_pylist()]
        adj: dict[int, list[int]] = {}
        for s, d in zip(srcs, dsts):
            rs, rd = self._row_of.get(s), self._row_of.get(d)
            if rs is not None and rd is not None:
                adj.setdefault(rs, []).append(rd)
        self.adj = {s: np.asarray(sorted(set(ds))) for s, ds in adj.items()}

    @property
    def n(self) -> int:
        return len(self.ids)

    def _score(self, rows: np.ndarray, q: np.ndarray, qn: float):
        sims = np.full(len(rows), np.nan)
        ok = (self.norms[rows] > 0) & (qn > 0)
        if ok.any():
            sub = rows[ok]
            sims[ok] = (self.x[sub] @ q) / (self.norms[sub] * qn)
        return sims

    def probe_one(
        self,
        vector,
        k: int = 10,
        beam: int = 16,
        hops: int | None = None,
    ) -> list[tuple[str, float | None]]:
        """Top-k (id, sim) for one query vector — `graph_ann_topk`
        semantics, pure numpy."""
        q = np.asarray(vector, dtype="float64")
        qn = float(np.linalg.norm(q))
        if hops is None:
            hops = max(1, (max(2, self.n) - 1).bit_length()) + beam

        def beam_sort(rows, sims):
            # (sim desc, node asc), NaN (null sim) last — the batch
            # DESC NULLS LAST + node tiebreak
            key = sorted(
                range(len(rows)),
                key=lambda i: (
                    np.isnan(sims[i]),
                    -(sims[i] if not np.isnan(sims[i]) else 0.0),
                    self.ids[rows[i]],
                ),
            )
            return [rows[i] for i in key], [sims[i] for i in key]

        entry = 0  # self.ids is sorted, row 0 IS the smallest id
        rows = [entry]
        sims = list(self._score(np.asarray(rows), q, qn))
        for _ in range(hops):
            in_beam = set(rows)
            cand = set()
            for r in rows:
                nbrs = self.adj.get(r)
                if nbrs is not None:
                    cand.update(int(d) for d in nbrs)
            cand -= in_beam
            if cand:
                new_rows = np.asarray(sorted(cand))
                new_sims = self._score(new_rows, q, qn)
                rows = rows + [int(r) for r in new_rows]
                sims = sims + list(new_sims)
            rows, sims = beam_sort(rows, sims)
            rows, sims = rows[:beam], sims[:beam]
            if set(rows) == in_beam:
                break
        out = []
        for r, s in zip(rows[:k], sims[:k]):
            out.append(
                (self.ids[r], None if np.isnan(s) else _round_half_up6(s))
            )
        return out
