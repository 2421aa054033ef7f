"""Single-query PQ-ADC probe against the persisted parquet index — no Spark.

The batch side persists the PQ index once (`operators/ann.py::
pq_index_build` -> `<path>/codebooks`, `<path>/codes` parquet) and
answers batch queries with `pq_topk_from_index` (ADC mapInPandas scan +
exact rerank). `PqProbe` is the serving-node twin of that path, the PQ
analogue of `IvfProbe` (same seam as the reference's standing Qdrant
collection, project/qdrant/consumer_post.py:42-49):

- load once per process via pyarrow: codebooks ((m, k, d/m) float64,
  KB-scale), the code table as one (n, m) int matrix, and the live
  vectors for the exact rerank;
- `probe_one(vector, k, refine)`: build the query's (m, k) ADC table
  (squared L2 per sub-centroid — cosine on normalized vectors is
  monotone in L2), score all codes with m table lookups (vectorized),
  keep refine·k candidates under the batch path's deterministic
  (adc, id) order, exact-cosine rerank with `cosine_topk` semantics —
  HALF_UP 6-digit rounding, (score desc, id asc), NULLS LAST.
  refine=None is exhaustive: every code row is a candidate, so the
  rerank provably returns the exact top-k (parity-tested against the
  batch `pq_topk_from_index` in tests/test_serving_probe.py).

Memory is what a serving shard holds anyway: codes are m bytes-ish per
vector (int codes), the rerank vectors n x d float64. At 100 TB the
code table shards by any partition column; the probe's per-shard state
stays proportional to the shard.
"""

from __future__ import annotations

import numpy as np

from echo_chambers_detection_spark.serving.ivf_probe import _round_half_up6


class PqProbe:
    """Resident PQ codebooks + codes + vectors; `probe_one` answers
    point queries without a Spark job.

    Parameters
    ----------
    index_path: directory written by `pq_index_build` (subdirs
        `codebooks`, `codes`).
    embeddings_path: parquet file/dir of the embedding table the index
        was built over (read for the exact rerank).
    id_col / vec_col: column names in the embeddings parquet.
    """

    def __init__(
        self,
        index_path: str,
        embeddings_path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        import os

        import pyarrow.parquet as pq

        book_tbl = pq.read_table(os.path.join(index_path, "codebooks"))
        subs = book_tbl.column("sub").to_pylist()
        cells = book_tbl.column("cell").to_pylist()
        cents = book_tbl.column("centroid").to_pylist()
        m = max(subs) + 1
        kc = max(cells) + 1
        dsub = len(cents[0])
        self.books = np.zeros((m, kc, dsub), dtype="float64")
        for s, c, v in zip(subs, cells, cents):
            self.books[s, c] = v

        code_tbl = pq.read_table(os.path.join(index_path, "codes"))
        code_cols = code_tbl.column_names
        cid_col = next(c for c in code_cols if c != "codes")
        self.code_ids = np.array(
            [str(i) for i in code_tbl.column(cid_col).to_pylist()],
            dtype=object,
        )
        self.codes = np.asarray(
            code_tbl.column("codes").to_pylist(), dtype="int64"
        )

        emb_tbl = pq.read_table(embeddings_path, columns=[id_col, vec_col])
        ids = [str(i) for i in emb_tbl.column(id_col).to_pylist()]
        vecs = emb_tbl.column(vec_col).to_pylist()
        self.vec_ids = np.array(ids, dtype=object)
        self.vectors = np.asarray(vecs, dtype="float64")
        self.norms = np.linalg.norm(self.vectors, axis=1)
        self._row_of = {rid: i for i, rid in enumerate(ids)}

    @property
    def m(self) -> int:
        return self.books.shape[0]

    def probe_one(
        self, vector, k: int = 10, refine: int | None = 4
    ) -> list[tuple[str, float]]:
        """Top-k (id, score) for one query vector — the serving twin of
        `pq_topk_from_index(..., refine=refine)`."""
        qv = np.asarray(vector, dtype="float64")
        qn = np.linalg.norm(qv)
        qdir = qv / qn if qn > 0 else qv
        dsub = self.books.shape[2]
        # (m, k) ADC table: squared L2 from each query sub-vector to
        # every sub-centroid — the batch path's exact expression
        table = np.stack(
            [
                (
                    (self.books[s] - qdir[s * dsub : (s + 1) * dsub][None, :])
                    ** 2
                ).sum(1)
                for s in range(self.m)
            ]
        )
        d = np.zeros(len(self.codes))
        for s in range(self.m):
            d += table[s][self.codes[:, s]]
        if refine is None:
            cand_ids = self.code_ids
        else:
            # the batch path's deterministic (adc, id) candidate order
            order = np.lexsort((self.code_ids, d))
            cand_ids = self.code_ids[order[: refine * k]]

        rows = [self._row_of[r] for r in cand_ids if r in self._row_of]
        x = self.vectors[rows]
        norms = self.norms[rows]
        denom = norms * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom > 0, (x @ qv) / denom, np.nan)
        ids = self.vec_ids[rows]
        scored = []
        for rid, s in zip(ids, scores):
            if np.isnan(s):
                scored.append((1, 0.0, rid, None))
            else:
                r = _round_half_up6(float(s))
                scored.append((0, -r, rid, r))
        scored.sort(key=lambda t: (t[0], t[1], t[2]))
        return [(rid, s) for _, _, rid, s in scored[:k]]
