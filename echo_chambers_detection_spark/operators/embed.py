"""Sentence-embedding inference (SURVEY.md F12/G9) — the one place the
reference genuinely needs a model: SentenceTransformer(...).encode(text)
per message inside the Qdrant consumer
(project/qdrant/consumer_post.py:36,91; model via env SENTENCE_MODEL,
384-d MiniLM-class).

Spark-first shape: an Arrow-batched mapInPandas stage so the model runs
once per executor on whole batches (predict_batch_udf-style), not once
per record like the reference's consumer loop. sentence-transformers is
not in this container, so:

- `encode_batch_real` raises NotImplementedError with the intended body;
- `encode_batch_fake` is a deterministic hash-based stand-in (stable
  tokens -> stable vectors, cosine of identical texts = 1) so the
  pipeline around inference — batching, schema, normalization, writes —
  is fully real and tested.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

EMBED_DIM = 32  # reference uses 384; fake keeps tests cheap

EMBEDDED_SCHEMA = T.StructType(
    [
        T.StructField("post_cid", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)


_REAL_MODEL_CACHE: dict = {}


def encode_batch_real(
    texts: list[str], model_name: str = "all-MiniLM-L6-v2"
) -> list[list[float]]:
    """Sentence-transformer inference (reference
    project/qdrant/consumer_post.py:36,91), memoized per executor
    process. Import-guarded seam (VERDICT r2 #7): uses the real library
    when installed; this container doesn't ship it, so the pipeline
    default stays `encode_batch_fake` and
    tests/test_embed_and_csv.py importorskips the real path."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as exc:  # container default — see docstring
        raise NotImplementedError(
            "sentence-transformers is not installed; "
            "use encode_batch_fake for the pipeline path"
        ) from exc
    model = _REAL_MODEL_CACHE.get(model_name)
    if model is None:
        model = _REAL_MODEL_CACHE[model_name] = SentenceTransformer(model_name)
    return model.encode(list(texts), batch_size=max(1, len(texts))).tolist()


def encode_batch_fake(texts: list[str], dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic bag-of-hashed-tokens embedding, L2-normalized.
    Same text -> same vector; token-overlapping texts -> high cosine.
    Pure Python/stdlib so it runs identically on every executor."""
    out = []
    for text in texts:
        vec = [0.0] * dim
        for tok in (text or "").lower().split():
            h = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[:8], "big"
            )
            vec[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        norm = math.sqrt(sum(x * x for x in vec))
        if norm > 0:
            vec = [x / norm for x in vec]
        out.append(vec)
    return out


def embed_texts(
    docs: DataFrame,
    id_col: str = "post_cid",
    text_col: str = "text",
    dim: int = EMBED_DIM,
    encoder: str = "fake",
) -> DataFrame:
    """Arrow-batched inference stage: (id, text) -> (post_cid, text,
    vector). One Python roundtrip per Arrow batch; the model amortizes
    across the batch — the scale shape of
    pyspark.ml.functions.predict_batch_udf.

    encoder: 'fake' (deterministic, container default — the oracle-checked
    catalog path pins this), 'real' (sentence-transformers, raises where
    the library is absent), or 'auto' (real when importable, else fake).
    """
    if encoder not in ("fake", "real", "auto"):
        raise ValueError(f"encoder must be fake|real|auto, got {encoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mode = encoder
        if mode == "auto":
            try:
                import sentence_transformers  # noqa: F401

                mode = "real"
            except ImportError:
                mode = "fake"
        for pdf in batches:
            texts = list(pdf[text_col].fillna(""))
            if mode == "real":
                vecs = encode_batch_real(texts)
                if vecs and len(vecs[0]) != dim:
                    # the model's native width wins or nothing does —
                    # silently shipping 384-wide vectors into a dim=64
                    # pipeline (GEMM tiles, LSH planes) must not happen
                    raise ValueError(
                        f"real encoder produced dim={len(vecs[0])} but "
                        f"dim={dim} was requested; pass the model's "
                        "native dimension explicitly"
                    )
            else:
                vecs = encode_batch_fake(texts, dim)
            yield pd.DataFrame(
                {
                    "post_cid": pdf[id_col].astype(str),
                    "text": pdf[text_col],
                    "vector": vecs,
                }
            )

    return docs.select(
        docs[id_col].alias(id_col), docs[text_col].alias(text_col)
    ).mapInPandas(run, schema=EMBEDDED_SCHEMA)
