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


def encode_batch_real(texts: list[str]) -> list[list[float]]:
    """Intended body (requires sentence-transformers):
        model = _get_cached_model(os.environ['SENTENCE_MODEL'])
        return model.encode(texts, batch_size=len(texts)).tolist()
    with `_get_cached_model` memoized per executor process."""
    raise NotImplementedError(
        "sentence-transformers is not in this container; "
        "use encode_batch_fake for the pipeline path"
    )


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
) -> DataFrame:
    """Arrow-batched inference stage: (id, text) -> (post_cid, text,
    vector). One Python roundtrip per Arrow batch; the model (here the
    fake) amortizes across the batch — the scale shape of
    pyspark.ml.functions.predict_batch_udf."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = encode_batch_fake(list(pdf[text_col].fillna("")), dim)
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
