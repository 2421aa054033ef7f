"""Vector math as native Catalyst array expressions (SURVEY.md F7-F9).

The reference's hottest defect is one sklearn cosine_similarity() call per
edge inside a Python loop (project/metrics/metrics.py:23-24,143-146).
Here every operation is a higher-order array function — zip_with /
aggregate / transform — evaluated JVM-side inside whole-stage codegen, so
per-edge Python disappears entirely.

All expressions compute in double precision regardless of the stored
element type (vectors are array<float> on disk — half the scan bytes of
double at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖), null-safe on zero vectors.

    Reference: sklearn cosine_similarity per edge
    (project/metrics/metrics.py:24,104,146; SURVEY.md F7)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """v / ‖v‖ with zero-vector guard: zero vectors pass through unchanged,
    matching the reference's l2_normalize
    (project/metrics/metrics_interface.py:53-55; SURVEY.md F8)."""
    col = _c(a)
    n = l2_norm(col)
    return F.when(n > 0, F.transform(col, lambda x: x.cast("double") / n)).otherwise(
        F.transform(col, lambda x: x.cast("double"))
    )


def squared_l2_distance(a: Column | str, b: Column | str) -> Column:
    """‖a−b‖² (reference np distance to centroid,
    project/metrics/metrics.py:49,179; SURVEY.md F9)."""
    return F.aggregate(
        F.zip_with(
            _c(a),
            _c(b),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def int8_quantize(a: Column | str) -> Column:
    """Symmetric per-vector int8 scalar quantization:
    struct(scale double, codes array<int>) with scale = max|x| / 127
    and codes = round(x / scale) ∈ [-127, 127] — a 4× memory cut for
    the embedding store, the first knob a 100 TB vector scan turns.
    Deterministic double arithmetic (IEEE division + half-away-from-
    zero round match DuckDB exactly), so the quantized search path is
    oracle-checkable, not just recall-tested. Zero vectors quantize to
    all-zero codes with scale 1."""
    v = _c(a)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    codes = F.transform(
        v, lambda x: F.round(x.cast("double") / scale, 0).cast("int")
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def int8_dequantize(q: Column | str) -> Column:
    """codes × scale back to array<double>; max elementwise error is
    scale/2 by construction (tests pin it)."""
    qq = _c(q)
    return F.transform(
        qq["codes"], lambda c: c.cast("double") * qq["scale"]
    )


# NOTE: centroids / mean embeddings aggregate in the exploded
# (id, dim, val) representation (operators/ann.py, operators/metrics.py)
# — an array-typed mean aggregate would funnel whole vectors through
# collect_list on one key and is deliberately not offered.
