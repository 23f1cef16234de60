"""Vector math over ``array<float|double>`` columns — pure higher-order
functions (SURVEY.md §2B Q68). JVM-side ``zip_with``/``aggregate``: no
Python boundary, so a 100 TB embedding sweep stays in codegen."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product summed — computed in double."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 scalar quantization of a float vector: q_i =
    round(127 · x_i / max|x|) ∈ [-127, 127], with the per-vector scale
    alongside — the standard 4× embedding-storage compression whose
    dot products stay within ~1% for similarity work.  Returns a struct
    (codes: array<tinyint>, scale: float max|x|).  Pure expression
    (aggregate for the absmax + one transform); zero-vector safe
    (scale 0 → all-zero codes)."""
    v = _col(a)
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    codes = F.transform(
        v,
        lambda x: F.when(absmax > 0, F.round(x * 127.0 / absmax))
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return F.struct(codes.alias("codes"), absmax.alias("scale"))


def dequantize_int8(q: Column | str) -> Column:
    """Inverse of :func:`quantize_int8`: x̂_i = codes_i · scale / 127."""
    s = _col(q)
    return F.transform(s["codes"], lambda c: c * s["scale"] / 127.0)


def quantization_mse(v: Column | str, q: Column | str) -> Column:
    """Mean squared reconstruction error of an int8-quantized vector."""
    err = F.zip_with(_col(v), dequantize_int8(q), lambda x, y: (x - y) * (x - y))
    return F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / F.size(_col(v))
