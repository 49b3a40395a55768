"""Embedding-column maintenance: L2 normalization and int8 quantization.

At 100 TB an ``array<float>`` embedding column is usually the widest thing
in the table; symmetric per-vector int8 quantization cuts it 4× (plus one
float scale per row) at a bounded cosine error, and pre-normalization turns
cosine into dot product for every consumer downstream.

Kernels are Arrow-batched numpy (``pandas_udf``) for the same reason as
``similarity.py``: Spark's higher-order array functions never enter
whole-stage codegen and walk an interpreter per element, so one vectorized
numpy op per Arrow batch is the hot-path shape.  Every output row depends
only on its own input row — deterministic under any partitioning, no
shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    FloatType,
    StructField,
    StructType,
)

from .similarity import _stack_f64


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Unit-norm each vector (float32 storage, float64 math).  Zero vectors
    pass through unchanged — there is no direction to normalize onto, and
    NaNs would poison every downstream dot product."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _norm(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype=object)
        M = _stack_f64(xs)
        n = np.linalg.norm(M, axis=1, keepdims=True)
        out = np.divide(M, n, out=M.copy(), where=n > 0).astype(np.float32)
        return pd.Series(list(out))

    return df.withColumn(out_col or vec_col, _norm(F.col(vec_col)))


_QUANT_SCHEMA = StructType(
    [
        StructField("q", ArrayType(ByteType())),
        StructField("scale", FloatType()),
    ]
)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_q8"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = round(x / scale)`` with
    ``scale = max(|x|) / 127`` — output struct (q: array<tinyint>,
    scale: float); ``dequantize_int8`` inverts it as ``q * scale``.

    Per-element reconstruction error is ≤ scale/2 by construction (round to
    nearest), which the tests assert together with a cosine-preservation
    bound.  All-zero vectors quantize to scale 0 and reconstruct exactly.
    """

    @F.pandas_udf(_QUANT_SCHEMA)
    def _quant(xs: pd.Series) -> pd.DataFrame:
        if len(xs) == 0:
            return pd.DataFrame({"q": pd.Series([], dtype=object), "scale": []})
        M = _stack_f64(xs)
        scale = np.abs(M).max(axis=1) / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.rint(M / safe[:, None]).astype(np.int8)
        return pd.DataFrame(
            {"q": list(q), "scale": scale.astype(np.float32)}
        )

    return df.withColumn(out_col, _quant(F.col(vec_col)))


def dequantize_int8(
    df: DataFrame, q_col: str = "embedding_q8", out_col: str = "embedding_deq"
) -> DataFrame:
    """Reconstruct float32 vectors from (q, scale) structs."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _deq(qs: pd.Series, scales: pd.Series) -> pd.Series:
        if len(qs) == 0:
            return pd.Series([], dtype=object)
        Q = np.stack(qs.to_numpy()).astype(np.float64)
        out = (Q * scales.to_numpy()[:, None]).astype(np.float32)
        return pd.Series(list(out))

    return df.withColumn(out_col, _deq(F.col(f"{q_col}.q"), F.col(f"{q_col}.scale")))
