"""Vector (embedding) column functions for similarity search (B13).

Embeddings are `array<float>` columns. All math is expressed with
higher-order Catalyst functions (zip_with / aggregate) upcast to double
— JVM-side, codegen'd, no Python. A vectorized pandas-UDF variant is
provided for wide batch scoring where Arrow transfer + numpy BLAS wins
(hundreds of dims × millions of rows).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    """Dot product with left-to-right double accumulation (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; try_divide so a ZERO vector (all-zeros padding
    row — crawls contain them) scores NULL instead of killing the whole
    query with an ANSI DIVIDE_BY_ZERO (Spark 4 ANSI throws even for
    double division). NULL sorts last under desc ordering, so zero
    vectors simply never rank."""
    return F.try_divide(dot(a, b), norm2(a) * norm2(b))


def cosine_pandas():
    """Arrow-vectorized cosine for the numpy fast path (lazy: pandas_udf
    creation needs an active SparkSession). Zero vectors score NULL,
    matching cosine()'s try_divide contract — returning numpy's raw NaN
    would INVERT it, since Spark orders NaN greater than every double
    (NaN ranks first in desc top-k and passes >= thresholds)."""

    @pandas_udf("double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        num = (av * bv).sum(axis=1)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
        # nullable Float64 so non-finite → true NULL through Arrow (a
        # plain float series would silently turn None back into NaN)
        res = pd.array(out, dtype="Float64")
        res[~np.isfinite(out)] = pd.NA
        return pd.Series(res, dtype="Float64")

    return _udf
