"""Deterministic domain-shaped fixtures (FIXTURES.md §B): the three
reference entities — exclusion_requests, objection_filings,
surrebuttals — with the reference's column names, key layout, and FK
graph (ER ←erid— OF ←ofid— SUR, reference config.py:32-56). Seed-fixed
pure-Python generation (no numpy RNG state), built as in-memory
DataFrames for the golden end-to-end pipeline test (SURVEY.md §5.4).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Real HTS codes from the reference's fan-out list (config.py:58-142 —
# a small representative subset).
HTS_CODES = (7304191080, 7304194060, 7304239000, 7306301000, 7210491000)
STATUSES = ("Posted", "In Review", "Granted", "Denied")
COUNTRIES = ("China", "Germany", "Japan", "Korea", "Turkey")

_ER_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.LongType(), False),
        T.StructField("Company", T.StringType()),
        T.StructField("Product", T.StringType()),
        T.StructField("HTSUSCode", T.LongType()),
        T.StructField("PublicStatus", T.StringType()),
        T.StructField("WindowClose", T.StringType()),
        T.StructField("PublishDate", T.StringType()),
        T.StructField("Minimum Thickness", T.DoubleType()),
        T.StructField("Maximum Thickness", T.DoubleType()),
        T.StructField("Minimum Inside Diameter", T.DoubleType()),
        T.StructField("Maximum Inside Diameter", T.DoubleType()),
        T.StructField(
            "Source Countries",
            T.ArrayType(T.StructType([T.StructField("OriginCountry", T.StringType())])),
        ),
        T.StructField("URL", T.StringType()),
    ]
)


def exclusion_requests(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(1, n + 1):
        min_t = round(rng.uniform(0.05, 0.5), 3)
        min_d = round(rng.uniform(1.0, 10.0), 3)
        rows.append(
            (
                i,
                f"Company {i % 97}",
                f"Steel product {i}",
                rng.choice(HTS_CODES),
                rng.choice(STATUSES),
                f"2020-{rng.randint(1, 12):02d}-15",
                f"2019-{rng.randint(1, 12):02d}-01",
                min_t,
                round(min_t + rng.uniform(0.01, 0.4), 3),
                min_d,
                round(min_d + rng.uniform(0.1, 5.0), 3),
                [(c,) for c in rng.sample(COUNTRIES, rng.randint(1, 3))],
                f"https://232app.example/request/{i}",
            )
        )
    return spark.createDataFrame(rows, _ER_SCHEMA)


_OF_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # lower-case: __main__.py:89
        T.StructField("erid", T.LongType()),
        T.StructField("organization", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("posted", T.StringType()),
    ]
)


def objection_filings(spark: SparkSession, n_er: int = 1000, seed: int = 43) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    oid = 0
    for erid in range(1, n_er + 1):
        for _ in range(rng.choice((0, 0, 1, 1, 2))):  # ~60% of ERs objected
            oid += 1
            rows.append(
                (
                    oid,
                    erid,
                    f"Org {oid % 31}",
                    rng.choice(("Submitted", "Posted")),
                    f"2019-{rng.randint(1, 12):02d}-20",
                )
            )
    return spark.createDataFrame(rows, _OF_SCHEMA)


def surrebuttals(spark: SparkSession, filings: DataFrame, seed: int = 44) -> DataFrame:
    """~30% of objection filings draw a surrebuttal. Selection is a
    deterministic per-row hash (xxhash64 mod 10 < 3), so generation is
    fully distributed — no driver-side iteration; ids come from a
    row_number (fixture-scale global window, never in a query path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sel = filings.filter(F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(10)) < 3).select(
        F.col("id").alias("ofid"), "erid"
    )
    sid = F.row_number().over(Window.orderBy("ofid")).cast("long")
    return sel.select(
        sid.alias("id"),
        "erid",
        "ofid",
        (sid * 7).alias("orid"),
        F.concat(F.lit("surrebuttal for OF "), F.col("ofid")).alias("text"),
    )
