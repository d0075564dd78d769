#!/usr/bin/env python
"""Dump explain('formatted') for BUILD-SIDE lifecycle frames that the
registered queries execute eagerly at construction (the returned
query plan never shows them): the persisted-IVF assignment routing and
an atomic-table upsert merge. Written to plans/r14/<name>_<tag>.txt.

Usage: python tools/dump_lifecycle_plans.py <tag>
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stupp_exclusion_etl_spark.operators.ann_index import (  # noqa: E402
    PersistedIvfIndex,
)
from stupp_exclusion_etl_spark.session import get_spark  # noqa: E402
from stupp_exclusion_etl_spark.sinks.atomic import (  # noqa: E402
    AtomicParquetTable,
)


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-lifecycle-plans")
    sf = "/root/testdata/sf0.01"
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = tempfile.mkdtemp(prefix="dlp_")
    corpus = AtomicParquetTable(spark, root + "/corpus", keys=["vec_id"])
    corpus.upsert(
        e.filter(F.col("vec_id") % 50 != 7).withColumn(
            "ts", F.lit(0).cast("long")
        ),
        [F.col("ts").desc()],
    )
    idx = PersistedIvfIndex(
        spark, root + "/corpus", root + "/index",
        k_cells=8, n_probe=3, trainer="modmean",
    )
    idx.build()
    # the routing frame a refresh/build executes for every vector
    assign_df = idx._assign(corpus.read().select("vec_id", "embedding"))
    with open(os.path.join(out_dir, f"ann_assign_{tag}.txt"), "w") as fh:
        fh.write(explain_str(assign_df))
    print("wrote", f"ann_assign_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
