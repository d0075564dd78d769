#!/usr/bin/env python
"""Regenerate PLANS.md: `explain('formatted')` of the headline queries
at sf0.001, each with a one-line reading of why the plan is the one
you'd want at 100 TB. Run from the repo root:

    python tools/gen_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

#: query -> one-line plan reading (shown under each heading).
BLURBS = {
    "flagship_code_revenue": "Broadcast the filtered dimension, partial agg before the one shuffle, TakeOrderedAndProject top-K.",
    "join_fk_chain": "Two broadcast joins — the lineitem fact table is never shuffled; only the distinct-count agg exchanges.",
    "dedup_minhash_lsh": "One explicit repartition for CPU spread, signature agg reuses it (zero extra exchange); candidates from an equi-join, no cartesian.",
    "sim_cosine_topk": "Broadcast query vector with precomputed norm; TakeOrderedAndProject, no global sort.",
    "events_tumbling_window": "Windowed hash agg with map-side partials over the ns-shimmed scan.",
    "corpus_hash_split": "Zero-shuffle map-only projection: md5-bucket split is a per-row expression on the scan.",
    "corpus_stratified_sample": "Per-language keep-rate filter evaluated in the scan's DataFilters — zero shuffles, no RNG.",
    "corpus_pack_chunks": "One exchange (source shard axis) feeding window cumsum, then partial+final agg on (source, chunk).",
    "join_nullsafe": "Null-safe equi-join planned as BroadcastHashJoin on (coalesce(k,0), isnull(k)) — hash-partitionable, no cartesian.",
    "win_gap_fill": "Single exchange on user_id; last(v, ignorenulls) over a running row frame fills gaps in one pass.",
    "agg_median_mode": "Exact percentile agg + WindowGroupLimit(top-1) argmax for the deterministic mode; tiny mode side broadcast back.",
    "analytics_waiting_supplier": "Q21 shape: EXISTS/NOT EXISTS as left-semi/left-anti HASH joins on the order key (inequality residual, no nested loop); dimension broadcast; one agg shuffle.",
    "events_rolling_zscore": "One window pass: sum / sum-of-squares / count share a single frame spec, so each user partition sorts once; no joins, one exchange on user_id.",
    "analytics_late_order_priority": "Q4 shape: quarter filter pushed to the orders scan, EXISTS decorrelated to a broadcast left-semi with the 60-day lag as residual; only exchanges are the 5-row priority agg + sort.",
    "cdc_user_state_diff": "Two keep-latest snapshots each shuffle ONCE on user_id; the full-outer sort-merge join reuses that partitioning — no third exchange.",
    "setop_union_schema_evolution": "Schema-evolution union: pure Union of projections, missing columns are literal nulls — zero exchanges, zero row movement.",
    "mm_bmp_decode_channel_stats": "Catalyst BMP synthesis feeds an Arrow mapInPandas decode (repartitioned by id for core spread); pixel→channel reduction is a JVM-side hash agg.",
    "sim_pq_adc_topk": "PQ ADC serving plan: Arrow-vectorized encode (JVM codegen can't compile the m·k literal chains — janino 64 KB) then a map-only LUT projection + TakeOrderedAndProject over 8-byte codes.",
    "text_heavy_hitters": "Misra-Gries two-pass: Arrow MapInPandas candidate sketch (≤ k counters per partition) then an exact recount restricted to candidates — no full-term shuffle.",
    "pipeline_training_mix": "End-to-end curation → mixture weighting fused by Catalyst into one pipeline: quality/lang filters in the scan, one dedup shuffle, one source-level agg.",
    "analytics_min_cost_supplier": "Q2 shape with the size-7 part filter pushed BELOW both aggregates as a broadcast semi-join on the lineitem scan — offers exist only for parts that can reach the result.",
    "mm_jpeg_decode_block_stats": "Entropy-coded round trip: Arrow synth-encode → Arrow Huffman/IDCT decode (both repartitioned by id), block reduction is a JVM-side hash agg on (doc, bx, by).",
    "sim_ivf_pq_topk": "IVF routes, PQ scores: centroid agg + broadcast probe prune candidates (partition-prunable on a cell-layout table), Arrow PQ encode, map-only LUT top-k.",
    "dedup_semantic_groups": "Embedding-cosine pairs from a bucketed equi-join (never all-pairs) closed into clusters by O(log n) star contraction.",
    "source_paged_filter_pushdown": "Python DataSource scan: bare BatchScan, NO Filter node — pushFilters consumed every predicate; pages are input partitions.",
    "corpus_chunks_udtf": "Python table function in a LATERAL join: ArrowEvalPythonUDTF over JVM-computed token arrays — the sanctioned Python fan-out shape.",
    "pipeline_near_dedup": "The full near-dedup composite: LSH bands -> verify joins -> star-contraction rounds -> survivor anti-join; every join an equi-join, the contraction localCheckpointed per round.",
    "source_session_double_json": "Authenticated-session connector scan: one-partition-per-page BatchScan; login/cookie/double-JSON decode all inside the source.",
    "profile_columns": "Two column-pruned map-side-combining paths (r6 rewrite): global wide agg for nulls/min/max + unpivot->two-phase HASH distinct; 6-row broadcast join reassembles — no SortAggregate, no stats dragged through the distinct path.",
    "atomic_upsert_read": "Manifest-routed read of the atomic table: explicit live-file scan under basePath (partition parsing intact), keep-latest already folded at commit time — the read plan is a plain pruned scan + hash agg.",
    "atomic_skipping_read": "Stats-index read (r7): the scan's file list was pruned against per-file min/max BEFORE planning — the plan shows a scan over the few surviving range-clustered files plus the residual filter and one hash agg.",
    "atomic_changes_read": "Change feed (r7): full-outer null-safe compare of ONLY the files that entered/left the manifest — two bounded scans, one join, one agg; untouched files never appear.",
    "pipeline_incremental_dedup": "CDC-driven incremental dedup (r7): changed docs from the feed semi-join-restrict the band probe, so candidate work is O(changed x bucket); verify joins all equi-joins.",
    "atomic_index_read": "Secondary-index read (r8): the IN probe pruned the file list via per-file BLOOMS on a non-clustered column BEFORE planning — the scan lists only files that may hold a probed value, plus the exact residual IN filter.",
    "atomic_probe_join": "Manifest-bound broadcast (r9): the keyed IN probe is provably ≤10 rows (snapshot keys unique), so read() hints broadcast from bound×bytes/row — BroadcastHashJoin with the lineitem fact never shuffled, where the bytes-based static estimate would pick SMJ.",
}


def main() -> None:
    from pyspark.sql import SparkSession

    from tests.harness import plan_str

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("gen-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stupp_exclusion_etl_spark.plans import REGISTRY

    out = [
        "# PLANS — physical plans of headline queries (sf0.001, "
        "`explain('formatted')`)",
        "",
        "Regenerate: `python tools/gen_plans.py`",
        "",
    ]
    for name, blurb in BLURBS.items():
        df = REGISTRY[name].fn(spark, SF)
        out += [f"## {name}", "", blurb, "", "```", plan_str(df).rstrip(), "```", ""]
        print("done", name, flush=True)
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
