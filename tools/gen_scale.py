#!/usr/bin/env python
"""Generate scaled-up testdata by unioning K key-shifted copies of a
driver-generated sf dir (default sf0.1 ×10 → "sf1"), preserving the
source distributions so per-query scaling ratios measure the ENGINE,
not a data-shape artifact:

- Dimension tables (region, nation) are shared, as in TPC-H.
- Entity keys (custkey/suppkey/partkey/orderkey/event_id/user_id/
  doc_id/vec_id) are offset per copy by (max_key+1), so FK joins stay
  consistent within each copy and key cardinality scales linearly.
- Timestamps are NOT shifted: a 10× table models 10× traffic over the
  same period (denser windows), which is what a real scale-up does.
- documents.text is perturbed per copy (a copy-tag token interleaved
  every 3 words — inside every shingle window) so copies are NOT
  near-duplicates of each other; otherwise MinHash/CC queries would
  see a forced 10× duplicate rate and their scaling ratio would
  measure the artifact, not the operator.
- embeddings are np.roll'ed per copy for the same reason (rolled
  vectors decorrelate; exact-copy vectors would make every vector a
  10-way near-dup).

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
       [--out /tmp/scaled/sf1] [--copies 10]

Writes one parquet per table; deterministic (no RNG at all).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# table -> columns to offset by (copy_index * (max+1) of the column's
# OWN domain table); FK columns share the domain of their target key.
KEY_DOMAINS = {
    "c_custkey": "c_custkey",
    "s_suppkey": "s_suppkey",
    "p_partkey": "p_partkey",
    "o_orderkey": "o_orderkey",
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def _perturb_texts(texts: list, copy: int) -> list:
    tag = f"zq{copy}x"
    out = []
    for t in texts:
        if t is None or t == "":
            out.append(t)
            continue
        words = t.split(" ")
        merged: list[str] = []
        for j, w in enumerate(words):
            if j % 3 == 0:
                merged.append(tag)
            merged.append(w)
        out.append(" ".join(merged))
    return out


def scale_dir(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    raw = {t: pq.read_table(f"{src}/{t}.parquet") for t in TABLES}
    # key domain sizes from the source tables that OWN each key
    base: dict[str, int] = {}
    for t in TABLES:
        for col in raw[t].column_names:
            if KEY_DOMAINS.get(col) == col:
                base[col] = int(
                    np.asarray(raw[t][col].combine_chunks()).max()
                ) + 1

    for t in TABLES:
        tbl = raw[t]
        if t in ("region", "nation"):
            pq.write_table(tbl, f"{out}/{t}.parquet")
            continue
        parts = []
        for i in range(copies):
            cols = {}
            for col in tbl.column_names:
                arr = tbl[col].combine_chunks()
                if col in KEY_DOMAINS and i > 0:
                    dom = base[KEY_DOMAINS[col]]
                    np_arr = np.asarray(arr)
                    cols[col] = pa.array(
                        np_arr + i * dom, type=arr.type
                    )
                elif t == "documents" and col == "text" and i > 0:
                    cols[col] = pa.array(
                        _perturb_texts(arr.to_pylist(), i), type=arr.type
                    )
                elif t == "embeddings" and col == "embedding" and i > 0:
                    vecs = arr.to_pylist()
                    rolled = [
                        None
                        if v is None
                        else np.roll(np.asarray(v, dtype=np.float32),
                                     i * 7 + 1).tolist()
                        for v in vecs
                    ]
                    cols[col] = pa.array(rolled, type=arr.type)
                else:
                    cols[col] = arr
            parts.append(pa.table(cols))
        scaled = pa.concat_tables(parts)
        if t == "documents":
            # n_chars must stay consistent with the perturbed text
            txt = scaled["text"].to_pylist()
            n = [None if x is None else len(x) for x in txt]
            idx = scaled.column_names.index("n_chars")
            scaled = scaled.set_column(
                idx, "n_chars", pa.array(n, type=scaled["n_chars"].type)
            )
        pq.write_table(scaled, f"{out}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {scaled.num_rows}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scaled/sf1")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    scale_dir(a.src, a.out, a.copies)


if __name__ == "__main__":
    main()
