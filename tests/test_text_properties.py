"""Property-based contracts for the text-function surface: for
ARBITRARY unicode strings (hypothesis), the functions must stay inside
their declared ranges and match a direct Python reference — the
guarantees every downstream curation gate silently assumes."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.functions.text import (
    fingerprint, quality_score, token_count, tokens,
)


def _eval(spark, texts, cols):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select(*cols).collect()


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_token_count_matches_python_split(spark, texts):
    rows = _eval(spark, texts, [token_count(F.col("text")).alias("n")])
    for t, r in zip(texts, rows):
        # Spark tokenization splits on java \s+; mirror with the same
        # ASCII-whitespace class, not python str.split (which also
        # splits unicode spaces Java's \s rejects).
        want = len([x for x in re.split(r"[ \t\n\r\f\x0b]+", t) if x])
        assert r.n == want, (repr(t), r.n, want)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
def test_quality_score_bounded_or_null(spark, texts):
    rows = _eval(
        spark, texts + [None], [quality_score(F.col("text")).alias("q")]
    )
    for r in rows[:-1]:
        assert r.q is not None and 0.0 <= r.q <= 1.0, r.q
    assert rows[-1].q is None  # NULL text scores NULL


@settings(max_examples=10, deadline=None)
@given(
    st.text(alphabet=" \t\nabcXYZ09.,", max_size=40),
    st.text(alphabet=" \t\nabcXYZ09.,", max_size=40),
)
def test_fingerprint_iff_normalized_equal(spark, a, b):
    rows = _eval(
        spark,
        [a, b],
        [F.col("text"), fingerprint(F.col("text")).alias("fp")],
    )

    def norm(s: str) -> str:
        # Mirror fingerprint() exactly: it REGEX-trims the full java
        # \s class at both ends (functions/text.py — not Spark trim(),
        # which strips spaces only), lowers, then collapses \s+ runs;
        # so '' and '\n' MUST normalize (and fingerprint) equal. The
        # old space-only strip() mirror dated from a trim()-based
        # implementation and falsified on exactly that pair.
        s = re.sub(r"^[ \t\n\r\f\x0b]+|[ \t\n\r\f\x0b]+$", "", s)
        return re.sub(r"[ \t\n\r\f\x0b]+", " ", s.lower())

    same_norm = norm(a) == norm(b)
    same_fp = rows[0].fp == rows[1].fp
    assert same_fp == same_norm, (repr(a), repr(b))


def test_tokens_never_empty_strings(spark):
    texts = ["", "  a  b ", "\t\n", "x", " trailing "]
    rows = _eval(spark, texts, [tokens(F.col("text")).alias("t")])
    for r in rows:
        assert all(len(tok) > 0 for tok in r.t), r.t
