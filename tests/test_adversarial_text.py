"""Adversarial-text robustness: the text/dedup operator surface must
survive (and behave sensibly on) the degenerate documents a 100 TB
crawl actually contains — empty, whitespace-only, unicode, single-token
and pathologically long texts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ROWS = [
    (1, ""), (2, "   "), (3, "\t\n "), (4, "one"), (5, "two words"),
    (6, "héllo wörld ünïcode ✓ 中文 токен"),
    (7, "a " * 5000), (8, "x" * 10000),
    (9, "email me a@b.co or 555-123-4567 at 10.0.0.1"),
    (10, None),  # NULL text — crawls contain these
]


@pytest.fixture(scope="module")
def adv(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_text_functions_survive_and_behave(spark, adv):
    from stupp_exclusion_etl_spark.functions.text import (
        fingerprint, lang_id_ngram, quality_score, redact_pii, token_count,
    )

    got = {
        r.doc_id: r
        for r in adv.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tok"),
            quality_score(F.col("text")).alias("q"),
            fingerprint(F.col("text")).alias("fp"),
            lang_id_ngram(F.col("text")).alias("lang"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert got[1].n_tok == 0 and got[2].n_tok == 0 and got[3].n_tok == 0
    assert got[10].n_tok is None  # NULL propagates, no crash
    assert got[4].n_tok == 1 and got[5].n_tok == 2
    assert got[7].n_tok == 5000
    for did, r in got.items():  # no crashes; NULL text scores NULL quality
        assert r.lang is not None
        assert (r.q is None) == (did == 10), (did, r.q)
    red = got[9].red
    for pii in ("a@b.co", "555-123-4567", "10.0.0.1"):
        assert pii not in red, red


def test_dedup_operators_survive_degenerate_docs(spark, adv):
    from stupp_exclusion_etl_spark.operators.dedup import (
        minhash_lsh_pairs, ngram_containment_pairs, ngram_jaccard_pairs,
        simhash16_from_values, simhash16_token_values,
    )

    sims = adv.select(
        "doc_id",
        simhash16_from_values(simhash16_token_values(F.col("text"))).alias("fp"),
    ).collect()
    assert len(sims) == len(ROWS)
    # pair ops must not crash and must only pair docs with shingles
    for pairs in (
        ngram_jaccard_pairs(adv, "doc_id", "text", 3, 0.01).collect(),
        ngram_containment_pairs(adv, "doc_id", "text", 3, 0.01).collect(),
        minhash_lsh_pairs(adv, "doc_id", "text").collect(),
    ):
        for p in pairs:
            assert p.id1 not in (1, 2, 3, 10) and p.id2 not in (1, 2, 3, 10)
