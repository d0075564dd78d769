"""Adversarial-corpus ORACLE sweep: run every documents/events/
embeddings-family query against a hand-built worst-case corpus — NULL
text, empty/whitespace docs, exact+near dups, all-stopword and
punct-only docs, all-NULL measurement series, duplicate timestamps,
zero vectors — with the FULL Spark-vs-DuckDB differential, not just
no-crash. This is the round-2 sweep pattern (which found 4 real bugs)
promoted to query level (VERDICT r2, Next round #8): both engines see
the same parquet, so any divergence on degenerate input is a real
contract break (e.g. the ADVICE r2 NULL-text quality gate bug is
exactly what this sweep catches).

Corpus is pure ASCII by design: the multimodal oracles equate DuckDB
char ops with byte ops, which only holds for ASCII (documented in
plans/multimodal.py). Unicode robustness is covered function-level in
test_adversarial_text.py.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# oracle-parity matrix over adversarial fixtures — round-exit tier (see pytest.ini)
pytestmark = pytest.mark.slow

from tests import harness
from tests.conftest import SF_SMALL

from stupp_exclusion_etl_spark.plans import REGISTRY

_DUP = "the quick brown fox jumps over the lazy dog and runs far away today"
_NEAR = "the quick brown fox jumps over the lazy cat and runs far away today"
_NORMAL = [
    "data pipelines shuffle and aggregate large tables of text",
    "spark executes declarative plans over columnar parquet files",
    "the catalyst optimizer prunes columns and pushes filters down",
    "watermarks bound state for late arriving events in streams",
    "minhash signatures bucket similar documents into bands",
    "embeddings map documents into a vector space for search",
    "tokenizers split text into words for counting and scoring",
    "quality filters drop short or repetitive documents early",
]


def _docs_rows():
    rows = [
        (0, "", "en", "src0"),
        (1, "   ", "en", "src0"),
        (2, "\t\n ", "de", "src1"),
        (3, "one", "en", "src0"),
        (4, "two words", "en", "src1"),
        (5, _DUP, "en", "src0"),
        (6, _DUP, "en", "src1"),          # exact duplicate of 5
        (7, _NEAR, "en", "src0"),         # near-duplicate of 5
        (8, "a " * 400, "en", "src2"),    # pathological repetition
        (9, "x" * 900, "de", "src2"),     # one giant token
        (10, None, None, "src3"),         # NULL text
        (11, "email me a@b.co or call 555-123-4567 at 10.0.0.1 now", "en", "src3"),
        (12, "short", "fr", "src1"),
        (13, "the and of to in it is was for on", "en", "src2"),  # all stopwords
        (14, "!@# $%^ &*( )_+ ~~~ ;;; :::", "en", "src3"),        # punct only
    ]
    for i, t in enumerate(_NORMAL * 3):
        rows.append((15 + i, f"{t} variant {i}", ["en", "de", "fr"][i % 3],
                     f"src{i % 4}", ))
    return [(d, t, lg, s, None if t is None else len(t))
            for d, t, lg, s in rows]


def _events_rows():
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # user 1: ALL 'click' — every derived measurement NULL (the EWMA
    # den=0 / interpolate no-anchor case from ADVICE r2)
    for m in range(8):
        add(base + timedelta(minutes=7 * m), 1, "click", 10.0 + m, '{"k": 1}')
    # user 2: a single event
    add(base + timedelta(hours=1), 2, "purchase", 99.9, '{"k": 2}')
    # user 3: duplicate timestamps (tie-broken by event_id everywhere)
    t3 = base + timedelta(hours=2)
    add(t3, 3, "view", 1.0, '{"k": 3}')
    add(t3, 3, "view", 2.0, '{"k": 3}')
    add(t3 + timedelta(seconds=30), 3, "purchase", 3.0, '{"k": 3}')
    # user 4: NULL value / NULL props / empty + malformed props
    add(base + timedelta(hours=3), 4, "error", None, None)
    add(base + timedelta(hours=3, minutes=1), 4, "view", None, "{}")
    add(base + timedelta(hours=3, minutes=2), 4, "view", 5.5, "not json")
    add(base + timedelta(hours=3, minutes=3), 4, "purchase", 7.5, '{"k": 4}')
    # users 5-8: regular multi-day series for windows/sessions/cohorts
    for u in range(5, 9):
        for d in range(3):
            for m in range(6):
                add(
                    base + timedelta(days=d, hours=u, minutes=11 * m),
                    u,
                    ["view", "click", "purchase", "signup", "error"][(u + m) % 5],
                    round(u * 10 + d + m * 0.5, 2),
                    f'{{"k": {u * 100 + m}}}',
                )
    return rows


def _emb_rows():
    dim = 64
    rows = []
    for v in range(40):
        if v == 20:
            vec = [0.0] * dim                      # zero vector: cos 0/0
        elif v in (21, 22):
            vec = [1.0] * dim                      # identical pair
        elif v == 24:
            vec = None                             # failed encoder: NULL row
        else:
            vec = [((v * dim + i) * 31 % 17 - 8) / 8.0 for i in range(dim)]
        rows.append((v, vec, None if v == 23 else v % 10))
    return rows


@pytest.fixture(scope="module")
def adv_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_adversarial")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")

    docs = _docs_rows()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    ev = _events_rows()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in ev], pa.int64()),
                "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in ev], pa.int64()),
                "event_type": pa.array([r[3] for r in ev], pa.string()),
                "value": pa.array([r[4] for r in ev], pa.float64()),
                "props": pa.array([r[5] for r in ev], pa.string()),
            }
        ),
        d / "events.parquet",
    )
    emb = _emb_rows()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in emb], pa.int64()),
                "embedding": pa.array([r[1] for r in emb], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in emb], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


_FAMILIES = ("dedup_", "text_", "corpus_", "pipeline_", "events_", "cdc_",
             "mm_", "sim_", "scd2_", "stream_", "ml_")

#: Oracled family queries deliberately not swept, with the reason.
EXCLUDED: dict[str, str] = {}

SWEEP = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(_FAMILIES)
    and n not in EXCLUDED
)


def test_sweep_covers_the_new_round3_operators():
    for name in ("pipeline_training_mix", "cdc_user_state_diff",
                 "events_interpolate", "mm_bmp_decode_channel_stats",
                 "mm_wav_decode_energy"):
        assert name in SWEEP


@pytest.mark.parametrize("name", SWEEP)
def test_adversarial_oracle_parity(spark, adv_sf_dir, name):
    problems = harness.check(spark, adv_sf_dir, name)
    assert not problems, f"{name} diverges on adversarial corpus:\n" + "\n".join(
        problems[:3]
    )


# --- adversarial RELATIONAL corpus (TPC-H-ish tables) -----------------------
#
# Same pattern, aimed at the analytics/agg/join/window/subquery surface:
# mutate the sf0.001 tables with the rows a 100 TB lakehouse actually
# contains — NULL foreign keys, orphan keys, NULL/zero/negative
# measures, NULL dates, empty strings — and require full oracle parity.
# DuckDB yields NULL for double x/0.0 while Spark ANSI throws, so any
# plain `/` over a zero-able divisor shows up here as a crash.


@pytest.fixture(scope="module")
def adv_rel_sf_dir(tmp_path_factory, adv_sf_dir):
    import duckdb

    d = tmp_path_factory.mktemp("sf_adversarial_rel")
    # documents/events/embeddings: reuse the degenerate corpus
    for t in ("documents", "events", "embeddings"):
        shutil.copy(f"{adv_sf_dir}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    src = SF_SMALL

    def mutate(table, extra_values_sql):
        con.execute(
            f"""COPY (
                SELECT * FROM '{src}/{table}.parquet'
                UNION ALL BY NAME
                {extra_values_sql}
            ) TO '{d / table}.parquet' (FORMAT PARQUET)"""
        )

    mutate("orders", """
        SELECT * FROM (VALUES
          (900001, CAST(NULL AS BIGINT), 'O', 123.45,
           TIMESTAMP '1996-06-01', '1-URGENT'),
          (900002, 999999, '', CAST(NULL AS DOUBLE),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR)),
          (900003, 1, 'F', 0.0, TIMESTAMP '1993-02-03', '5-LOW')
        ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    mutate("lineitem", """
        SELECT * FROM (VALUES
          (900001, 999999, 999999, 1, 0.0, 100.0, 0.0, 0.0, 'N', 'O',
           TIMESTAMP '1996-06-10'),
          (900001, 1, 1, 2, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP)),
          (900002, 2, 2, 1, -5.0, -10.0, 1.0, 0.0, 'R', 'F',
           TIMESTAMP '1994-01-01'),
          (900003, 3, 3, 1, 7.0, 0.0, 0.5, 0.08, 'A', 'F',
           TIMESTAMP '1993-03-04')
        ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate)""")
    mutate("customer", """
        SELECT * FROM (VALUES
          (800001, '', CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE),
           CAST(NULL AS VARCHAR)),
          (800002, 'null-balance', 0, 0.0, 'BUILDING')
        ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    mutate("supplier", """
        SELECT * FROM (VALUES
          (700001, 'orphan-nation', CAST(NULL AS INTEGER),
           CAST(NULL AS DOUBLE))
        ) t(s_suppkey, s_name, s_nationkey, s_acctbal)""")
    mutate("part", """
        SELECT * FROM (VALUES
          (600001, '', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE)),
          (600002, 'zero-price', 'Brand#00', 'TYPE ZERO', 7, 0.0)
        ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)""")
    mutate("nation", """
        SELECT * FROM (VALUES
          (500, 'NULL-REGION', CAST(NULL AS INTEGER))
        ) t(n_nationkey, n_name, n_regionkey)""")
    shutil.copy(f"{src}/region.parquet", d / "region.parquet")
    con.close()
    return str(d)


#: Relational-family queries NOT already in the corpus sweep.
REL_SWEEP = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None and not n.startswith(_FAMILIES)
)


@pytest.mark.parametrize("name", REL_SWEEP)
def test_adversarial_relational_parity(spark, adv_rel_sf_dir, name):
    problems = harness.check(spark, adv_rel_sf_dir, name)
    assert not problems, (
        f"{name} diverges on adversarial relational tables:\n"
        + "\n".join(problems[:3])
    )


# --- UNICODE corpus sweep ---------------------------------------------------
#
# The main corpus sweep is ASCII by design (multimodal oracles equate
# char ops with byte ops). The text/dedup/corpus families have no such
# excuse: their oracles must hold for accents, CJK, Cyrillic, Greek,
# emoji, NBSP, and combining-character zalgo too. Both engines agree
# that regex \s is the ASCII class and md5 hashes UTF-8 bytes, so
# parity is achievable — it was trim()'s NBSP disagreement that broke
# dedup_exact_fingerprint here until normalization switched to
# regex-trim.

_UNI_TEXTS = [
    ("héllo wörld ünïcode tökens everywhere", "de", "src0"),
    ("中文 文本 分词 测试 样本 数据", "zh", "src1"),
    ("русский текст для проверки токенизации", "ru", "src0"),
    ("mixed ascii and 中文 and émoji 🎉 content here", "en", "src2"),
    ("Ångström naïve café déjà vu", "fr", "src1"),
    ("tab\tseparated\tünicode\ttokens", "de", "src2"),
    ("αβγ δεζ ηθι κλμ greek letters", "el", "src3"),
    ("the quick brown fox jumps over the lazy dog", "en", "src0"),
    (" non breaking space test", "en", "src1"),
    ("ZALGO z̴̢̗a̷l̶g̸o̵ text", "en", "src3"),
    # \x0B vertical tab: Java \s includes it, RE2's does not — the
    # oracles spell the whitespace class explicitly to agree (r3)
    ("vertical\x0Btab\x0Bseparated words", "en", "src0"),
]

#: Cross-engine FUNCTION-semantic gaps, not bugs in this repo — each
#: verified against both engines directly:
UNICODE_EXCLUDED = {
    # DuckDB levenshtein counts BYTES ('héllo'->'hello' = 2); Spark
    # counts code points (= 1). No SQL-expressible alignment.
    "text_fuzzy_match_levenshtein": "levenshtein bytes (DuckDB) vs codepoints (Spark)",
}

_UNI_FAMILIES = ("dedup_", "text_", "corpus_", "pipeline_")

UNI_SWEEP = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(_UNI_FAMILIES)
    and n not in UNICODE_EXCLUDED
)


@pytest.fixture(scope="module")
def uni_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_unicode")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        (i, t, lg, s, len(t))
        for i, (t, lg, s) in enumerate(_UNI_TEXTS * 3)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


@pytest.mark.parametrize("name", UNI_SWEEP)
def test_unicode_oracle_parity(spark, uni_sf_dir, name):
    problems = harness.check(spark, uni_sf_dir, name)
    assert not problems, f"{name} diverges on unicode corpus:\n" + "\n".join(
        problems[:3]
    )


# --- EXTREME-TIMESTAMP events sweep -----------------------------------------
#
# Window arithmetic is where engines disagree quietly: DuckDB integer
# division truncates toward zero, so pre-1970 (negative-epoch)
# timestamps bucketed one window late until the oracle's _BUCKET
# switched to floor() (found by this sweep). Cover negative epochs, the
# microsecond before the epoch, the epoch itself, leap-day edges, and a
# far-future year in one events table.

EXTREME_TS_EXCLUDED = {
    # watermarked streaming dedup DROPS events arriving later than the
    # watermark horizon — with 1901 and 2200 in one replay that is
    # correct streaming semantics, not batch DISTINCT; bounded-state
    # eviction is pinned in tests/test_streaming_dedup.py instead.
    "stream_dedup_replay": "watermark late-drop under extreme disorder",
}

_TS_FAMILIES = ("events_", "stream_", "cdc_", "scd2_")

TS_SWEEP = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(_TS_FAMILIES)
    and n not in EXTREME_TS_EXCLUDED
)


@pytest.fixture(scope="module")
def extreme_ts_sf_dir(tmp_path_factory):
    from datetime import datetime, timedelta

    d = tmp_path_factory.mktemp("sf_extreme_ts")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    rows = []
    eid = 0

    def add(ts, u, et, v, p):
        nonlocal eid
        rows.append((eid, ts, u, et, v, p))
        eid += 1

    add(datetime(1901, 7, 1, 3, 4, 5, 123456), 100, "view", 1.0, '{"k": 1}')
    add(datetime(1969, 12, 31, 23, 59, 59, 999999), 100, "click", 2.0,
        '{"k": 2}')
    add(datetime(1970, 1, 1), 100, "purchase", 3.0, '{"k": 3}')
    add(datetime(2200, 1, 1, 12), 101, "view", 4.0, '{"k": 4}')
    add(datetime(2024, 2, 29, 23, 59, 59, 999999), 101, "click", 5.0,
        '{"k": 5}')
    add(datetime(2024, 3, 1), 101, "purchase", 6.0, '{"k": 6}')
    base = datetime(2024, 1, 1)
    for u in range(5, 9):
        for day in range(3):
            for m in range(6):
                add(
                    base + timedelta(days=day, hours=u, minutes=11 * m),
                    u,
                    ["view", "click", "purchase", "signup", "error"][(u + m) % 5],
                    round(u * 10 + day + m * 0.5, 2),
                    f'{{"k": {u * 100 + m}}}',
                )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


@pytest.mark.parametrize("name", TS_SWEEP)
def test_extreme_timestamp_oracle_parity(spark, extreme_ts_sf_dir, name):
    problems = harness.check(spark, extreme_ts_sf_dir, name)
    assert not problems, (
        f"{name} diverges on extreme timestamps:\n" + "\n".join(problems[:3])
    )


# --- LONG-DOCUMENT sweep ----------------------------------------------------
#
# Web corpora contain 10k+-token documents; the shingle/token pipelines
# must stay LINEAR in document length. The ENGINE is: exploding 80k
# shingles from six long docs measures ~0.6s. The ORACLE is not —
# DuckDB lambdas over big captured lists (list_slice / indexing inside
# list_transform) go quadratic (~25s for ONE 20k-token doc, measured),
# which caps the fixture at 2k tokens and excludes the recursive-CTE
# closure queries (their pair INPUTS are pinned here via
# dedup_lsh_verified; the closure logic is pinned on small graphs
# elsewhere). Identical 2k-token twins pin near-dup detection on long
# docs end to end.

LONGDOC_SWEEP = sorted(
    n for n in (
        "corpus_contamination_check", "corpus_pack_chunks",
        "corpus_sliding_chunks", "corpus_chunks_udtf",
        "dedup_exact_fingerprint", "dedup_minhash_lsh",
        "dedup_lsh_verified", "dedup_ngram_jaccard", "dedup_simhash",
        "text_doc_stats", "text_quality_score", "text_repetition_ratio",
        "text_fingerprint_rolling",
    )
)


@pytest.fixture(scope="module")
def longdoc_sf_dir(tmp_path_factory):
    import random

    random.seed(3)
    words = [f"w{i}" for i in range(500)]

    def mkdoc(n):
        return " ".join(random.choice(words) for _ in range(n))

    d = tmp_path_factory.mktemp("sf_longdoc")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    big = mkdoc(2000)
    raw = [
        (0, mkdoc(2000), "en", "src0"),
        (1, mkdoc(2000), "en", "src1"),
        (2, mkdoc(50), "de", "src0"),
        (3, "tiny", "fr", "src1"),
        (4, big, "en", "src2"),   # identical long twins: near-dup
        (5, big, "en", "src3"),   # detection must survive length
    ]
    rows = [(i, t, lg, s, len(t)) for i, t, lg, s in raw]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


@pytest.mark.parametrize("name", LONGDOC_SWEEP)
def test_longdoc_oracle_parity(spark, longdoc_sf_dir, name):
    problems = harness.check(spark, longdoc_sf_dir, name)
    assert not problems, f"{name} diverges on long documents:\n" + "\n".join(
        problems[:3]
    )
