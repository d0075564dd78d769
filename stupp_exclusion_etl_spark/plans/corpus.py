"""Corpus-preparation plans: deterministic splitting, stratified
sampling, and sequence packing — the batch-prep stage of an LLM
training-data pipeline (north star: BASELINE.json; generalizes the
reference's partitioned iteration A17 / batching A14,
reference __main__.py:47-66).

All randomness is md5-derived (functions.hashing), so every split and
sample is engine-reproducible and oracle-checked bit-for-bit — the
property a production pipeline needs for resumable, auditable runs.
At 100 TB each query is a single scan + at most one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.functions.hashing import md5_prefix_int
from stupp_exclusion_etl_spark.functions.text import token_count
from stupp_exclusion_etl_spark.plans.registry import register


def duck_md5_int(expr: str, hex_digits: int = 4) -> str:
    """DuckDB SQL for ``conv(substr(md5(expr),1,hex_digits),16,10)`` —
    DuckDB has no conv(), so sum nibble positions (mirrors
    functions.hashing.md5_prefix_int)."""
    nib = f"(strpos('0123456789abcdef', substr(md5({expr}), {{j}}, 1)) - 1)"
    return "(" + " + ".join(
        f"CAST({16 ** (hex_digits - 1 - j)} AS BIGINT) * {nib.format(j=j + 1)}"
        for j in range(hex_digits)
    ) + ")"


# --- deterministic train/val/test split ------------------------------------

_SPLIT_BUCKET = duck_md5_int("CAST(doc_id AS VARCHAR)") + " % 100"


@register(
    "corpus_hash_split",
    oracle=f"""
    SELECT doc_id,
           {_SPLIT_BUCKET} AS bucket,
           CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("B12", "A17"),
)
def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5 bucket of the
    document id — no RNG state, so the assignment is stable across
    runs, engines, and cluster sizes (a re-shard never moves a document
    between splits). Pure per-row projection: zero shuffles at any
    scale."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "bucket", md5_prefix_int(F.col("doc_id").cast("string"), 4) % 100
        )
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test"),
        )
        .select("doc_id", "bucket", "split")
    )


# --- deterministic stratified sampling -------------------------------------

#: Per-language keep-rate (percent) — downsamples the over-represented
#: language toward a balanced corpus.
SAMPLE_RATES = {"en": 30, "de": 90, "es": 90, "fr": 90, "zh": 80}

_SAMPLE_BUCKET = duck_md5_int("'s:' || CAST(doc_id AS VARCHAR)") + " % 100"


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SAMPLE_BUCKET} < {_rate_case_sql()}
    """,
    tags=("B12", "A17"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language md5-threshold
    keep-rates (SAMPLE_RATES) rebalance the corpus without RNG — unlike
    ``df.sampleBy`` the kept set is identical on every run and engine.
    The salt ('s:') decorrelates the sample from corpus_hash_split's
    buckets. Per-row filter, zero shuffles; the filter sits directly on
    the scan."""
    d = table(spark, sf_dir, "documents")
    rate = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit(0),
    )
    bucket = md5_prefix_int(F.concat(F.lit("s:"), F.col("doc_id").cast("string")), 4) % 100
    return d.filter(bucket < rate).select("doc_id", "lang")


# --- concat-and-chunk sequence packing -------------------------------------

#: Token budget per packed chunk (GPT-style concat-then-split packing).
CHUNK_TOKENS = 512


@register(
    "corpus_pack_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), t -> length(t) > 0)) AS BIGINT) AS n_tok
      FROM documents),
    offs AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS off
      FROM toks)
    SELECT source,
           CAST(off // {CHUNK_TOKENS} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS chunk_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM offs
    GROUP BY source, chunk_id
    """,
    tags=("B12", "A14"),
)
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-and-chunk style: within each source
    shard, documents are concatenated in doc_id order and split at
    fixed CHUNK_TOKENS boundaries; a document belongs to the chunk
    containing its first token (cumulative-offset // budget). Reports
    per-chunk doc count, token mass, and first document — the manifest
    a training loader consumes. One window partitioned by source (the
    shard axis — bounded partitions at any corpus size) + one groupBy;
    generalizes the reference's fixed-size sink batching
    (__main__.py:61-66) to token-budget batching."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", token_count(F.col("text")).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = toks.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        offs.withColumn("chunk_id", (F.col("off") / CHUNK_TOKENS).cast("long"))
        .groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# --- benchmark-contamination check -----------------------------------------

#: Tokens/shingle for contamination matching (long enough that chance
#: collisions are negligible; standard practice is 8-13).
CONTAM_K = 8

_DUCK_TOKS = r"list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), t -> length(t) > 0)"


#: The stand-in held-out eval sentence (10 tokens -> 3 8-shingles).
_BENCH_SENTENCE = (
    "held out benchmark question answer pair alpha beta gamma delta"
)


def _duck_shingles(k: int) -> str:
    """DuckDB word-k-shingle expression over `toks` (mirrors
    functions.text.shingles incl. the short-doc whole-text branch)."""
    return (
        f"CASE WHEN len(toks) >= {k} THEN "
        f"list_transform(range(1, len(toks) - {k} + 2), "
        f"i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' ')) "
        f"WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


@register(
    "corpus_contamination_check",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 37 = 0 THEN ' ' || '{_BENCH_SENTENCE}'
                          ELSE '' END AS text
      FROM documents),
    toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM d),
    sh AS (
      SELECT doc_id, u.s
      FROM (SELECT doc_id, {_duck_shingles(CONTAM_K)} AS shs FROM toks),
           UNNEST(shs) AS u(s)),
    bench AS (
      SELECT DISTINCT u.s FROM (
        SELECT {_duck_shingles(CONTAM_K).replace("toks", "bt")} AS shs FROM (
          SELECT {_DUCK_TOKS.replace("text", f"'{_BENCH_SENTENCE}'")} AS bt)),
        UNNEST(shs) AS u(s))
    SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_shared
    FROM sh JOIN bench USING (s)
    GROUP BY doc_id
    """,
    tags=("B12", "B9"),
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any
    word-8-shingle with a held-out benchmark sentence set — the
    standard pre-training decontamination pattern (n-gram overlap
    against eval sets). The corpus is word-salad with no natural
    overlap, so contamination is INJECTED deterministically (every
    37th doc gets the benchmark sentence appended — same technique as
    text_pii_redact) and the scan must recover exactly those docs with
    exactly the full-probe shingle count. Benchmark shingles are a
    tiny broadcast side; the corpus side is one explode + hash join +
    doc-grain agg — a single corpus pass at any scale."""
    from stupp_exclusion_etl_spark.functions.text import shingles, tokens
    from stupp_exclusion_etl_spark.operators.dedup import _exploded_shingles

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 37 == 0, F.lit(" " + _BENCH_SENTENCE)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    # Tokens MUST be materialized before shingling (_exploded_shingles):
    # an inline tokens() child re-tokenizes per lambda element inside
    # the shingle HOF — measured 30x slower on this exact query.
    # No spread() wrapper: _exploded_shingles repartitions internally.
    sh = _exploded_shingles(d, "doc_id", "text", CONTAM_K)
    bench = (
        spark.createDataFrame([(_BENCH_SENTENCE,)], "text string")
        .select(F.explode(shingles(tokens(F.col("text")), CONTAM_K)).alias("s"))
        .distinct()
    )
    return (
        sh.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_shared"))
    )


# --- overlapping token-window chunking (RAG / context-window prep) ---------

_CHUNK_W = 32  # tokens per chunk
_CHUNK_S = 24  # stride (overlap = W - S = 8 tokens)

_TOKS = r"list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), t -> length(t) > 0)"


@register(
    "corpus_sliding_chunks",
    oracle=f"""
    SELECT doc_id,
           CAST(o // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(l, o + 1, o + {_CHUNK_W})) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(l, o + 1, o + {_CHUNK_W}), ' ') AS chunk_text
    FROM (SELECT doc_id, {_TOKS} AS l FROM documents) t,
         UNNEST(range(0, len(t.l), {_CHUNK_S})) AS g(o)
    """,
    tags=("B12",),
)
def corpus_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG / context-window prep):
    every document becomes ceil(n/stride) chunks of <= 32 tokens with an
    8-token overlap. Offsets come from `sequence` + `explode`, the chunk
    itself from `slice` — all Catalyst array ops, no UDF, so the whole
    thing is one map-side pass: zero shuffles at any corpus size, and
    output rows scale with token count / stride (bounded fan-out),
    unlike per-token explodes. Generalizes the reference's fixed-size
    batching (A14, reference __main__.py:61-66) from sink batches to
    model-context batches."""
    d = table(spark, sf_dir, "documents")
    from stupp_exclusion_etl_spark.functions.text import tokens

    return (
        d.select("doc_id", tokens(F.col("text")).alias("l"))
        # Zero-token docs produce zero chunks; without the guard
        # sequence(0, -1, stride) throws on every empty/whitespace doc
        # (found by the adversarial sweep; oracle's range(0,0) is empty).
        .filter(F.size("l") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.size("l") - 1, F.lit(_CHUNK_S))
            ).alias("o"),
            "l",
        )
        .select(
            "doc_id",
            (F.col("o") / _CHUNK_S).cast("long").alias("chunk_id"),
            F.size(F.slice("l", F.col("o") + 1, F.lit(_CHUNK_W))).cast("long").alias(
                "n_chunk_tokens"
            ),
            F.array_join(F.slice("l", F.col("o") + 1, F.lit(_CHUNK_W)), " ").alias(
                "chunk_text"
            ),
        )
    )


@register(
    "corpus_chunks_udtf",
    oracle=f"""
    SELECT doc_id,
           CAST(o // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(l, o + 1, o + {_CHUNK_W})) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(l, o + 1, o + {_CHUNK_W}), ' ') AS chunk_text
    FROM (SELECT doc_id, {_TOKS} AS l FROM documents) t,
         UNNEST(range(0, len(t.l), {_CHUNK_S})) AS g(o)
    """,
    tags=("B12", "B15"),
)
def corpus_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sliding-chunk semantics as corpus_sliding_chunks,
    expressed through a Python UDTF in a LATERAL join (functions.udtfs.
    SlidingChunksUDTF) instead of sequence+explode — completing the UDF
    surface trio (B15: scalar UDF, pandas UDF, table function) and
    differentially pinned: both mechanisms AND both engines must agree
    on one oracle. Tokens are computed JVM-side; the UDTF only
    re-slices per row inside an Arrow batch (ArrowEvalPythonUDTF — the
    plan-invariant sweep still forbids row-at-a-time BatchEvalPython).
    At 100 TB prefer the pure-Catalyst twin; this exists because real
    pipelines have fan-outs (tokenizer-aware chunkers, sentence
    splitters) that genuinely need Python, and THIS is their shape."""
    from stupp_exclusion_etl_spark.functions.text import tokens
    from stupp_exclusion_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    d.createOrReplaceTempView("__chunks_udtf_src")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
        FROM __chunks_udtf_src d,
             LATERAL sliding_chunks_udtf(d.toks, {_CHUNK_W}, {_CHUNK_S}) c
        """
    )


# --- per-source cap (domain balancing) -------------------------------------

_SOURCE_CAP = 15


@register(
    "corpus_source_caps",
    oracle=f"""
    SELECT source, doc_id, CAST(rn AS BIGINT) AS keep_rank
    FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {duck_md5_int("CAST(doc_id AS VARCHAR)", 8)}, doc_id) AS rn
      FROM documents)
    WHERE rn <= {_SOURCE_CAP}
    """,
    tags=("B12", "B9"),
)
def corpus_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain balancing): keep at most 15 docs
    per source, chosen by deterministic md5 order — the Common-Crawl-
    style guard against one domain dominating the training mix, and
    reproducible across runs/engines (no rand()). One shuffle on
    `source`; at 100 TB a hot source is bounded by rank<=cap inside its
    partition, and the md5 sort key spreads ties. The generalization of
    the reference's per-HTS-code fan-out cap (A1 limit pushdown,
    reference clients/exclusion_requests.py:84)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        md5_prefix_int(F.col("doc_id").cast("string"), 8), "doc_id"
    )
    return (
        d.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SOURCE_CAP)
        .select("source", "doc_id", F.col("rn").cast("long").alias("keep_rank"))
    )


# --- mixture rebalancing weights -------------------------------------------

#: Max upsampling factor — no source is repeated more than this many
#: times regardless of how underrepresented it is (epoch cap).
MIX_MAX_WEIGHT = 4.0


@register(
    "corpus_mix_weights",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
                                      t -> length(t) > 0))) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_src FROM per)
    SELECT source, n_docs, src_tokens,
           ROUND(CAST(src_tokens AS DOUBLE) / total, 6) AS actual_share,
           ROUND(LEAST({MIX_MAX_WEIGHT}, CAST(total AS DOUBLE) / (n_src * src_tokens)), 6)
             AS mix_weight
    FROM per CROSS JOIN tot
    """,
    tags=("B12", "A17"),
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: per-source sampling multiplier that moves
    the token mixture toward a uniform target share (weight =
    target_share / actual_share, capped at MIX_MAX_WEIGHT so no source
    repeats more than ~4 epochs) — the rebalancing step before
    corpus_stratified_sample draws the training mix. One rollup shuffle
    (sources are few); the totals side is a one-row broadcast. Weight
    arithmetic stays on exact BIGINT token sums until the final double
    division, so both engines agree bit-for-bit after rounding."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("src_tokens"),
    )
    tot = per.agg(
        F.sum("src_tokens").alias("total"), F.count("*").alias("n_src")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        # try_divide: a degenerate all-empty source (src_tokens = 0) must
        # yield NULL like the DuckDB oracle's x/0, not an ANSI-mode
        # ArithmeticException that kills the query.
        F.round(
            F.try_divide(F.col("src_tokens").cast("double"), F.col("total")), 6
        ).alias("actual_share"),
        F.round(
            F.least(
                F.lit(MIX_MAX_WEIGHT),
                F.try_divide(
                    F.col("total").cast("double"),
                    F.col("n_src") * F.col("src_tokens"),
                ),
            ),
            6,
        ).alias("mix_weight"),
    )


# --- post-curation mixture re-weighting ------------------------------------


def _training_mix_oracle() -> str:
    from stupp_exclusion_etl_spark.plans.text import curation_survivors_ctes

    return curation_survivors_ctes() + f""",
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok_i) AS BIGINT) AS src_tokens
      FROM survivors GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_src FROM per)
    SELECT source, n_docs, src_tokens,
           ROUND(CAST(src_tokens AS DOUBLE) / total, 6) AS actual_share,
           ROUND(LEAST({MIX_MAX_WEIGHT}, CAST(total AS DOUBLE) / (n_src * src_tokens)), 6)
             AS mix_weight
    FROM per CROSS JOIN tot
    """


@register(
    "pipeline_training_mix",
    oracle=_training_mix_oracle(),
    tags=("B12", "B9", "B5", "A17"),
)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pre-training data path as ONE declarative plan: language
    filter → quality gate → exact-dedup survivor selection (the
    pipeline_corpus_curation stages) → per-source token accounting →
    uniform-target mixture weights over the SURVIVING corpus (the
    corpus_mix_weights formula — weights computed on post-curation
    token mass, which is what a training loader actually samples from).
    Catalyst fuses the whole thing into one documents scan, the dedup
    aggregate, one rollup, and a one-row broadcast."""
    from pyspark.sql.window import Window

    from stupp_exclusion_etl_spark.functions.text import fingerprint, quality_score

    d = table(spark, sf_dir, "documents")
    kept = (
        d.withColumn("quality", quality_score(F.col("text")))
        .withColumn("n_tok", token_count(F.col("text")).cast("long"))
        .filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    )
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    survivors = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    per = survivors.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("src_tokens")
    )
    tot = per.agg(F.sum("src_tokens").alias("total"), F.count("*").alias("n_src"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.round(
            F.try_divide(F.col("src_tokens").cast("double"), F.col("total")), 6
        ).alias("actual_share"),
        F.round(
            F.least(
                F.lit(MIX_MAX_WEIGHT),
                F.try_divide(
                    F.col("total").cast("double"),
                    F.col("n_src") * F.col("src_tokens"),
                ),
            ),
            6,
        ).alias("mix_weight"),
    )
