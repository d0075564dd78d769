"""Text-analysis plans (SURVEY.md §2 B12 + north-star text ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.catalog import table
from stupp_exclusion_etl_spark.functions.text import (
    STOPWORDS,
    bpe_token_count,
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    token_count,
    tokens,
)
from stupp_exclusion_etl_spark.plans.registry import register

_TOKENS = r"list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), t -> length(t) > 0)"


@register(
    "text_top_terms",
    oracle=f"""
    SELECT u.t AS token, CAST(count(*) AS BIGINT) AS n
    FROM documents, UNNEST({_TOKENS}) AS u(t)
    GROUP BY u.t
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("B12",),
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-20: tokenize → explode → count → top-K.
    Map-side partial agg keeps the shuffle at vocabulary size."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "text_doc_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_ \\t\\n\\x0B\\f\\r]')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS BIGINT) AS n_punct
    FROM documents
    """,
    tags=("B12",),
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens + BPE-ish regex
    tokens + char/punct counts (all codegen'd expressions)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
        punct_count(F.col("text")).cast("long").alias("n_punct"),
    )


def _lang_oracle() -> str:
    def hits(lang: str) -> str:
        inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"len(list_filter({_TOKENS}, t -> list_contains([{inlist}], lower(t))))"

    en, de, fr = hits("en"), hits("de"), hits("fr")
    return f"""
    SELECT doc_id, lang,
           CASE WHEN {en} >= {de} AND {en} >= {fr} AND {en} > 0 THEN 'en'
                WHEN {de} >= {fr} AND {de} > 0 THEN 'de'
                WHEN {fr} > 0 THEN 'fr'
                ELSE 'und' END AS predicted_lang
    FROM documents
    """


@register("text_lang_id", oracle=_lang_oracle(), tags=("B12",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (functions.text.lang_id) next to
    the labeled lang column."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", lang_id(tokens(F.col("text"))).alias("predicted_lang")
    )


def _quality_oracle() -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKENS}) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter({_TOKENS}, t -> list_contains([{inlist}], lower(t)))) AS DOUBLE) AS sw_hits
      FROM documents)
    SELECT doc_id,
           CASE WHEN n_chars IS NULL THEN NULL ELSE
           ROUND(least(n_tok / 50.0, 1.0) * 0.4
               + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.3
               + least(sw_hits / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.3, 6)
           END AS quality
    FROM t
    """


@register("text_quality_score", oracle=_quality_oracle(), tags=("B12",))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (functions.text.quality_score):
    length + punctuation-density + stopword-fluency mix in [0,1]."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, u.t AS token FROM documents, UNNEST({_TOKENS}) AS u(t)),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY token),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n)
    SELECT doc_id, token, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
      FROM scored)
    WHERE rn = 1 AND doc_id < 100
    """,
    tags=("B12",),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-lite: top term per document (docs 0-99). tf from a
    doc×token agg, df from a token agg, idf = ln(N/df); the df side is
    vocabulary-sized → broadcast back onto tf."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar: one job over parquet row-group stats
    scored = tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") < 100))
        .select("doc_id", "token", "tfidf")
    )


def _rolling_oracle() -> str:
    # hex8 → BIGINT via nibble positions (engine-portable: DuckDB has no
    # conv(); matches functions.hashing.rolling_hash's conv(md5[1:8],16,10)).
    nib = "(strpos('0123456789abcdef', substr(md5(t), {j}, 1)) - 1)"
    hex8 = " + ".join(
        f"CAST({16 ** (7 - j)} AS BIGINT) * {nib.format(j=j + 1)}" for j in range(8)
    )
    # CASE: NULL text must fingerprint to NULL (engine contract — NULL
    # propagates like token_count); without it list_prepend(0, NULL)
    # reduces to 0 (adversarial sweep).
    return f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform({_TOKENS}, t -> {hex8})),
             (acc, h) -> (acc * 257 + h) % 1000000007) END AS fp
    FROM documents
    """


@register("text_fingerprint_rolling", oracle=_rolling_oracle(), tags=("B12", "A13"))
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint
    (functions.hashing.rolling_hash): h = Σ tok_i·257^i mod p computed
    left-to-right with F.aggregate — whole-stage codegen, no UDF, no
    shuffle (per-row expression)."""
    from stupp_exclusion_etl_spark.functions.hashing import rolling_hash

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash(tokens(F.col("text"))).alias("fp"))


def _lang_ngram_oracle() -> str:
    from stupp_exclusion_etl_spark.functions.text import TRIGRAM_PROFILES

    def hits(lang: str) -> str:
        terms = " + ".join(
            f"CAST((length(lower(text)) - length(replace(lower(text), '{t}', ''))) / {len(t)} AS BIGINT)"
            for t in TRIGRAM_PROFILES[lang]
        )
        return f"({terms})"

    en, de, fr, es = (hits(lang) for lang in ("en", "de", "fr", "es"))
    return f"""
    SELECT doc_id, lang,
           CASE WHEN {en} >= {de} AND {en} >= {fr} AND {en} >= {es} AND {en} > 0 THEN 'en'
                WHEN {de} >= {fr} AND {de} >= {es} AND {de} > 0 THEN 'de'
                WHEN {fr} >= {es} AND {fr} > 0 THEN 'fr'
                WHEN {es} > 0 THEN 'es'
                ELSE 'und' END AS predicted_lang
    FROM documents
    """


@register("text_lang_id_ngram", oracle=_lang_ngram_oracle(), tags=("B12",))
def text_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram language ID (functions.text.lang_id_ngram): profile-
    trigram occurrence counting via the replace-length trick — whole-
    stage codegen, no tokenization, no explode; the n-gram counterpart
    to the stopword-profile text_lang_id."""
    from stupp_exclusion_etl_spark.functions.text import lang_id_ngram

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", lang_id_ngram(F.col("text")).alias("predicted_lang")
    )


# --- learned language ID ----------------------------------------------------

def _exploded_trigrams(docs: DataFrame, carry: str) -> DataFrame:
    """(carry, tri) rows of lowercase character trigrams — explode an
    integer sequence and substr per row, ALL inside whole-stage
    codegen, never materializing a trigram array. The array-HOF
    spelling (`transform(sequence(...), i -> lower(substr(text, i,
    3)))`) evaluates its lambda interpreted per element; head-to-head
    on this corpus that costs ~8% warm (the shuffle/window dominate
    this query) and noticeably more on the cold first plan — most of
    the query's end-to-end latency is per-plan codegen compilation,
    which this simpler pipeline also shrinks."""
    return (
        docs.filter(F.length("text") >= 3)
        .select(
            carry,
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("__i"),
        )
        .select(
            carry,
            F.lower(F.col("text").substr(F.col("__i"), F.lit(3))).alias("tri"),
        )
    )


def learned_trigram_profiles(docs: DataFrame, top_n: int = 15) -> DataFrame:
    """TRAIN step: per-language character-trigram profiles learned from
    the labeled corpus — for each language, the ``top_n`` trigrams most
    over-represented vs the global corpus (ratio = lang count / global
    count). Everything is distributed aggregation: one explode over
    characters, two groupBys, one broadcast-joinable result of
    n_langs × top_n rows. Ranking tie-breaks are fully deterministic
    (ratio DESC, count DESC, trigram ASC) so the profile — and
    therefore every downstream prediction — is engine-reproducible."""
    from pyspark.sql.window import Window

    tri = _exploded_trigrams(docs, "lang")
    lang_cnt = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("c"))
    # Global trigram counts roll up from the (lang, tri) aggregate —
    # summing the few-thousand-row rollup instead of re-exploding the
    # whole corpus a second time (one less corpus pass + fact shuffle).
    global_cnt = lang_cnt.groupBy("tri").agg(F.sum("c").alias("g"))
    w = Window.partitionBy("lang").orderBy(
        (F.col("c").cast("double") / F.col("g")).desc(), F.col("c").desc(), "tri"
    )
    return (
        lang_cnt.join(global_cnt, "tri")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select("lang", "tri")
    )


def lang_id_learned_apply(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """APPLY step: count each document's occurrences of every profile
    trigram (integer hits — no float accumulation, so argmax is
    engine-exact), take the language with the most hits (ties → lang
    order), 'und' when nothing matches. The profile table is tiny and
    broadcast; the per-doc work shuffles only on doc_id."""
    from pyspark.sql.window import Window

    doc_tri = _exploded_trigrams(docs, "doc_id")
    # Broadcast-join BEFORE any shuffle: the profile keeps only
    # n_langs×top_n distinct trigrams, so the join filters ~97% of
    # occurrence rows map-side and the only shuffle is the small
    # (doc_id, lang) hit rollup — no full-corpus exchange on the
    # (doc_id, tri) grain (hit count == occurrence count, so the
    # pre-aggregation bought nothing).
    hits = (
        doc_tri.join(F.broadcast(profiles), "tri")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("h").desc(), "lang")
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted_lang"))
    )
    return docs.select("doc_id", "lang").join(best, "doc_id", "left").select(
        "doc_id", "lang", F.coalesce("predicted_lang", F.lit("und")).alias("predicted_lang")
    )


_DUCK_TRIS = (
    "list_transform(range(1, length(text) - 1), i -> lower(substr(text, i, 3)))"
)


@register(
    "text_lang_id_learned",
    oracle=f"""
    WITH tri AS (
      SELECT lang, u.t FROM (
        SELECT lang, {_DUCK_TRIS} AS ts FROM documents WHERE length(text) >= 3),
        UNNEST(ts) AS u(t)),
    lt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY 1, 2),
    gt AS (SELECT t, CAST(count(*) AS BIGINT) AS g FROM tri GROUP BY 1),
    ranked AS (
      SELECT lang, t,
             row_number() OVER (PARTITION BY lang
               ORDER BY CAST(c AS DOUBLE) / g DESC, c DESC, t) AS rn
      FROM lt JOIN gt USING (t)),
    prof AS (SELECT lang, t FROM ranked WHERE rn <= 15),
    dt AS (
      SELECT doc_id, u.t, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, {_DUCK_TRIS} AS ts FROM documents WHERE length(text) >= 3),
        UNNEST(ts) AS u(t) GROUP BY 1, 2),
    hits AS (
      SELECT doc_id, p.lang, SUM(cnt) AS h
      FROM dt JOIN prof p USING (t) GROUP BY 1, 2),
    best AS (
      SELECT doc_id, lang AS predicted_lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rn
      FROM hits)
    SELECT d.doc_id, d.lang, COALESCE(b.predicted_lang, 'und') AS predicted_lang
    FROM documents d
    LEFT JOIN (SELECT doc_id, predicted_lang FROM best WHERE rn = 1) b USING (doc_id)
    """,
    tags=("B12",),
)
def text_lang_id_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED language ID: train per-language trigram profiles from
    the corpus's own labels (top-15 over-represented trigrams per
    language), then predict by integer profile-hit argmax — the
    train/apply split every production lang-ID pipeline has, expressed
    as two DataFrame stages (learned_trigram_profiles /
    lang_id_learned_apply). Complements the two fixed-profile
    heuristics (text_lang_id, text_lang_id_ngram)."""
    from stupp_exclusion_etl_spark.plans._shared import spread

    d = table(spark, sf_dir, "documents")
    # Both train and apply explode ~60 trigram rows per input row; the
    # corpus is a handful of row groups, so without the spread the
    # whole explode runs on one task (see _shared.spread).
    d_wide = spread(d)
    profiles = learned_trigram_profiles(d_wide, top_n=15)
    return lang_id_learned_apply(d_wide, profiles)


# Deterministic PII injection shared by the Spark query and the oracle:
# the corpus has no real PII (word-salad text — verified), so each doc
# gets a synthetic contact line derived from doc_id, and the redactor
# must scrub exactly that.
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' or call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


@register(
    "text_pii_redact",
    oracle=f"""
    WITH d AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '\\d{{3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '[IP]', 'g') AS clean,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4
    FROM d
    """,
    tags=("B12", "B10"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions.text.redact_pii): inject a deterministic
    synthetic contact line per document (the corpus itself carries no
    PII), then redact emails/phones/IPv4s to typed placeholders and
    count matches per kind — the audit columns a compliance pass
    reports. Whole output value-checked, so placeholder positions and
    counts must match the oracle exactly."""
    from stupp_exclusion_etl_spark.functions.text import pii_counts, redact_pii

    d = table(spark, sf_dir, "documents")
    suffix = F.concat(
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.lit(" or call 555-"), F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    t = F.concat(F.col("text"), suffix)
    counts = pii_counts(t)
    return d.select(
        "doc_id",
        redact_pii(t).alias("clean"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
    )


def curation_survivors_ctes() -> str:
    """WITH-body prefix ending in the `survivors` CTE — the shared
    curation pipeline (en + quality gate + exact-dedup survivor) reused
    by pipeline_corpus_curation and corpus.pipeline_training_mix."""
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    # NULL-text guard mirrors _quality_oracle and quality_score:
    # DuckDB's least()/greatest() SKIP NULL args, so without the CASE a
    # NULL-text doc would score 0.7 here and pass the quality gate
    # while the engine scores it NULL and drops it (ADVICE r2).
    quality = """
        CASE WHEN n_chars IS NULL THEN NULL ELSE
        least(n_tok / 50.0, 1.0) * 0.4
        + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.3
        + least(sw_hits / greatest(n_tok, 1.0) * 5.0, 1.0) * 0.3
        END
    """
    return f"""
    WITH scored AS (
      SELECT doc_id, source, lang, text,
             CAST(len({_TOKENS}) AS BIGINT) AS n_tok_i
      FROM documents),
    q AS (
      SELECT doc_id, source, lang, text, n_tok_i, ({quality}) AS quality
      FROM (SELECT *,
              CAST(n_tok_i AS DOUBLE) AS n_tok,
              CAST(length(text) AS DOUBLE) AS n_chars,
              CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE) AS n_punct,
              CAST(len(list_filter({_TOKENS}, t -> list_contains([{inlist}], lower(t)))) AS DOUBLE) AS sw_hits
            FROM scored)),
    kept AS (
      SELECT * FROM q WHERE lang = 'en' AND quality >= 0.5),
    deduped AS (
      SELECT md5(regexp_replace(lower(
               regexp_replace(text, '(^[ \\t\\n\\x0B\\f\\r]+)|([ \\t\\n\\x0B\\f\\r]+$)', '', 'g')),
               '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS fp,
             CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM kept GROUP BY 1),
    survivors AS (
      SELECT k.* FROM kept k JOIN deduped d USING (doc_id))"""


def _curation_oracle() -> str:
    return curation_survivors_ctes() + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok_i) AS BIGINT) AS total_tokens,
           ROUND(avg(quality), 6) AS avg_quality
    FROM survivors GROUP BY source
    """


@register("pipeline_corpus_curation", oracle=_curation_oracle(), tags=("B12", "B9", "B5"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pass a pre-training corpus gets, as ONE
    declarative plan Catalyst fuses: language filter → quality gate
    (functions.text.quality_score ≥ 0.5) → exact near-dup removal
    (normalized-text fingerprint, min-doc_id survivor) → per-source
    token/quality accounting. Single scan of documents, one window-free
    dedup aggregate, one final groupBy — the whole pipeline is three
    shuffles regardless of corpus size."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    kept = (
        d.withColumn("quality", quality_score(F.col("text")))
        .withColumn("n_tok", token_count(F.col("text")).cast("long"))
        .filter((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    )
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    survivors = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN len({_TOKENS}) >= 3 THEN
               list_transform(range(1, len({_TOKENS}) - 1),
                 i -> array_to_string(list_slice({_TOKENS}, i, i + 2), ' '))
             WHEN len({_TOKENS}) > 0 THEN [array_to_string({_TOKENS}, ' ')]
             ELSE CAST([] AS VARCHAR[]) END AS sh
      FROM documents)
    SELECT doc_id,
           ROUND(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 6)
             AS rep_ratio
    FROM t
    """,
    tags=("B12",),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: fraction of duplicated word-trigram
    occurrences per document (1 - distinct/total) — high values mark
    boilerplate/looping text that corpus curation drops. Pure per-row
    Catalyst expression (shingle + array_distinct): zero shuffles, no
    UDF, scales as a map over the scan."""
    from stupp_exclusion_etl_spark.functions.text import shingles

    d = table(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")), 3)
    return d.select(
        "doc_id",
        # try_divide: a zero-shingle (empty-text) doc yields NULL like
        # the oracle's x/0, not an ANSI divide-by-zero.
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.size(F.array_distinct(sh)).cast("double"), F.size(sh)
            ),
            6,
        ).alias("rep_ratio"),
    )


@register(
    "text_fuzzy_match_levenshtein",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, substr(text, 1, 32) AS p FROM documents),
    w AS (
      SELECT doc_id AS id1, source, p,
             lead(doc_id) OVER sw AS id2,
             lead(p) OVER sw AS p2
      FROM d
      WINDOW sw AS (PARTITION BY source ORDER BY doc_id))
    SELECT id1, id2, source, CAST(levenshtein(p, p2) AS BIGINT) AS edit_dist
    FROM w WHERE id2 IS NOT NULL
    """,
    tags=("B10", "B9"),
)
def text_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: Levenshtein edit distance between each
    document's 32-char prefix and its successor within the same source
    stream — the bounded-pair shape fuzzy dedup uses after a blocking
    step (compare candidates, never all pairs; the lead() pairing
    stands in for any blocker). Distance on fixed-length prefixes keeps
    the O(len²) DP cost constant per pair, so throughput scales with
    pair count alone. One shuffle on source."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring("text", 1, 32).alias("p")
    )
    sw = Window.partitionBy("source").orderBy("doc_id")
    pairs = d.select(
        F.col("doc_id").alias("id1"),
        "source",
        "p",
        F.lead("doc_id").over(sw).alias("id2"),
        F.lead("p").over(sw).alias("p2"),
    ).filter(F.col("id2").isNotNull())
    return pairs.select(
        "id1",
        "id2",
        "source",
        F.levenshtein("p", "p2").cast("long").alias("edit_dist"),
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, u.t AS token FROM documents, UNNEST({_TOKENS}) AS u(t)),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
    per AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             sum(ln(CAST(cnt.c AS DOUBLE))) AS s
      FROM tok t JOIN cnt USING (token) GROUP BY t.doc_id)
    SELECT per.doc_id, per.n_tokens,
           ROUND(ln(CAST(tot.total AS DOUBLE)) - per.s / per.n_tokens, 6) AS nll
    FROM per CROSS JOIN tot
    """,
    tags=("B12",),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram language-model score: per-document mean
    negative log-likelihood under p(t) = count(t)/total — the cheap
    perplexity proxy LLM pipelines use for quality filtering (rare-word
    salad scores high, common boilerplate low). Train and apply are one
    plan: token counts aggregate map-side to vocabulary size, broadcast
    back onto the token stream, and the per-doc agg uses the identity
    mean(-ln(c/T)) = ln(T) - mean(ln c) so the scalar total joins once
    at the end instead of rescaling every row. Two vocabulary-sized
    shuffles total, independent of corpus size."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    per = (
        tok.join(F.broadcast(cnt), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("c").cast("double"))).alias("s"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        F.round(
            F.log(F.col("total").cast("double")) - F.col("s") / F.col("n_tokens"), 6
        ).alias("nll"),
    )


#: MG counter budget / heavy-hitter support threshold denominator.
HH_K = 200


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT u.t AS token
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
                              x -> length(x) > 0)) AS u(t)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tok CROSS JOIN tot
    GROUP BY token, n_total
    HAVING count(*) * {HH_K} > n_total
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
    tags=("B12", "B5"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens with frequency > N/HH_K, HH_K=200)
    via the Misra–Gries two-pass
    (operators.sketches.heavy_hitters_exact): bounded-memory candidate
    sketch per partition (mapInPandas, Arrow), candidate-only exact
    recount — the full token vocabulary is NEVER shuffled, which is
    the difference between this and a naive groupBy(token) at 100 TB.
    The MG superset guarantee makes the result exactly equal to the
    oracle's full GROUP BY."""
    from stupp_exclusion_etl_spark.operators.sketches import heavy_hitters_exact
    from stupp_exclusion_etl_spark.functions.text import tokens
    from stupp_exclusion_etl_spark.plans._shared import spread

    d = spread(table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    return heavy_hitters_exact(toks, "token", k=HH_K, top=20)


def _logreg_oracle(iters: int = 3, lr: float = 2.0) -> str:
    """Unrolled-CTE twin of operators.ml.logreg_train_gd: each GD step
    is one avg-aggregate CTE (g{i}) feeding a 1-row weight CTE (w{i})
    via CROSS JOIN — same zero init, same iteration count, same float
    expressions, so the weights agree to ~1e-13 (inside the 6-dp
    rounding)."""
    z = "(a0 * x0 + a1 * x1 + a2 * x2)"
    sig = f"(1.0 / (1.0 + exp(-{z})))"
    ctes = [
        """d AS (
          SELECT lang,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                 1.0 AS x0,
                 n_chars / 500.0 AS x1,
                 CASE WHEN source >= 'src2' THEN 1.0 ELSE 0.0 END AS x2
          FROM documents)""",
        "w0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""g{i} AS (
              SELECT avg(({sig} - y) * x0) AS g0,
                     avg(({sig} - y) * x1) AS g1,
                     avg(({sig} - y) * x2) AS g2
              FROM d CROSS JOIN w{i - 1})"""
        )
        ctes.append(
            f"""w{i} AS (
              SELECT a0 - {lr} * g0 AS a0,
                     a1 - {lr} * g1 AS a1,
                     a2 - {lr} * g2 AS a2
              FROM w{i - 1} CROSS JOIN g{i})"""
        )
    return f"""
    WITH {", ".join(ctes)}
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           ROUND(avg({sig}), 6) AS avg_p_en
    FROM d CROSS JOIN w{iters}
    GROUP BY lang
    """


@register("ml_logreg_lang_filter", oracle=_logreg_oracle(), tags=("B12",))
def ml_logreg_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed iterative training as a first-class operator
    (operators.ml.logreg_train_gd): full-batch gradient-descent
    logistic regression predicting lang='en' from document features
    (scaled length + a source flag), then the trained model applied
    back over the corpus — per-language mean predicted probability.
    The LLM-pipeline shape this stands in for is training a
    fasttext-style quality/language filter ON the corpus itself: each
    GD step is ONE column-pruned, map-side-combined aggregate over the
    full frame; driver state is just the 3-float weight vector. The
    oracle replays the identical unrolled iterations as chained CTEs,
    so the driver value-checks the whole training trajectory, not just
    the apply."""
    from stupp_exclusion_etl_spark.operators.ml import (
        logreg_predict,
        logreg_train_gd,
    )

    d = table(spark, sf_dir, "documents").select(
        "lang",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 500.0).alias("x1"),
        F.when(F.col("source") >= "src2", 1.0).otherwise(0.0).alias("x2"),
    )
    feats = ["x0", "x1", "x2"]
    w = logreg_train_gd(d, feats, "y", lr=2.0, iters=3)
    return (
        d.withColumn("p", logreg_predict(feats, w))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 6).alias("avg_p_en"),
        )
    )


# Cross-document duplicate-span removal (VERDICT r12 task #5 — the
# Lee et al. "Deduplicating Training Data Makes Language Models
# Better" exact-substring verb, re-expressed shuffle-bounded: rolling
# windows bucketed by hash instead of a corpus-wide suffix array).
# Planted boilerplate spans, shared textually with the oracle, give
# the fixture guaranteed cross-doc duplicates on top of whatever the
# synthetic corpus repeats naturally.
_DUP_N = 8
_DUP_PLANTS = (
    "this website uses cookies to improve your experience please "
    "accept our policy today",
    "all rights reserved unauthorized reproduction of this content "
    "is strictly prohibited by law",
    "subscribe to our newsletter for the latest updates delivered "
    "straight to your inbox",
)


def _dup_span_oracle(n: int = _DUP_N) -> str:
    p0, p1, p2 = _DUP_PLANTS
    toks_wt = (
        r"list_filter(regexp_split_to_array(wt, '[ \t\n\x0B\f\r]+'), "
        r"t -> length(t) > 0)"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, COALESCE(
        CASE WHEN doc_id % 7 IN (2, 4) THEN text || ' ' ||
                  CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN '{p0}' WHEN 1 THEN '{p1}'
                    ELSE '{p2}' END
             ELSE text END, '') AS wt
      FROM documents WHERE doc_id < 300),
    tok AS (SELECT doc_id, {toks_wt} AS toks FROM base),
    win AS (
      SELECT doc_id, u.p AS pos,
             array_to_string(toks[u.p+1:u.p+{n}], ' ') AS gram
      FROM tok, UNNEST(range(0, len(toks) - {n - 1})) AS u(p)),
    grp AS (
      SELECT gram, MIN(doc_id) AS owner
      FROM win GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)),
    mark AS (
      SELECT w.doc_id, w.pos FROM win w JOIN grp g ON w.gram = g.gram
      WHERE w.doc_id <> g.owner),
    cover AS (
      SELECT DISTINCT m.doc_id, m.pos + u.i AS tp
      FROM mark m, UNNEST(range(0, {n})) AS u(i)),
    toku AS (
      SELECT t.doc_id, u.i AS tp, t.toks[u.i+1] AS tok
      FROM tok t, UNNEST(range(0, len(t.toks))) AS u(i)),
    kept AS (
      SELECT k.* FROM toku k
      ANTI JOIN cover c ON c.doc_id = k.doc_id AND c.tp = k.tp)
    SELECT b.doc_id,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           COALESCE(a.cleaned, '') AS cleaned
    FROM base b
    LEFT JOIN (SELECT doc_id, count(*) AS n_removed
               FROM cover GROUP BY 1) r USING (doc_id)
    LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS cleaned
               FROM kept GROUP BY 1) a USING (doc_id)
    """


@register(
    "text_dup_span_removal",
    oracle=_dup_span_oracle(),
    tags=("B12", "B9"),
)
def text_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SPAN removal across documents (VERDICT r12
    task #5 — detection existed via rolling fingerprints / n-gram
    containment, but nothing REMOVED the shared bytes): every run of
    >= N tokens appearing in two or more documents is cut from every
    document except its owner (the smallest doc_id containing it —
    the keep-first rule), and the surviving tokens reassemble in
    order. The fixture plants three boilerplate sentences across
    doc_id classes, so cross-doc duplicates are guaranteed; natural
    corpus repeats dedup identically on both sides.

    Shape, not a suffix array: N-token sliding windows bucket by
    xxhash64 of the window text (8-byte shuffle key at 100 TB; the
    window string rides once per occurrence for in-bucket
    verification — hash equality alone never cuts anything), owners
    resolve with map-side-combinable MIN/MAX per gram (cross-doc ⟺
    MIN(doc) <> MAX(doc); no countDistinct), marked windows explode
    to covered token positions, and an anti-join + ordered
    reassembly rebuilds the cleaned text. Every stage is a bounded
    shuffle on (hash, gram) or (doc, pos) — nothing is ever
    all-pairs, and overlapping duplicate windows merge naturally at
    the token-coverage level (maximal-span semantics)."""
    from stupp_exclusion_etl_spark.operators.dedup import remove_dup_spans

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    plant = (
        F.when((F.col("doc_id") % 3) == 0, F.lit(_DUP_PLANTS[0]))
        .when((F.col("doc_id") % 3) == 1, F.lit(_DUP_PLANTS[1]))
        .otherwise(F.lit(_DUP_PLANTS[2]))
    )
    wt = F.when(
        (F.col("doc_id") % 7).isin(2, 4),
        F.concat(F.col("text"), F.lit(" "), plant),
    ).otherwise(F.col("text"))
    return remove_dup_spans(
        d.select("doc_id", wt.alias("text")), "doc_id", "text", n=_DUP_N
    )
