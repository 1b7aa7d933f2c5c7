"""Text-analysis operators for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all over the
``documents`` table, all expressed with native ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd; no Python in the hot path) so the same
pipeline runs unchanged over 100 TB of parquet shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and hard-coded: language ID at scale is a
# scan-local map operation with no shuffle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en"),
}

#: BPE-ish tokenizer regex: words, numbers, single punctuation marks.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


_TEXT_STATS_ORACLE = """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                AS BIGINT) AS n_tokens
    FROM documents
    ORDER BY doc_id
"""


@query(
    "t_text_stats",
    oracle=_TEXT_STATS_ORACLE,
    covers="north-star text analysis: token counting, type-token ratio",
    bench=True,
)
def t_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — narrow map-only pass, no shuffle;
    the whole thing is codegen'd string functions."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_uniq_words"),
        (
            F.size(F.array_distinct(words)).cast("double")
            / F.size(words).cast("double")
        ).alias("ttr"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


def _lang_score_sql_duck(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{words}], w))) AS BIGINT)"
    )


_LANG_ID_ORACLE = f"""
    SELECT doc_id, lang,
           {_lang_score_sql_duck('en')} AS score_en,
           {_lang_score_sql_duck('de')} AS score_de,
           {_lang_score_sql_duck('fr')} AS score_fr,
           {_lang_score_sql_duck('es')} AS score_es
    FROM documents
    ORDER BY doc_id
"""


@query(
    "t_lang_id",
    oracle=_LANG_ID_ORACLE,
    covers="north-star text analysis: language-ID stopword heuristic",
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit scores per language. Map-only, codegen'd; the argmax
    (predicted language) is `greatest` over the scores downstream."""
    docs = load_table(spark, sf_dir, "documents")
    lower_words = F.split(F.lower(F.col("text")), " ")
    cols = [F.col("doc_id"), F.col("lang")]
    for lang, stop in LANG_STOPWORDS.items():
        stop_arr = F.array(*[F.lit(w) for w in stop])
        score = F.size(
            F.filter(lower_words, lambda w: F.array_contains(stop_arr, w))
        ).cast("long")
        cols.append(score.alias(f"score_{lang}"))
    return docs.select(*cols).orderBy("doc_id")


def _argmax_case(scores: dict[str, str]) -> str:
    """Nested CASE computing the argmax language with deterministic
    tie-breaking by declaration order — portable SQL (no argmax UDF)."""
    langs = list(scores)
    out = "CASE"
    for i, lang in enumerate(langs):
        # earlier languages win ties: strictly greater than predecessors,
        # greater-or-equal to successors
        conds = []
        for j, other in enumerate(langs):
            if other == lang:
                continue
            op = ">" if j < i else ">="
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        out += f" WHEN {' AND '.join(conds)} THEN '{lang}'"
    return out + " ELSE 'unknown' END"


def _lang_pred_sql(score_fn) -> str:
    scores = {lang: score_fn(lang) for lang in LANG_STOPWORDS}
    return f"""
    SELECT doc_id, lang AS labeled_lang,
           {_argmax_case(scores)} AS predicted_lang
    FROM documents
    ORDER BY doc_id
    """


def _lang_score_sql_spark(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"size(filter(split(lower(text), ' '), "
        f"w -> array_contains(array({words}), w)))"
    )


@query(
    "t_lang_predict",
    oracle=_lang_pred_sql(_lang_score_sql_duck),
    covers="north-star text analysis: language-ID argmax prediction",
)
def t_lang_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted language = argmax of the stopword scores (deterministic
    tie-break by declaration order) — the decision step over t_lang_id's
    scores, still one codegen'd map pass."""
    register_tables(spark, sf_dir)
    return spark.sql(_lang_pred_sql(_lang_score_sql_spark))


_QUALITY_ORACLE = """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END
                + CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')) > 0.3 THEN 1 ELSE 0 END
                + CASE WHEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                            <= CAST(0.1 * length(text) AS BIGINT) THEN 1 ELSE 0 END
             AS BIGINT) AS quality_score,
           length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             <= CAST(0.1 * length(text) AS BIGINT) AS low_punct
    FROM documents
    ORDER BY doc_id
"""


#: DuckDB/portable SQL spelling of the 0–4 quality score (shared with
#: the curation pipeline oracle).
QUALITY_SCORE_SQL = """CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END
                + CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')) > 0.3 THEN 1 ELSE 0 END
                + CASE WHEN length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                            <= CAST(0.1 * length(text) AS BIGINT) THEN 1 ELSE 0 END"""


def quality_score_col(text: Column) -> Column:
    """The 0–4 integer quality score as a Column (Spark twin of
    :data:`QUALITY_SCORE_SQL`) — shared by t_quality_score and the
    curation pipeline."""
    n_chars = F.length(text).cast("long")
    words = F.split(text, " ")
    n_words = F.size(words).cast("long")
    n_uniq = F.size(F.array_distinct(words)).cast("long")
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("long")
    low_punct = n_punct <= (F.lit(0.1) * n_chars).cast("long")
    return (
        F.when(n_chars.between(100, 20000), 1).otherwise(0)
        + F.when(n_words >= 20, 1).otherwise(0)
        + F.when(n_uniq.cast("double") / n_words > 0.3, 1).otherwise(0)
        + F.when(low_punct, 1).otherwise(0)
    ).cast("long")


@query(
    "t_quality_score",
    oracle=_QUALITY_ORACLE,
    covers="north-star text analysis: heuristic document quality scoring",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style length/lexical-diversity/punctuation filters folded
    into an integer quality score (0–4). All comparisons on exact
    integer counts so the score is engine-reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text).cast("long")
    words = F.split(text, " ")
    n_words = F.size(words).cast("long")
    n_uniq = F.size(F.array_distinct(words)).cast("long")
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("long")
    low_punct = n_punct <= (F.lit(0.1) * n_chars).cast("long")
    score = (
        F.when(n_chars.between(100, 20000), 1).otherwise(0)
        + F.when(n_words >= 20, 1).otherwise(0)
        + F.when(n_uniq.cast("double") / n_words > 0.3, 1).otherwise(0)
        + F.when(low_punct, 1).otherwise(0)
    ).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        score.alias("quality_score"),
        low_punct.alias("low_punct"),
    ).orderBy("doc_id")


_TFIDF_SQL = """
    WITH tf AS (
      SELECT doc_id, word, COUNT(*) AS tf
      FROM (SELECT doc_id, explode(split(text, ' ')) AS word FROM documents)
      GROUP BY doc_id, word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    df AS (
      SELECT word, COUNT(*) AS df FROM tf GROUP BY word
      -- drop only idf=0 terms (words in EVERY document score exactly
      -- ln(1)=0 so they can never rank). Unlike the pair self-joins in
      -- the jaccard/minhash operators, this word join is key-unique
      -- (each tf row matches exactly one df row), so hot keys inflate
      -- partition sizes, never fan out quadratically — AQE skew
      -- splitting handles them, and the df table itself is
      -- vocabulary-sized (broadcastable)
      HAVING COUNT(*) < (SELECT n_docs FROM n)
    ),
    scored AS (
      SELECT tf.doc_id, tf.word,
             -- FLOOR micro-space 6dp (not ROUND: engine-divergent on
             -- boundary-adjacent doubles); mirrored by the DF side
             FLOOR(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df)
                   * 1000000 + 0.5) / 1000000.0 AS tfidf
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, word, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, word, tfidf
    FROM ranked WHERE rnk <= 3 AND doc_id < 50
    ORDER BY doc_id, rnk
"""

_TFIDF_ORACLE = _TFIDF_SQL.replace(
    "SELECT doc_id, explode(split(text, ' ')) AS word FROM documents",
    "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
)


@query(
    "t_tfidf",
    oracle=_TFIDF_ORACLE,
    covers="north-star text analysis: TF-IDF top terms per document",
    bench=True,
)
def t_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide TF-IDF, top-3 terms per document.

    Scale: the doc×word tf aggregate is materialized ONCE
    (localCheckpoint — at cluster scale, persist) and both consumers
    read it: the vocabulary-sized df table is derived from tf without
    re-exploding the corpus, then explicitly broadcast into the scoring
    join. The word join is key-unique — stopword-skewed keys inflate
    partitions but cannot fan out quadratically — so the only
    principled exclusion is idf=0 terms (words in every document),
    which can never rank; ln() output is rounded to 6dp so ranking is
    reproducible across engines. The output filter (doc_id < 50) is
    applied before the join/window: only the df counts need the full
    corpus.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    # split(" ") yields >= 1 word per document, so tf covers every doc
    # and COUNT(*) over documents equals COUNT(DISTINCT doc_id) over tf.
    # r12: count the base table instead of distinct-counting the
    # exploded tf — the former folds to parquet row-group metadata
    # (no scan, no shuffle), the latter shuffled the doc×word frame.
    n_docs = docs.count()
    df_tbl = (
        tf.groupBy("word")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") < F.lit(n_docs))
    )
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(F.broadcast(df_tbl), "word")
        .select(
            "doc_id",
            "word",
            (
                F.floor(
                    F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
                    * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "word", "tfidf")
        .orderBy("doc_id", "rnk")
    )


# Two-level packing: documents pack into 2048-token windows WITHIN a
# shard (doc_id % N_SHARDS), then window ids get a per-shard offset so
# they are globally unique and dense. The heavy window runs partitioned
# by shard; the only global step is a cumulative sum over N_SHARDS rows
# (one row per shard — constant size at any corpus scale). N_SHARDS is
# sized to the cluster (≥ executor-cores) at real scale.
_PACK_SHARDS = 256

_PACK_SQL = f"""
    WITH toks AS (
      SELECT doc_id, CAST({{NWORDS}} AS BIGINT) AS n_tokens,
             doc_id % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    local AS (
      SELECT doc_id, n_tokens, shard,
             CAST(FLOOR((cum_tokens - n_tokens) / 2048.0) AS BIGINT)
               AS local_window
      FROM (
        SELECT doc_id, n_tokens, shard,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM toks
      ) c
    ),
    offsets AS (
      SELECT shard,
             CAST(COALESCE(SUM(n_windows) OVER (ORDER BY shard
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS win_offset
      FROM (
        SELECT shard, MAX(local_window) + 1 AS n_windows
        FROM local GROUP BY shard
      ) s
    )
    SELECT l.doc_id, l.n_tokens,
           CAST(o.win_offset + l.local_window AS BIGINT) AS window_id
    FROM local l JOIN offsets o ON l.shard = o.shard
    ORDER BY doc_id
"""


def packed_windows(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, window_id) for every document of ``docs``
    (any DataFrame with doc_id/text) — the 2048-token shard-packed
    window assignment of ``_PACK_SQL``, as one pass over the corpus.

    r12 (optimization guide §2.4/§8): the SQL spelling references its
    ``local`` CTE twice (per-shard window counts + the final join), so
    Catalyst inlined the whole tokenize→shard-window pipeline once per
    consumer — two corpus scans, two tokenize passes, two shard-window
    shuffle+sorts. Here the heavy side runs ONCE: tokenize projects to
    the narrow (doc_id, n_tokens, shard) proxy (24 B/doc — decide with
    small rows, move text never), localCheckpoint-ed so both consumers
    read the materialized proxy; the per-shard window count needs no
    window at all — ``local_window`` is non-decreasing in doc_id
    (n_tokens ≥ 1, so the running sum is strictly increasing), hence
    ``MAX(local_window) = FLOOR((S_shard − n_last)/2048.0)`` where
    ``n_last`` is the last document's token count, one map-side
    aggregation. Expressions mirror the oracle token-for-token
    (``FLOOR((cum − n)/2048.0)`` in DOUBLE, BIGINT casts, COALESCE on
    the first shard), so the assignment is bit-identical.
    """
    from pyspark.sql.window import Window as W

    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
    ).localCheckpoint()
    cum = F.sum("n_tokens").over(
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = toks.withColumn(
        "local_window",
        F.floor((cum - F.col("n_tokens")) / F.lit(2048.0)).cast("bigint"),
    )
    n_windows = (
        F.floor((F.col("s_tokens") - F.col("n_last")) / F.lit(2048.0)) + 1
    )
    offsets = (
        toks.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("s_tokens"),
            F.max_by("n_tokens", "doc_id").alias("n_last"),
        )
        .select("shard", n_windows.alias("n_windows"))
        .withColumn(
            "win_offset",
            F.coalesce(
                F.sum("n_windows").over(
                    W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
    )
    return local.join(
        F.broadcast(offsets.select("shard", "win_offset")), "shard"
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("win_offset") + F.col("local_window"))
        .cast("bigint")
        .alias("window_id"),
    )


@query(
    "t_pack_contexts",
    oracle=_PACK_SQL.format(NWORDS="len(string_split(text, ' '))"),
    covers="north-star pipeline: pack documents into fixed token-budget "
    "context windows (shard-partitioned running-sum assignment)",
)
def t_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to 2048-token context windows — the
    deterministic packing used to build training shards.

    Scale: the running sum is partitioned by shard key, so no
    single-task global window; the cross-shard offset pass aggregates
    to one row per shard (256 rows regardless of corpus size) before
    its own tiny cumulative window, and joins back broadcast. Window
    ids stay globally dense and the whole assignment is a pure function
    of (doc_id, text). r12: one corpus pass via :func:`packed_windows`
    (the SQL spelling ran the tokenize→window pipeline once per
    ``local`` consumer)."""
    return packed_windows(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


_CHUNK_SPARK = """
    SELECT doc_id,
           CAST(start AS BIGINT) AS chunk_start,
           substring(text, start, 200) AS chunk
    FROM documents
    LATERAL VIEW explode(sequence(1, greatest(n_chars, 1), 150)) t AS start
    WHERE doc_id < 100
    ORDER BY doc_id, chunk_start
"""

_CHUNK_ORACLE = """
    SELECT doc_id,
           CAST(start AS BIGINT) AS chunk_start,
           substring(text, start, 200) AS chunk
    FROM documents, unnest(generate_series(1, greatest(n_chars, 1), 150)) t(start)
    WHERE doc_id < 100
    ORDER BY doc_id, chunk_start
"""


@query(
    "t_chunk_documents",
    oracle=_CHUNK_ORACLE,
    covers="north-star pipeline: overlapping fixed-size chunking "
    "(200-char windows, 150 stride)",
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping chunks (context-window prep for
    long docs). explode(sequence(...)) keeps it one map-side pass —
    rows fan out ~n_chars/stride with no shuffle."""
    register_tables(spark, sf_dir)
    return spark.sql(_CHUNK_SPARK)


_FINGERPRINT_ORACLE = """
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           substring(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 8)
             AS shard_key
    FROM documents
    ORDER BY doc_id
"""


@query(
    "t_fingerprint",
    oracle=_FINGERPRINT_ORACLE,
    covers="north-star text analysis: normalized-content fingerprint",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/case-normalized MD5 content fingerprint; the 8-hex
    prefix doubles as a uniform shard/bucket key for downstream
    dedup partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    fp = F.md5(norm)
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Gopher-style repetition filters: the fraction of duplicated n-grams
# inside each document (Rae et al. 2021 §A1.1 — high in-document
# repetition is the strongest single low-quality signal).
# --------------------------------------------------------------------------

_REP_SQL = """
    WITH grams AS (
      SELECT doc_id,
             {NWORDS} AS n_words,
             {NG2} AS g2,
             {NG3} AS g3
      FROM documents
    ),
    base AS (
      SELECT doc_id, n_words,
             {LEN}(g2) AS n_g2, {LEN}({DISTINCT}(g2)) AS u_g2,
             {LEN}(g3) AS n_g3, {LEN}({DISTINCT}(g3)) AS u_g3
      FROM grams
    ),
    top_word AS (
      SELECT doc_id, MAX(cnt) AS top_cnt
      FROM (
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (SELECT doc_id, {EXPLODE} AS word FROM documents) w
        GROUP BY doc_id, word
      ) c
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_words AS BIGINT) AS n_words,
           CAST(1.0 - CAST(u_g2 AS DOUBLE) / n_g2 AS DOUBLE) AS dup_2gram_frac,
           CAST(1.0 - CAST(u_g3 AS DOUBLE) / n_g3 AS DOUBLE) AS dup_3gram_frac,
           CAST(t.top_cnt AS DOUBLE) / b.n_words AS top_word_frac,
           (10 * u_g2 < 8 * n_g2) OR (10 * t.top_cnt > 3 * b.n_words)
             AS flagged
    FROM base b JOIN top_word t ON b.doc_id = t.doc_id
    WHERE b.n_g2 > 0 AND b.n_g3 > 0
    ORDER BY b.doc_id
"""

_REP_SPARK = _REP_SQL.format(
    NWORDS="size(split(text, ' '))",
    NG2="transform(sequence(1, greatest(size(split(text, ' ')) - 1, 1)), "
    "i -> concat(element_at(split(text, ' '), i), ' ', "
    "element_at(split(text, ' '), i + 1)))",
    NG3="transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), "
    "i -> concat(element_at(split(text, ' '), i), ' ', "
    "element_at(split(text, ' '), i + 1), ' ', "
    "element_at(split(text, ' '), i + 2)))",
    LEN="size",
    DISTINCT="array_distinct",
    EXPLODE="explode(split(text, ' '))",
)

_REP_ORACLE = _REP_SQL.format(
    NWORDS="len(string_split(text, ' '))",
    NG2="[array_to_string(string_split(text, ' ')[i:i+1], ' ') "
    "FOR i IN range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1)]",
    NG3="[array_to_string(string_split(text, ' ')[i:i+2], ' ') "
    "FOR i IN range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1)]",
    LEN="len",
    DISTINCT="list_distinct",
    EXPLODE="unnest(string_split(text, ' '))",
)


@query(
    "t_repetition_filter",
    oracle=_REP_ORACLE,
    covers="north-star text analysis: Gopher in-document repetition "
    "signals (duplicate 2/3-gram fraction, top-word fraction)",
)
def t_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals with a Gopher-style reject flag
    (dup-2gram fraction > 0.2 or top-word fraction > 0.3 — both
    compared in integer arithmetic so the cutoff is engine-exact).

    Scale: the gram fractions are map-only HOF expressions; the only
    shuffle is the (doc_id, word) count feeding the per-doc mode, a
    uniform two-level aggregation. Short docs (n-gram windows padded by
    ``greatest``) are retained; their fractions use the same formula.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_REP_SPARK)


# --------------------------------------------------------------------------
# PII scrubbing: regex redaction of emails / phone numbers. The
# synthetic corpus contains no organic PII, so the operator plants a
# deterministic contact line per document first — the *scrub* step
# (patterns, counting, replacement) is exactly the production op.
# --------------------------------------------------------------------------

# @BS@ = one regex backslash: Spark SQL string literals consume
# backslash escapes ('\\+' parses to '+'), DuckDB literals do not —
# the token expands to '\\\\' for Spark and '\\' for DuckDB.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+@BS@.[A-Za-z]{2,}"
_PII_PHONE = "@BS@+1-[0-9]{3}-[0-9]{4}"

_PII_SQL = f"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS @STR@) ||
             '@example.com or +1-555-' ||
             substring(CAST(10000 + doc_id % 10000 AS @STR@), 2, 4)
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(@NMATCH@(text, '{_PII_EMAIL}'@MFLAG@) AS BIGINT) AS n_emails,
           CAST(@NMATCH@(text, '{_PII_PHONE}'@MFLAG@) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>'@G@),
                              '{_PII_PHONE}', '<PHONE>'@G@)) AS scrubbed_md5
    FROM planted
    ORDER BY doc_id
"""

_PII_SPARK = (
    _PII_SQL.replace("@NMATCH@", "size(regexp_extract_all")
    .replace("@MFLAG@", ", 0)")
    .replace("@G@", "")
    .replace("@STR@", "STRING")
    .replace("@BS@", "\\\\")
)

_PII_ORACLE = (
    _PII_SQL.replace("@NMATCH@", "len(regexp_extract_all")
    .replace("@MFLAG@", ")")
    .replace("@G@", ", 'g'")
    .replace("@STR@", "VARCHAR")
    .replace("@BS@", "\\")
)


@query(
    "t_pii_scrub",
    oracle=_PII_ORACLE,
    covers="north-star pipeline: regex PII detection + redaction "
    "(emails, phone numbers)",
)
def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact email/phone patterns per document, reporting
    match counts and the md5 of the scrubbed text (so the oracle
    certifies the exact replacement output, not just the counts).

    Scale: pure map-only regex work, codegen'd; no shuffle, no Python.
    Spark's ``regexp_replace`` is global by default and DuckDB needs
    the explicit ``'g'`` flag — the shared-SQL template pins both to
    global replacement.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_PII_SPARK)
