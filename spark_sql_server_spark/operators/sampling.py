"""Corpus-curation operators: decontamination and deterministic
sampling for LLM training-data pipelines.

Beyond-reference surface (BASELINE.json north star), same discipline as
``textops.py``: every operator is a pure function of the input rows (no
RNG, no wall clock), expressed with native ``pyspark.sql.functions`` /
SQL so the identical pipeline runs over 100 TB of parquet shards, and
every operator carries a DuckDB oracle for the driver's hash gate.

Determinism notes (registry.py rules):

* "Random" draws come from md5 content hashes — a pure function of the
  row, identical in Spark and DuckDB, stable under re-runs, engine
  swaps, and data reordering (the reason hash sampling is the standard
  for training-data splits in the first place).
* ``LN`` output is rounded to 6dp before any arithmetic that feeds an
  ORDER BY or SUM (libm may differ in the last ulp across engines);
  sums of rounded logs go through ``DECIMAL(38,6)`` so partial-agg
  order cannot change the total.
* Every LIMIT/top-k orders with a unique ``doc_id`` tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.dedup import shingled_frame
from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table, register_tables

# --------------------------------------------------------------------------
# Benchmark decontamination: flag training documents that overlap an
# eval/benchmark set on long word n-grams (the standard contamination
# check — e.g. GPT-3 appendix C, PaLM, Llama used 8- to 13-gram overlap).
# --------------------------------------------------------------------------

#: Long-shingle order for contamination checks.
_DECON_N = 8
#: Deterministic stand-in for "the benchmark set": every 97th document.
#: In production this CTE is replaced by the real eval-set table; the
#: plan shape (tiny distinct gram set, semi-join) is unchanged.
_DECON_EVAL_MOD = 97

_DECON_ORACLE = f"""
    WITH shingled AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_DECON_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_DECON_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= {_DECON_N}
    ),
    eval_grams AS (
      SELECT DISTINCT unnest(grams) AS gram FROM shingled
      WHERE doc_id % {_DECON_EVAL_MOD} = 0
    ),
    train AS (
      SELECT doc_id, grams FROM shingled WHERE doc_id % {_DECON_EVAL_MOD} <> 0
    ),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_hit
      FROM (SELECT doc_id, unnest(grams) AS gram FROM train) t
      JOIN eval_grams e ON t.gram = e.gram
      GROUP BY t.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(t.grams) AS contamination,
           2 * COALESCE(h.n_hit, 0) >= len(t.grams) AS contaminated
    FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
    ORDER BY t.doc_id
"""


@query(
    "t_decontaminate",
    oracle=_DECON_ORACLE,
    covers="north-star pipeline: benchmark decontamination via "
    f"{_DECON_N}-gram overlap against an eval set",
)
def t_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-document eval-set contamination: the fraction of its
    distinct 8-word shingles that appear anywhere in the benchmark set,
    flagged when ≥ half overlap.

    Scale: the eval side reduces to a DISTINCT gram set — eval suites
    are tiny relative to the corpus, so it broadcasts; the left-semi
    join then matches each training gram at most once (fan-out bounded
    by the postings size, no quadratic bucket regardless of how common
    a shingle is — unlike a pair self-join, df-capping is not needed
    here). The contaminated flag compares ``2·hits ≥ grams`` in integer
    arithmetic, so the cutoff is engine-exact.
    """
    return decontam_flags_for(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def decontam_flags_for(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_hit, contamination, contaminated) for the
    training-side documents of ``docs`` (eval side = doc_id %
    _DECON_EVAL_MOD == 0, derived from the same input set) — shared by
    t_decontaminate and the curation pipeline."""
    from spark_sql_server_spark.session import spread

    docs = spread(docs)
    # r12: compiled-JVM shingling (see dedup.shingled_frame — the
    # interpreted 8-gram HOF was this path's largest CPU consumer);
    # still materialized because THREE consumers read it (eval grams,
    # train postings, train gram counts) — without this the shingling
    # re-runs per consumer. localCheckpoint, not persist: persist()
    # entries live in the CacheManager until an explicit unpersist that
    # no caller can issue (the consumers run after this function
    # returns), so repeated invocations leak cached copies; checkpoint
    # blocks are reclaimed by the ContextCleaner once the query's
    # DataFrames are dropped.
    shingled = shingled_frame(docs, _DECON_N).localCheckpoint()
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    # r12 (optimization guide §2.3): gram strings are ~50+ bytes; hash
    # them to fixed-width int64 keys before anything shuffles or
    # broadcasts (the _pair_counts_for discipline) — the eval-side
    # DISTINCT exchange and the broadcast hash relation shrink ~6× and
    # every membership probe compares 8 bytes. Counting semantics
    # unchanged short of an int64 collision between distinct 8-gram
    # strings of one corpus (birthday bound ~2^32 distinct grams).
    eval_grams = (
        shingled.filter(is_eval)
        .select(F.explode("grams").alias("gram"))
        .select(F.xxhash64("gram").alias("gkey"))
        .distinct()
    )
    train = shingled.filter(~is_eval)
    postings = train.select("doc_id", F.explode("grams").alias("gram")).select(
        "doc_id", F.xxhash64("gram").alias("gkey")
    )
    hits = (
        postings.join(F.broadcast(eval_grams), "gkey", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0))
    return (
        train.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hit.cast("long").alias("n_hit"),
            (n_hit.cast("double") / F.col("n_grams")).alias("contamination"),
            (2 * n_hit >= F.col("n_grams")).alias("contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling: fixed-rate sample per (lang, source) stratum,
# membership a pure function of document content.
# --------------------------------------------------------------------------

_STRATA_RATE = 0.1

_STRATIFIED_SQL = f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY md5(text), doc_id) AS rnk,
             COUNT(*) OVER (PARTITION BY lang, source) AS stratum_n
      FROM documents
    )
    SELECT doc_id, lang, source,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(stratum_n AS BIGINT) AS stratum_n
    FROM ranked
    WHERE rnk <= CAST(CEIL({_STRATA_RATE} * stratum_n) AS BIGINT)
    ORDER BY lang, source, rnk
"""


@query(
    "t_stratified_sample",
    oracle=_STRATIFIED_SQL,
    covers="north-star pipeline: deterministic stratified sampling "
    "per (lang, source) stratum",
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% sample per (lang, source) stratum — balanced-mixture
    curation. Ranking by content hash makes membership reproducible and
    insertion-stable (a new document only displaces hash-later ones in
    its own stratum).

    Scale: one window partitioned by the stratum key — parallelism =
    number of strata × even hash spread; no global sort. For very few /
    very large strata the same semantics re-expresses as a two-pass
    (per-stratum counts broadcast + filter on hash rank within salted
    sub-windows); at typical (lang, source) cardinalities the single
    window is the better plan.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_STRATIFIED_SQL)


# --------------------------------------------------------------------------
# Weighted sampling without replacement: Efraimidis–Spirakis A-Res keys
# with the uniform draw taken from the content hash.
# --------------------------------------------------------------------------

_WEIGHTED_K = 200


def _hexval_sql(h: str) -> str:
    """Portable SQL for the integer value of the first 6 hex chars of
    ``h`` — ``instr`` on a digit alphabet works identically in Spark
    and DuckDB (both 1-based)."""
    terms = [
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


_WEIGHTED_SQL = f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             ROUND(LN(({_hexval_sql('md5(text)')} + 0.5) / 16777216.0), 6)
               / GREATEST(n_chars, 1) AS es_key
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {_WEIGHTED_K}
"""


@query(
    "t_weighted_sample",
    oracle=_WEIGHTED_SQL,
    covers="north-star pipeline: deterministic weighted sampling "
    "without replacement (Efraimidis–Spirakis)",
)
def t_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 weighted sample, weight ∝ document length: the
    Efraimidis–Spirakis A-Res scheme (key = u^(1/w), here in log space:
    ln(u)/w) with the uniform u derived from the md5 content hash, so
    the "draw" is a pure function of the document.

    Determinism: u = (hexval(md5[:6]) + 0.5) / 2^24 is exact integer
    arithmetic; ``LN`` is rounded to 6dp before the division (libm
    ulp); the division by an integer weight is IEEE-exact, so ordering
    and values agree bit-for-bit across engines. Unique doc_id
    tiebreak on the top-k.

    Scale: map-only key computation + TakeOrderedAndProject — per-
    partition top-200 then a 200-row driver merge; nothing shuffles.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_WEIGHTED_SQL)


# --------------------------------------------------------------------------
# Bigram-LM quality scoring: add-one-smoothed corpus LM, per-document
# mean log-probability (the CCNet/KenLM-style quality filter, with the
# corpus itself as the LM training set).
# --------------------------------------------------------------------------

_LM_SPARK_SQL = """
    WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
    bi AS (
      SELECT doc_id, element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2
      FROM w LATERAL VIEW explode(sequence(1, size(ws) - 1)) t AS i
      WHERE size(ws) >= 2
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c1
      FROM (SELECT explode(ws) AS tok FROM w)
      GROUP BY tok
    ),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
    scored AS (
      SELECT bi.doc_id,
             ROUND(LN((big.c12 + 1.0) / (uni.c1 + vocab.v)), 6) AS lp
      FROM bi
      JOIN big ON bi.w1 = big.w1 AND bi.w2 = big.w2
      JOIN uni ON bi.w1 = uni.tok
      CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           -- certify the EXACT integer sum, not any derived mean: the
           -- decimal sum of 6dp-rounded logs scaled to int64 micros is
           -- bit-identical in both engines. Certifying a derived double
           -- (mean, even via FLOOR(x + 0.5) tie rules) is a knife edge:
           -- at sf0.01 seven documents' sum_micros/n land EXACTLY on the
           -- .5 tie, so a 1-micro drift anywhere flips the FLOOR (r3
           -- driver hash FAIL). Consumers divide sum_lp_micros /
           -- (1e6 * n_bigrams) for the mean score themselves.
           CAST(SUM(CAST(lp AS DECIMAL(38,6))) * 1000000 AS BIGINT)
             AS sum_lp_micros
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
"""

_LM_ORACLE = (
    _LM_SPARK_SQL.replace("split(text, ' ')", "string_split(text, ' ')")
    .replace("element_at(ws, i)", "ws[i]")
    .replace("element_at(ws, i + 1)", "ws[i + 1]")
    .replace(
        "FROM w LATERAL VIEW explode(sequence(1, size(ws) - 1)) t AS i",
        "FROM w, unnest(range(1, len(ws))) t(i)",
    )
    .replace("size(ws)", "len(ws)")
    .replace("SELECT explode(ws) AS tok FROM w", "SELECT unnest(ws) AS tok FROM w")
)


@query(
    "t_ngram_lm_score",
    oracle=_LM_ORACLE,
    covers="north-star pipeline: bigram-LM perplexity-style quality "
    "scoring (add-one smoothing, CCNet-shaped filter)",
)
def t_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram log-probability mass under an add-one-
    smoothed LM trained on the corpus itself — the distributional twin
    of a KenLM perplexity filter (real model weights would arrive as a
    broadcast lookup table in exactly this plan shape). Emits the exact
    integer pair ``(n_bigrams, sum_lp_micros)``; the mean quality score
    is ``sum_lp_micros / (1e6 * n_bigrams)`` — left to the consumer
    because certifying any derived double is tie-fragile (seven sf0.01
    docs sit exactly on the FLOOR(mean+0.5) boundary; r3 driver FAIL).

    Scale: token fan-out is a map-side explode; the count tables are
    hash aggregations; the score joins are key-unique (each bigram row
    matches exactly one count row on each side), so stopword-skewed
    keys raise row counts but never fan out quadratically — AQE skew
    splitting handles the rest. The vocab size joins in as a 1-row
    broadcast. Log values are rounded to 6dp then summed as
    DECIMAL(38,6) so partial-agg order cannot move the sum.
    """
    register_tables(spark, sf_dir)
    return spark.sql(_LM_SPARK_SQL)


_DOMAIN_MIX_ORACLE = """
    WITH s AS (
      SELECT lang, source, COUNT(*) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    t AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total, COUNT(*) AS k FROM s
    )
    SELECT s.lang, s.source, s.n_docs,
           -- micro-space rounding, NOT ROUND(double, 6): these are
           -- ratios of exact integer counts, the documented cross-
           -- engine ROUND trap (Spark BigDecimal HALF_UP vs DuckDB
           -- scaled multiply). FLOOR(x*1e6 + 0.5)/1e6 is the same
           -- IEEE op sequence in both engines.
           FLOOR(CAST(s.n_docs AS DOUBLE) / t.total * 1000000 + 0.5)
             / 1000000.0 AS actual_share,
           FLOOR(CAST(t.total AS DOUBLE) / (t.k * s.n_docs) * 1000000 + 0.5)
             / 1000000.0 AS mix_weight
    FROM s, t
    ORDER BY s.lang, s.source
"""


@query(
    "t_domain_mix",
    oracle=_DOMAIN_MIX_ORACLE,
    covers="north-star pipeline: domain-mixing weights — per-stratum "
    "sampling multipliers that rebalance the corpus to a uniform "
    "domain target",
)
def t_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) sampling weights that would rebalance the
    corpus to the uniform domain mix: ``weight = target_share /
    actual_share``. Feed the weights into ``t_weighted_sample`` to
    materialize the rebalanced corpus.

    Scale: one count aggregation over the corpus; everything after
    operates on the stratum table (|langs|×|sources| rows — broadcast
    side forever). Shares and weights are ratios of exact integer
    counts rounded in integer micro-space (FLOOR(x*1e6+0.5)/1e6 — the
    identical IEEE op sequence in both engines; ROUND(double, 6) of a
    quotient is the documented cross-engine trap).
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    t = s.agg(
        F.sum("n_docs").cast("long").alias("total"), F.count("*").alias("k")
    )
    # micro-space rounding (FLOOR(x*1e6 + 0.5)/1e6) textually parallel
    # with the oracle — see the oracle comment; F.round is the trap.
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            "n_docs",
            (
                F.floor(
                    F.col("n_docs").cast("double") / F.col("total") * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("actual_share"),
            (
                F.floor(
                    F.col("total").cast("double")
                    / (F.col("k") * F.col("n_docs"))
                    * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("mix_weight"),
        )
        .orderBy("lang", "source")
    )
