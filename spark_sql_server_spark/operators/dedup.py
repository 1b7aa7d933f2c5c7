"""Deduplication operators for LLM training-data pipelines.

Beyond-reference surface: exact dedup, MinHash+LSH near-dup, SimHash,
n-gram Jaccard, embedding-cosine near-dup — each designed around
shuffle-friendly primitives (hash-partitioned groupBy, band-bucket
joins) that hold at 100 TB.

Portability note: near-dup fingerprints use a polynomial rolling hash
over characters (``_np_word_hash_vocab``, `(acc*31 + codepoint) % 1e9+7`)
instead of Spark's ``xxhash64`` so pure-Python/DuckDB mirrors can
reproduce the exact same hashes with plain int64 arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

MOD = 1_000_000_007  # fits: acc*31 + 255 < 2^63 for acc < MOD


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

_EXACT_ORACLE = """
    SELECT doc_id, source, n_chars
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) t
    WHERE rn = 1
    ORDER BY doc_id
"""


@query(
    "d_dedup_exact",
    oracle=_EXACT_ORACLE,
    covers="north-star dedup: exact (hash-groupBy keep-first)",
    bench=True,
)
def d_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via row_number over the content hash.

    Scale: partitioning on md5(text) (not the raw text) keeps shuffle
    keys fixed-width 32 bytes regardless of document size, and the hash
    distributes uniformly — no skew even when one document dominates.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


_EXACT_GROUPS_ORACLE = """
    SELECT md5(text) AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY content_hash
"""


@query(
    "d_dup_groups",
    oracle=_EXACT_GROUPS_ORACLE,
    covers="north-star dedup: duplicate-group inventory",
)
def d_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


# --------------------------------------------------------------------------
# N-gram Jaccard similarity (exact) — also the verifier for MinHash/LSH
# --------------------------------------------------------------------------


def word_ngrams(words: Column, n: int) -> Column:
    """All word n-grams of an array column, as joined strings. Total:
    arrays shorter than n yield an empty list (a bare ``sequence(0,
    size-n)`` would go descending and feed ``slice`` an invalid 0 —
    downstream length filters don't help, because they are not
    guaranteed to evaluate before this projection).

    r12: no operator hot path uses this HOF form any more — every
    shingling site goes through :func:`shingled_frame` (compiled-JVM
    NGram). Kept as the expression-level REFERENCE implementation that
    ``tests/test_ngram_shingle.py`` pins ``shingled_frame`` against."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def shingled_frame(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, grams) — the distinct word n-grams of ``text`` per
    document, rows with fewer than n words dropped. Same rows and the
    same positionally-ordered distinct gram arrays as
    ``array_distinct(word_ngrams(words, n))`` + ``size(words) >= n``
    (pinned by ``tests/test_ngram_shingle.py``), but built by
    pyspark.ml ``NGram``'s compiled Scala UDF instead of the
    interpreted HOF.

    r12 optimization (guide §1.2.2 per-task work / §4.1 prefer JVM
    execution): Catalyst never codegens higher-order-function lambdas —
    ``transform(idx, i -> array_join(slice(words, i+1, n), ' '))``
    re-enters the interpreted expression evaluator per element and per
    slice, and the profile showed the gram build dominating the whole
    pair path's CPU (~205 of ~390 CPU-seconds of pipe_build_dataset at
    sf0.1, more than 4× the O(L²) pair expansion itself). NGram's
    ``sliding(n).map(_.mkString(" "))`` runs as one compiled Scala call
    per row: 5.2× faster on the sf0.1 3-gram pass, byte-identical gram
    multiset (measured; `exceptAll` both ways empty).

    A null ``text`` coalesces to an empty words array and is dropped by
    the same ``size >= n`` filter that dropped its NULL before; the
    UDF's input projection carries only (doc_id, words), so nothing
    wider reaches the opaque expression (guide §4.1 column-pruning
    note).
    """
    from pyspark.ml.feature import NGram

    words = F.coalesce(
        F.split(F.col("text"), " "), F.array().cast("array<string>")
    )
    if os.environ.get("SHINGLE_REFERENCE_HOF") == "1":
        # measurement-only toggle (r12 VERDICT item 4): route through the
        # retained expression-level reference so full-query A/Bs can
        # compare the compiled NGram path against the interpreted HOF.
        # Never set in production or by the bench harness.
        return docs.filter(F.size(words) >= n).select(
            "doc_id", F.array_distinct(word_ngrams(words, n)).alias("grams")
        )
    wdf = docs.select("doc_id", words.alias("_shingle_words"))
    raw = NGram(
        n=n, inputCol="_shingle_words", outputCol="_shingle_grams"
    ).transform(wdf)
    return raw.filter(F.size("_shingle_words") >= n).select(
        "doc_id", F.array_distinct("_shingle_grams").alias("grams")
    )


_JACCARD_THRESHOLD = 0.5
_NGRAM_N = 3
#: Candidate pairs must share a gram appearing in at most this fraction
#: of documents (and at most _GRAM_DF_CAP documents in absolute terms —
#: the bound that matters at 100 TB, where 0.1×corpus is still huge). A
#: ubiquitous shingle ("of the and") would otherwise make its posting
#: list O(corpus) and the self-join on it quadratic; such grams carry no
#: near-dup signal. The reported Jaccard stays exact — capped-out grams
#: still count toward |A∩B| via the common-gram correction.
_GRAM_DF_FRACTION = 0.1
_GRAM_DF_CAP = 10_000

#: Input-aware sizing for the pair-expansion stages (r13, r12 VERDICT
#: item 3): tasks are sized at ~16k posting rows each, capped at
#: 2×defaultParallelism. At sf0.1 (260k postings) this yields 16 tasks
#: at local[32] AND local[8] instead of the r12 flat 64/16 — the flat
#: pin anti-scaled (8 cores beat 32 on near-empty tasks). At 100 TB
#: the cap binds and the behaviour is the r12 one.
_EXPAND_TARGET_POSTINGS = 16_384

_NGRAM_JACCARD_ORACLE = f"""
    WITH shingled AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_NGRAM_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_NGRAM_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= {_NGRAM_N}
    ),
    postings AS (SELECT doc_id, unnest(grams) AS gram FROM shingled),
    rare AS (
      SELECT gram FROM postings GROUP BY gram
      HAVING COUNT(*) <= (SELECT LEAST({_GRAM_DF_FRACTION} * COUNT(*), {_GRAM_DF_CAP})
                          FROM documents)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM postings a
      JOIN rare r ON a.gram = r.gram
      JOIN postings b ON a.gram = b.gram AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
             AS jaccard
    FROM cand c
    JOIN shingled a ON a.doc_id = c.doc_a
    JOIN shingled b ON b.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          >= {_JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
"""


def _ngram_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair counts over the full ``documents`` table (see
    :func:`_pair_counts_for`)."""
    return _pair_counts_for(load_table(spark, sf_dir, "documents"))


def _pair_counts_for(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, nab, inter, rare_inter) for every candidate pair
    of ``docs`` (any DataFrame with doc_id/text) — pairs sharing at
    least one *rare* gram (document frequency within the df-cap), with
    the exact full-set intersection size and |grams(A)|+|grams(B)| as
    one exact int64 (``nab``).

    One inverted-index self-join does double duty: it generates the
    candidates AND counts their shared rare grams in the same
    ``groupBy`` aggregation (each shared gram contributes exactly one
    joined row — no pair distinct, no per-pair array intersection).
    Capped-out common grams still count toward the *value* of |A∩B|:
    every document carries its (tiny — at most postings/cap distinct
    grams corpus-wide) common-gram set, and the correction is an
    intersection of those small arrays per pair. So the cap bounds the
    join fan-out while the reported Jaccard stays exact.
    """
    from spark_sql_server_spark.session import spread

    docs = spread(docs)
    # r12: compiled-JVM shingling (see shingled_frame — the interpreted
    # gram HOF was the pair path's single largest CPU consumer)
    # materialize the exploded postings once: consumed three times below
    # (df agg, self-join sides, common-set build) — without this the
    # gram HOF re-runs for each consumer. localCheckpoint, NOT persist:
    # persist() registers in the session CacheManager and is never
    # released (each fresh invocation — every bench iteration, every
    # server query — leaks another cached copy until the executors
    # churn), while checkpoint blocks are freed by the ContextCleaner
    # as soon as the query's DataFrames go out of scope. Gram strings
    # are hashed to fixed-width int64 keys (xxhash64) before anything
    # shuffles: every downstream exchange and join compares 8-byte keys
    # instead of multi-word strings (the d_substring_dups docstring's
    # 100 TB prescription, applied). Counting semantics are unchanged —
    # a cross-gram key collision inside one document would need ~2^32
    # distinct grams to become likely (birthday bound on 64 bits).
    # explode_outer, not explode: plain explode lets Catalyst's
    # InferFiltersFromGenerate push `size(grams) > 0 AND
    # isnotnull(grams)` below the spread() exchange, where it re-runs
    # the whole gram HOF twice on the unspread (single-partition-local)
    # scan — measured 3.4s of the 4.6s pair stage at sf0.1. The outer
    # variant is exempt from that rule and is semantically identical
    # here: the `size(words) >= n` filter guarantees every gram array
    # is non-null and non-empty.
    # r13: the postings row count rides the checkpoint's own
    # materialization job via observe() — no extra count job — and
    # drives the input-aware expansion parallelism below (r12 VERDICT:
    # a flat 2×defaultParallelism made 8 cores beat 32 at sf0.1 —
    # 64 near-empty tasks on a few-MB input).
    from pyspark.sql import Observation

    # r13: n_docs rides the SAME materialization job as the postings
    # checkpoint (a CollectMetrics node on the pre-shingle frame counts
    # every doc, including those too short to emit grams). The r12 form
    # computed n_docs as a 1-row frame crossJoined under the df cap —
    # and because `common` is referenced three times below (anti-join +
    # both common-set attach sides), Catalyst inlined the whole subtree
    # per reference: THREE full parquet scans of the corpus + three
    # spread() exchanges + three BroadcastNestedLoopJoins per query,
    # just to compare against one number (visible in the r12 formatted
    # plan; guide §2.4 "remove shuffles outright"). A driver-side
    # literal cap removes all of it.
    _docs_obs = Observation()
    docs = docs.observe(_docs_obs, F.count(F.lit(1)).alias("n"))
    shingled = shingled_frame(docs, _NGRAM_N)
    _post_obs = Observation()
    postings = (
        shingled.select(
            "doc_id",
            F.explode_outer("grams").alias("gram"),
            F.size("grams").alias("n_grams"),
        )
        .select("doc_id", F.xxhash64("gram").alias("gkey"), "n_grams")
        .observe(_post_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_postings = _post_obs.get["n"]
    n_docs = _docs_obs.get["n"]
    # relative cap for small corpora, absolute bound at scale: a posting
    # list of L generates ≤ L²/2 pairs, so the absolute cap is what
    # keeps one ubiquitous shingle from going quadratic at 100 TB.
    # Driver-side float min == the old SQL LEAST over doubles.
    cap = min(_GRAM_DF_FRACTION * n_docs, float(_GRAM_DF_CAP))
    # r13: `common` is consumed three times (anti-join + ca + cb) —
    # checkpoint the (tiny: ≤ total-grams/cap rows corpus-wide) key set
    # once instead of re-running the full document-frequency aggregation
    # per consumer, and ride its row count on the materialization job.
    # When NO gram exceeds the cap (every test SF: cap = 500 vs max
    # gram df 25), the anti-join and both attach joins are identity /
    # empty — skip them adaptively (same driver-side 1-row decision
    # class as _CC_DRIVER_THRESHOLD and broadcast thresholds; values
    # are identical because intersecting with an empty set adds 0).
    _common_obs = Observation()
    common = (
        postings.groupBy("gkey")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > F.lit(cap))
        .select("gkey")
        .observe(_common_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_common = _common_obs.get["n"]
    if n_common == 0:
        rare_postings = postings
    else:
        rare_postings = postings.join(F.broadcast(common), "gkey", "left_anti")
    # r12 (optimization guide §2.4): the pair generator used to be an
    # inverted-index SELF-JOIN on gkey — the checkpointed postings were
    # shuffled TWICE (once per join side), sorted twice, and merge-
    # joined, before the joined pair rows shuffled again into the pair
    # aggregation. Grouping the postings by gkey ONCE and emitting each
    # posting list's ordered pairs map-side produces the identical pair
    # multiset with half the gkey shuffles and no sort. Memory stays
    # bounded at 100 TB: a posting list is ≤ the df-cap (10k) structs
    # (~160 KB), and the pair fan-out streams through two pipelined
    # Generate operators — per outer element the `slice` builds only
    # the O(L) tail array, never the O(L²) pair set as one value.
    # array_sort orders by doc_id (first struct field; ids are unique
    # within a list — array_distinct upstream), so doc_a < doc_b holds
    # exactly as the old join condition did. posexplode_outer/
    # explode_outer keep InferFiltersFromGenerate from re-running
    # upstream expressions (the r3 explode lesson); the slice past the
    # last element is empty, so its explode_outer emits one NULL row
    # per list that the isNotNull filter drops.
    # r12 wave 2 (guide §2.2/§2.5): the gkey exchange feeding this
    # aggregation carries only a few MB at bench scale, so AQE coalesced
    # its read to ~4 partitions — and the O(L²) pair expansion below
    # (the most CPU-intensive stage of the whole dedup path, ~1.2M
    # generated rows at sf0.1) inherited those 4 tasks on a 32-core
    # box. AQE sizes partitions by *input bytes* and cannot see a
    # Generate fan-out. An explicit scale-adaptive repartition pins the
    # expansion's parallelism (explicit N is exempt from AQE coalescing)
    # and is strictly cheaper on the wire: raw (gkey, doc_id, n_grams)
    # posting rows are narrower than the partially-built collect_list
    # buffers the groupBy used to exchange (partial collect_list barely
    # combines — postings for one gram rarely co-reside map-side).
    # groupBy on the same key reuses the partitioning, so the exchange
    # count is unchanged.
    # r13 (r12 VERDICT item 3): the r12 pin was a flat
    # 2×defaultParallelism — 64 tasks at local[32] regardless of input,
    # which made 8 cores beat 32 on the sf0.1 bench (64 near-empty
    # tasks + a 64-way exchange of a few MB of postings). The pin is
    # now input-aware: ceil(postings / target-rows-per-task), capped at
    # 2×defaultParallelism. At 100 TB the postings term is astronomical
    # and the cap binds (the r12 behaviour, unchanged at scale); on
    # small inputs the task count tracks the data.
    dp = docs.sparkSession.sparkContext.defaultParallelism
    n_expand = max(1, min(2 * dp, -(-n_postings // _EXPAND_TARGET_POSTINGS)))
    lists = (
        rare_postings.repartition(n_expand, "gkey")
        .groupBy("gkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "n_grams"))
            ).alias("ds")
        )
        .filter(F.size("ds") >= 2)
    )
    heads = lists.select(F.posexplode_outer("ds").alias("i", "x"), "ds")
    # r12 wave 11 (guide §2.3 shuffle fewer bytes): no consumer needs
    # na and nb separately — every Jaccard site uses na + nb - inter —
    # so the pair aggregation groups by (doc_a, doc_b) alone and carries
    # the exact int64 sum as ONE aggregated value (MAX of a constant:
    # every row of a pair has the same nab). The SQL-tab profile showed
    # this exchange as the query's largest (57.6 MiB at sf0.1, the pair
    # partial agg combines only ~3%), and the 4-column grouping key made
    # both hash-aggregation builds compare 32-byte keys; this halves the
    # key and drops one long per shuffled row. nab is the same integer
    # sum the consumers computed AFTER the shuffle, so jaccard bits are
    # unchanged.
    pair_rows = (
        heads.select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("x.n_grams").alias("na"),
            F.explode_outer(
                F.slice("ds", F.col("i") + F.lit(2), F.size("ds"))
            ).alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .select(
            "doc_a",
            F.col("y.doc_id").alias("doc_b"),
            # exact int64 (every row of a pair carries the same value)
            (F.col("na") + F.col("y.n_grams")).cast("long").alias("nab_row"),
        )
    )
    # r13: the same input-aware repartition discipline for the pair
    # aggregation itself. The SQL-tab profile showed its exchange as the
    # query's largest, the map-side partial agg combining only ~3% (a
    # pair's rows land under different gkey tasks), and AQE coalescing
    # the final-agg read to half the cores at local[32] — the heaviest
    # CPU stage of the whole path ran at 16 of 32 cores. An explicit
    # repartition on the grouping key moves the exchange BELOW the
    # aggregation (3-long raw rows, narrower than the partial-agg
    # buffers) and pins the agg's parallelism; groupBy on the same keys
    # reuses the partitioning, so the exchange count is unchanged.
    rare_shared = (
        pair_rows.repartition(n_expand, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("rare_inter"),
            F.max("nab_row").alias("nab"),
        )
    )
    if n_common == 0:
        # no capped-out grams anywhere in the corpus: every common-gram
        # set is empty, so the correction term is identically 0 and the
        # two attach joins (plus the collect_list aggregation they would
        # each inline — Catalyst duplicates the common_sets subtree per
        # join side) are skipped. inter == rare_inter, bit for bit.
        return rare_shared.select(
            "doc_a",
            "doc_b",
            "nab",
            F.col("rare_inter").alias("inter"),
            "rare_inter",
        )
    common_sets = (
        postings.join(F.broadcast(common), "gkey")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("gkey")).alias("cg"))
        # consumed twice (ca / cb) — materialize once; bounded: ≤ one
        # row per doc that carries a capped-out gram, arrays of ≤
        # total-grams/cap keys
        .localCheckpoint()
    )
    ca = common_sets.select(F.col("doc_id").alias("doc_a"), F.col("cg").alias("ca"))
    cb = common_sets.select(F.col("doc_id").alias("doc_b"), F.col("cg").alias("cb"))
    empty = F.array().cast("array<long>")
    return (
        rare_shared.join(ca, "doc_a", "left")
        .join(cb, "doc_b", "left")
        .select(
            "doc_a",
            "doc_b",
            # |grams(A)| + |grams(B)| as one exact int64 (see the pair
            # aggregation note: consumers only ever use the sum)
            "nab",
            (
                F.col("rare_inter")
                + F.size(
                    F.array_intersect(
                        F.coalesce("ca", empty), F.coalesce("cb", empty)
                    )
                )
            ).alias("inter"),
            # pre-correction shared-RARE-gram count: the blocking
            # strength signal d_editdist_dups filters on
            "rare_inter",
        )
    )


def _ngram_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs — exposed for the planted-
    stop-shingle fan-out test."""
    return _ngram_pair_counts(spark, sf_dir).select("doc_a", "doc_b")


@query(
    "d_ngram_jaccard",
    oracle=_NGRAM_JACCARD_ORACLE,
    covers="north-star dedup: n-gram Jaccard near-dup pairs (exact, df-capped candidates)",
)
def d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over df-capped candidate pairs.

    The pair generator is an *inverted-index join on shared rare
    shingles* — not a cross join: at 100 TB a cross join is impossible,
    and the df-cap bounds every posting list so no stop-shingle can turn
    the self-join quadratic. Intersection sizes come straight out of the
    pair-generating aggregation (plus the tiny common-gram correction,
    see ``_ngram_pair_counts``), so no per-pair array work happens at
    all; the oracle applies the identical candidate rule.
    """
    return _jaccard_pairs_for(
        load_table(spark, sf_dir, "documents")
    ).orderBy("doc_a", "doc_b")


def _jaccard_pairs_for(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) pairs of ``docs`` above the threshold."""
    counted = _pair_counts_for(docs)
    # nab - inter is the same int64 value (na + nb) - inter always was;
    # one integer subtraction then the single IEEE division — bits
    # identical to the pre-wave-11 spelling
    jac = F.col("inter").cast("double") / (
        F.col("nab") - F.col("inter")
    ).cast("double")
    return counted.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= _JACCARD_THRESHOLD
    )


_SPAN_W = 20  # exact-substring window length, in words
_SPAN_ORACLE = f"""
    WITH spans AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_SPAN_W - 1}], ' ')
               FOR i IN range(1, len(words) - {_SPAN_W - 1} + 1)
             ]) AS sp
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= {_SPAN_W}
    ),
    postings AS (SELECT doc_id, unnest(sp) AS span FROM spans)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS shared_spans
    FROM postings a JOIN postings b
      ON a.span = b.span AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    ORDER BY doc_a, doc_b
"""


@query(
    "d_substring_dups",
    oracle=_SPAN_ORACLE,
    covers="north-star dedup: exact long-substring duplicate pairs "
    "(Lee et al. — documents sharing a 20-word exact window)",
)
def d_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication: pairs of documents sharing at least
    one exact 20-word window, with the count of shared distinct windows.

    This is the exact-match complement to the approximate near-dup
    family ("Deduplicating Training Data Makes Language Models Better"
    removes repeated ≥50-token spans; 20 words here matches the test
    corpus scale). Spark shape: explode distinct windows → hash each
    window to a fixed-width int64 key (xxhash64 — 20-word strings
    never enter a shuffle) → inverted-index self-join on the key →
    count per pair in the pair-generating aggregation. A 20-word exact
    window is a far stronger key than a 3-gram, so posting lists are
    near-unique and the join fan-out stays linear.
    """
    from spark_sql_server_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # r12: compiled-JVM shingling (see shingled_frame)
    spans = shingled_frame(docs, _SPAN_W).withColumnRenamed("grams", "sp")
    # explode_outer: see _pair_counts_for — keeps InferFiltersFromGenerate
    # from re-running the 20-word-window HOF below the exchange; the
    # `size(words) >= _SPAN_W` filter guarantees non-empty span arrays
    postings = spans.select("doc_id", F.explode_outer("sp").alias("sp_str")).select(
        "doc_id", F.xxhash64("sp_str").alias("span")
    )
    a = postings.alias("a")
    b = postings.alias("b")
    return (
        a.join(
            b,
            (F.col("a.span") == F.col("b.span"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_spans"))
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Duplicate-cluster assignment (connected components over near-dup pairs)
# --------------------------------------------------------------------------

_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      {_NGRAM_JACCARD_ORACLE.replace("ORDER BY doc_a, doc_b", "")}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY node
    ORDER BY doc_id
"""


@query(
    "d_dup_clusters",
    oracle=_CLUSTERS_ORACLE,
    covers="north-star dedup: connected components over near-dup pairs "
    "(iterative DataFrame label propagation; DuckDB oracle uses a recursive CTE)",
)
def d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each near-duplicate document to a cluster (the minimum
    doc_id reachable through the near-dup pair graph) — the step that
    turns pairwise dedup output into keep/drop decisions.

    Spark has no recursive CTE, so this is the canonical iterative
    formulation: alternate join-based min-label propagation until a
    fixpoint. Iteration count is O(diameter) ≤ O(log n) with doubling;
    dup components in practice are tiny (pairs/chains), so the loop
    exits after 2-3 rounds. Each round is one shuffle join on uniformly
    distributed ids — scalable; the driver only checks the convergence
    counter, never the data.
    """
    # r13: use the unordered pair helper — d_ngram_jaccard's trailing
    # ORDER BY was materialized into the label-propagation checkpoint
    # (a range exchange + sort per invocation that connected components
    # cannot use)
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_for(docs).select("doc_a", "doc_b")
    return _propagate_min_labels(pairs)


#: Edge count below which connected components run as driver-side
#: union-find instead of the distributed label-propagation loop. Dup
#: graphs are tiny relative to their corpora (211 edges from 5k docs at
#: sf0.1); ten distributed rounds over a few hundred edges is pure
#: scheduling overhead (~1s at local[32]). The collect is bounded:
#: 2 longs × threshold ≈ 3 MB. Same adaptive logic as a broadcast-join
#: threshold — the distributed loop remains the ≥threshold path.
_CC_DRIVER_THRESHOLD = 200_000


def _propagate_min_labels(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id): minimum doc_id reachable through the pair
    graph — driver union-find below ``_CC_DRIVER_THRESHOLD`` edges,
    iterative join-based min-label propagation above (see
    :func:`d_dup_clusters` for the design argument). Both paths emit
    identical labels (min doc_id per component)."""
    # materialize pairs FIRST: the symmetrization below references the
    # DataFrame twice, and without this the entire upstream
    # pair-generation join runs once per reference (measured 2×); the
    # swapped half is disjoint from the original (doc_a < doc_b), so no
    # distinct is needed — the union is shuffle-free.
    # r13: the edge count rides the checkpoint's own materialization
    # job via observe() instead of a separate count() job over the
    # checkpointed blocks (one fewer job per invocation).
    from pyspark.sql import Observation

    _edge_obs = Observation()
    pairs = pairs.observe(_edge_obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
    n_edges = _edge_obs.get["n"]
    if n_edges <= _CC_DRIVER_THRESHOLD:
        return _cc_driver_union_find(pairs)
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    from pyspark.sql import Observation

    for i in range(10):  # diameter bound; dup chains converge in 2-3
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        # the convergence counter rides the SAME action that materializes
        # the round (observe + eager localCheckpoint) — no separate
        # compare-join job per iteration
        obs = Observation(f"cc_round_{i}")
        new_lbl = F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl")))
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.col("lbl").alias("old_lbl"), new_lbl.alias("lbl"))
            .observe(
                obs,
                F.sum((F.col("lbl") != F.col("old_lbl")).cast("long")).alias("changed"),
            )
            .select("node", "lbl")
            .localCheckpoint()  # truncate lineage: keeps each round O(1) plan depth
        )
        labels = new_labels
        if not obs.get["changed"]:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    ).orderBy("doc_id")


def _cc_driver_union_find(pairs: DataFrame) -> DataFrame:
    """Exact min-label connected components for a small edge set:
    collect the (doc_a, doc_b) pairs, run path-compressed union-find,
    return the same (doc_id, cluster_id) frame as the distributed
    loop. Labels are the component-minimum doc_id — identical to the
    propagation fixpoint and to the oracle's recursive CTE."""
    edges = pairs.collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for e in edges:
        ra, rb = find(e.doc_a), find(e.doc_b)
        if ra != rb:
            # union by min so roots stay the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = sorted((node, find(node)) for node in parent)
    spark = pairs.sparkSession
    schema = "doc_id BIGINT, cluster_id BIGINT"
    if not rows:
        return spark.createDataFrame([], schema)
    # r13: createDataFrame(list) parallelizes into defaultParallelism
    # slices — 32 near-empty Python-worker unpickle tasks at local[32]
    # for a few thousand label rows (profiled: 7.9 s of task run time,
    # 0.27 s of CPU). Slice by row count instead; the label set is
    # bounded by _CC_DRIVER_THRESHOLD so a handful of slices always
    # suffices.
    n_slices = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 65_536 + 1))
    # r13: RDD-backed frames carry no size statistics, so consumers'
    # anti-joins against these labels planned as SortMergeJoin — a full
    # shuffle+sort of the corpus to drop a few hundred ids. This path
    # is bounded (≤ 2 × _CC_DRIVER_THRESHOLD label rows ≈ 6 MB), so the
    # broadcast hint is always safe HERE; the distributed-loop path
    # (unbounded labels) stays unhinted.
    return F.broadcast(
        spark.createDataFrame(spark.sparkContext.parallelize(rows, n_slices), schema)
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

_NUM_PERM = 16
_BANDS = 4  # rows per band = 4


def _np_word_hash_vocab(words, np):
    """Portable polynomial hash ``acc = (acc*31 + codepoint) % MOD`` for
    a batch vocabulary, vectorized: pad each word's codepoints into one
    matrix and fold column-wise — ~max_word_len vector ops per Arrow
    batch, vs one interpreted per-char Catalyst fold per word in the r1
    HOF version (the measured hot spot of the signature stage). Values
    are bit-identical to the HOF/pure-Python/DuckDB mirrors."""
    n = len(words)
    if n == 0:
        return {}
    arrs = [
        np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        for w in words
    ]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    padded = np.zeros((n, maxlen), dtype=np.int64)
    for i, a in enumerate(arrs):
        padded[i, : a.size] = a
    acc = np.zeros(n, dtype=np.int64)
    for j in range(maxlen):
        live = lens > j
        acc[live] = (acc[live] * 31 + padded[live, j]) % MOD
    return dict(zip(words, acc.tolist()))


def _minhash_signatures_pandas(docs: DataFrame, n: int = _NGRAM_N) -> DataFrame:
    """(doc_id, sig: array<long>) — _NUM_PERM permutation minima over
    distinct word-n-gram hashes, in one Arrow-batched numpy pass.

    h_i(g) = ((2i+1)·g + 7919·i) % MOD with fixed odd multipliers —
    deterministic and engine-reproducible. Map-only (no shuffle, no
    driver): each batch hashes its word vocabulary once (vectorized),
    combines n consecutive word hashes per gram with int64 arithmetic,
    and takes the 16 permutation minima as one (perm × gram) matmul-
    shaped broadcast. Docs shorter than n words are dropped, matching
    the r1 expression pipeline.
    """
    from pyspark.sql import types as T

    num_perm = _NUM_PERM
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def compute(batches):
        import numpy as np
        import pandas as pd

        mult = (2 * np.arange(num_perm, dtype=np.int64) + 1)[:, None]
        add = (7919 * np.arange(num_perm, dtype=np.int64))[:, None]
        for pdf in batches:
            if pdf.empty:
                continue
            doc_words = [t.split(" ") for t in pdf["text"]]
            vocab = _np_word_hash_vocab(
                list({w for ws in doc_words for w in ws}), np
            )
            ids, sigs = [], []
            for doc_id, ws in zip(pdf["doc_id"], doc_words):
                if len(ws) < n:
                    continue
                wh = np.fromiter((vocab[w] for w in ws), dtype=np.int64, count=len(ws))
                g = wh[: len(ws) - n + 1].copy()
                for k in range(1, n):
                    g = (g * 31 + wh[k : len(ws) - n + 1 + k]) % MOD
                g = np.unique(g)
                sigs.append(((mult * g[None, :] + add) % MOD).min(axis=1).tolist())
                ids.append(doc_id)
            if ids:
                yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    from spark_sql_server_spark.session import spread

    return spread(docs.select("doc_id", "text")).mapInPandas(compute, schema=schema)



# DuckDB SQL mirror of the portable hash pipeline (the reason the
# operators use `(acc*31 + codepoint) % MOD` instead of xxhash64): word
# hash -> rolling gram hash -> permutation minima, all in int64 SQL.
_DUCK_WORD_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(regexp_extract_all(w, '.'), "
    "c -> CAST(unicode(c) AS BIGINT))), "
    f"(acc, c) -> (acc * 31 + c) % {MOD})"
)

_DUCK_SIG_CTES = f"""
    words AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE len(string_split(text, ' ')) >= {{N}}
    ),
    wh AS (
      SELECT doc_id, list_transform(ws, w -> {_DUCK_WORD_HASH}) AS wh
      FROM words
    ),
    grams AS (
      SELECT doc_id, list_distinct([
        ((wh[i] * 31 + wh[i+1]) % {MOD} * 31 + wh[i+2]) % {MOD}
        FOR i IN range(1, len(wh) - {{N}} + 2)
      ]) AS gh FROM wh
    ),
    sigs AS (
      SELECT doc_id, [
        list_min(list_transform(gh, g -> ((2*p+1)*g + 7919*p) % {MOD}))
        FOR p IN range(0, {{P}})
      ] AS sig FROM grams
    )
"""

_MINHASH_ORACLE = f"""
    WITH {_DUCK_SIG_CTES.format(N=3, P=16)},
    bands AS (
      SELECT doc_id, b AS band, sig[b*4+1:b*4+4] AS bv
      FROM sigs, unnest(range(0, 4)) t(b)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
"""


@query(
    "d_minhash_lsh",
    oracle=_MINHASH_ORACLE,  # full SQL mirror: portable polynomial hashes
    # reproduce the exact signatures; the band join keys on the raw
    # 4-slice (list equality) where Spark keys on xxhash64(slice) —
    # identical pairs barring a 64-bit collision inside one band bucket
    covers="north-star dedup: MinHash signatures + LSH band-bucket join",
    bench=True,
)
def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs.

    Pipeline: shingle (3-word grams) → 16-permutation minhash signature
    (Arrow-batched numpy, map-only) → 4 bands × 4 rows → explode to
    (band, band_hash) buckets → self-join within buckets → distinct
    candidate pairs. Scale: the only shuffle is the bucket join, and
    bucket keys are uniformly distributed hashes; signature computation
    is map-only. Band/row parameters trade recall vs join fan-out
    (4×4 targets Jaccard ≳ 0.5).
    """
    docs = load_table(spark, sf_dir, "documents")
    # materialize signatures once: both sides of the band self-join read
    # them, and the mapInPandas signature pass is the dominant cost —
    # without this Spark recomputes it per side (at cluster scale this
    # would be .persist(); localCheckpoint also truncates lineage)
    sig = _minhash_signatures_pandas(docs).localCheckpoint()
    rows_per_band = _NUM_PERM // _BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias(
                            "band_hash"
                        ),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_SIMHASH_BITS = 32


_SIMHASH_ORACLE = """
    WITH w AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    ),
    h AS (SELECT doc_id, list_transform(ws, w -> @WH@) AS hs FROM w)
    SELECT doc_id, CAST(list_sum([
      CASE WHEN 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > len(hs)
           THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
      FOR b IN range(0, 32)
    ]) AS BIGINT) AS simhash
    FROM h
    ORDER BY doc_id
""".replace("@WH@", _DUCK_WORD_HASH)


@query(
    "d_simhash",
    oracle=_SIMHASH_ORACLE,  # full SQL mirror of the bit-vote loop
    covers="north-star dedup: SimHash fingerprints",
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document via one Arrow-batched numpy pass.

    For each bit position, votes = Σ over distinct words of ±1 depending
    on the word-hash bit; bit set iff votes > 0. Entirely map-side (no
    shuffle, no driver), so it scales linearly; the r1 version computed
    the same values as 32 interpreted Catalyst folds per row — the
    batched bit matrix ``(H[:,None] >> bits) & 1`` does all 32 votes in
    two vector ops per document. Values are pinned bit-exact by the
    pure-Python mirror in tests/test_llm_ops.py.
    """
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    nbits = _SIMHASH_BITS
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )

    def compute(batches):
        import numpy as np
        import pandas as pd

        bit_idx = np.arange(nbits, dtype=np.int64)
        bit_weights = (np.int64(1) << bit_idx)
        for pdf in batches:
            if pdf.empty:
                continue
            doc_words = [list(dict.fromkeys(t.split(" "))) for t in pdf["text"]]
            vocab = _np_word_hash_vocab(
                list({w for ws in doc_words for w in ws}), np
            )
            out = np.empty(len(doc_words), dtype=np.int64)
            for i, ws in enumerate(doc_words):
                hashes = np.fromiter(
                    (vocab[w] for w in ws), dtype=np.int64, count=len(ws)
                )
                ones = ((hashes[:, None] >> bit_idx) & 1).sum(axis=0)
                votes = 2 * ones - len(ws)
                out[i] = bit_weights[votes > 0].sum()
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return (
        docs.select("doc_id", "text")
        .mapInPandas(compute, schema=schema)
        .orderBy("doc_id")
    )


_SIMHASH_BANDS = 4
_HAMMING_MAX = 6

# wrap the simhash query as a CTE, then band + hamming-join it
_SIMHASH_PAIRS_ORACLE = f"""
    WITH sim AS ({_SIMHASH_ORACLE.replace("ORDER BY doc_id", "")}),
    bands AS (
      SELECT doc_id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS byte
      FROM sim, unnest(range(0, {_SIMHASH_BANDS})) t(b)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    ORDER BY doc_a, doc_b
"""



@query(
    "d_simhash_pairs",
    oracle=_SIMHASH_PAIRS_ORACLE,  # full SQL mirror: same fingerprints,
    # byte-band join, popcount-of-xor hamming filter
    covers="north-star dedup: SimHash banded near-dup pairs (hamming ≤ 6)",
)
def d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via SimHash: band the 32-bit fingerprint into 4
    bytes; candidates collide on ≥1 band (pigeonhole: hamming ≤ 6 over
    4 bands guarantees ≥1 clean band for distance ≤ 3 — banding is the
    recall knob); verify with exact popcount of the XOR.

    Scale: fingerprints are map-only; the band join shuffles on
    (band, byte) uniform keys; the hamming filter runs per candidate
    pair, never all-pairs.
    """
    sims = d_simhash(spark, sf_dir)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 8).bitwiseAND(F.lit(0xFF)).alias("byte"),
                    )
                    for b in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.byte")
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


_DEDUP_APPLY_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      {_NGRAM_JACCARD_ORACLE.replace("ORDER BY doc_a, doc_b", "")}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
                 FROM reach GROUP BY node)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
    ORDER BY d.doc_id
"""


@query(
    "d_dedup_apply",
    oracle=_DEDUP_APPLY_ORACLE,
    covers="north-star dedup: end-to-end cleaned corpus (keep cluster minimum)",
    bench=True,
)
def d_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline applied: documents minus near-duplicates,
    keeping each cluster's minimum doc_id as the canonical copy.

    Composition of d_dup_clusters (connected components) with a
    left-anti join back to the corpus — the actual 'write the cleaned
    training set' step.
    """
    clusters = d_dup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    drop = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    return (
        docs.join(drop, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------

_COS_DUP_THRESHOLD = 0.4


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns as a sequential
    left-fold — deterministic element order, engine-reproducible."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0).cast("double"), lambda acc, v: acc + v
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x * x), F.lit(0.0).cast("double"), lambda acc, v: acc + v
    )
    return dot / F.sqrt(na * nb)


_COS_DUP_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= {_COS_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
"""


# LSH tuning for the registered near-dup operator. k (planes per table,
# 2^k buckets) should grow ~log2(corpus/target_bucket_size) at scale; L
# (tables, OR-amplified) buys recall. At the oracle's low threshold 0.4
# hyperplane separation is weak, so L=40 is sized for measured recall
# 1.0 vs the all-pairs baseline at every test SF (worst pair hits by
# table 26; see tests/test_llm_ops.py) — production dedup thresholds
# (0.8+) reach recall with far fewer tables.
_NEARDUP_K = 3
_NEARDUP_L = 40


def _embedding_neardup_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs baseline — O(n²) nested-loop join, NOT
    registered; used only by pytest as the recall oracle for the
    LSH-bucketed operator below."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    sim = cosine_sim(F.col("a.e"), F.col("b.e"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("raw_sim"),
        )
        .filter(F.col("raw_sim") >= _COS_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("raw_sim", 6).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


@query(
    "d_embedding_neardup",
    oracle=_COS_DUP_ORACLE,
    covers="north-star dedup: embedding-cosine near-duplicate pairs (LSH-bucketed)",
)
def d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-duplicate pairs: hyperplane-hash the corpus
    into L×2^k buckets (one Arrow-batched numpy matmul, map-only),
    generate candidate pairs with a vectorized within-bucket matmul per
    (table, bucket) group, then confirm each candidate with the exact
    sequential-fold cosine so results are bit-identical to the all-pairs
    baseline (pytest asserts equality; the driver oracle stays the exact
    all-pairs SQL).

    Scale: no cartesian — the plan is a map-side bucketize, a hash
    shuffle on uniform (tbl, bucket) keys, a distinct on candidate
    pairs (tiny), and two equi-joins to fetch vectors for the exact
    re-check. Within-bucket work is numpy (≈n_b²·d flops per bucket),
    not per-pair Catalyst folds; bucket width is controlled by k.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from spark_sql_server_spark.operators.similarity import (
        _bucketize_pandas,
        _hyperplane,
    )

    dim = 64
    tables = [
        [_hyperplane(t * _NEARDUP_K + j + 1, dim) for j in range(_NEARDUP_K)]
        for t in range(_NEARDUP_L)
    ]
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bucketed = _bucketize_pandas(emb, tables)

    pair_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
        ]
    )
    # numpy prefilter slightly below the threshold; the exact fold below
    # makes the final membership decision, so summation-order noise
    # between numpy and the sequential fold cannot flip a pair
    prefilter = _COS_DUP_THRESHOLD - 1e-6

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        ids = pdf["vec_id"].to_numpy()
        E = np.vstack(pdf["e"].to_numpy())
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = En @ En.T
        i, j = np.triu_indices(len(ids), 1)
        hit = S[i, j] >= prefilter
        a, b = ids[i[hit]], ids[j[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    cand = (
        bucketed.groupBy("tbl", "bucket")
        .applyInPandas(bucket_pairs, schema=pair_schema)
        .distinct()  # a pair may collide in several tables
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    sim = cosine_sim(F.col("ea"), F.col("eb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("raw_sim"))
        .filter(F.col("raw_sim") >= _COS_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round("raw_sim", 6).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


_JAC_HIST_ORACLE = f"""
    WITH pairs AS (
      {_NGRAM_JACCARD_ORACLE.replace("ORDER BY doc_a, doc_b", "").replace(
        f">= {_JACCARD_THRESHOLD}", ">= 0.0")}
    )
    SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS decile,
           COUNT(*) AS n_pairs
    FROM pairs
    GROUP BY 1
    ORDER BY decile
"""


@query(
    "d_jaccard_histogram",
    oracle=_JAC_HIST_ORACLE,
    covers="north-star dedup diagnostics: pairwise-similarity histogram "
    "(how duplicated is this corpus?)",
)
def d_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of candidate-pair Jaccard similarity — the
    first diagnostic a curation team runs to pick a dedup threshold.

    Reuses the df-capped inverted-index pair counts with the threshold
    dropped (candidates still require ≥1 shared rare gram, identically
    in the oracle), then a 10-group aggregation: the pair volume is the
    corpus's candidate volume, and the histogram itself is constant
    size. FLOOR on an exact double ratio of integers is
    engine-reproducible.
    """
    counted = _pair_counts_for(load_table(spark, sf_dir, "documents"))
    # nab = na + nb (exact int64 from the pair aggregation) — same bits
    jac = F.col("inter").cast("double") / (
        F.col("nab") - F.col("inter")
    ).cast("double")
    return (
        counted.select(F.floor(jac * 10).cast("long").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) dedup over blocked candidates
# --------------------------------------------------------------------------

#: Minimum shared distinct rare grams for a pair to reach the
#: (quadratic-cost) edit-distance check.
_EDIT_MIN_SHARED = 3
#: Relative edit-distance threshold: dist ≤ this × longer text length.
_EDIT_REL_MAX = 0.3

_EDITDIST_ORACLE = f"""
    WITH shingled AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_NGRAM_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_NGRAM_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= {_NGRAM_N}
    ),
    postings AS (SELECT doc_id, unnest(grams) AS gram FROM shingled),
    rare AS (
      SELECT gram FROM postings GROUP BY gram
      HAVING COUNT(*) <= (SELECT LEAST({_GRAM_DF_FRACTION} * COUNT(*), {_GRAM_DF_CAP})
                          FROM documents)
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM postings a
      JOIN rare r ON a.gram = r.gram
      JOIN postings b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= {_EDIT_MIN_SHARED}
    )
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist
    FROM cand c
    JOIN documents x ON x.doc_id = c.doc_a
    JOIN documents y ON y.doc_id = c.doc_b
    WHERE levenshtein(x.text, y.text)
            <= {_EDIT_REL_MAX} * greatest(x.n_chars, y.n_chars)
    ORDER BY doc_a, doc_b
"""


@query(
    "d_editdist_dups",
    oracle=_EDITDIST_ORACLE,
    covers="north-star dedup: fuzzy duplicate pairs by exact edit "
    "distance over rare-gram-blocked candidates",
)
def d_editdist_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicates: candidate pairs sharing ≥3 distinct rare
    3-grams whose Levenshtein distance is ≤30% of the longer text.

    Edit distance is O(len²) per pair — never affordable all-pairs.
    The blocking ladder bounds who pays it: the df-capped inverted
    index proposes pairs, the ≥{_EDIT_MIN_SHARED}-shared-rare-grams
    floor prunes weak candidates, and only survivors run the quadratic
    string metric (JVM `levenshtein`, identical unit-cost definition in
    DuckDB). Same candidate generation as d_ngram_jaccard — one
    inverted-index self-join, no cartesian anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        _pair_counts_for(docs)
        .filter(F.col("rare_inter") >= _EDIT_MIN_SHARED)
        .select("doc_a", "doc_b")
    )
    xa = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("n_chars").alias("len_a"),
    )
    xb = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("n_chars").alias("len_b"),
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    return (
        pairs.join(xa, "doc_a")
        .join(xb, "doc_b")
        .filter(dist <= F.lit(_EDIT_REL_MAX) * F.greatest("len_a", "len_b"))
        .select("doc_a", "doc_b", dist.cast("long").alias("edit_dist"))
        .orderBy("doc_a", "doc_b")
    )


_MINHASH_EST_ORACLE = f"""
    WITH {_DUCK_SIG_CTES.format(N=3, P=16)},
    bands AS (
      SELECT doc_id, b AS band, sig[b*4+1:b*4+4] AS bv
      FROM sigs, unnest(range(0, 4)) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i])) / 16.0
             AS est_jaccard,
           CAST(len(list_intersect(ga.gh, gb.gh)) AS DOUBLE)
             / (len(ga.gh) + len(gb.gh) - len(list_intersect(ga.gh, gb.gh)))
             AS jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a
    JOIN sigs sb ON sb.doc_id = c.doc_b
    JOIN grams ga ON ga.doc_id = c.doc_a
    JOIN grams gb ON gb.doc_id = c.doc_b
    ORDER BY doc_a, doc_b
"""


@query(
    "d_minhash_est",
    oracle=_MINHASH_EST_ORACLE,
    covers="north-star dedup diagnostic: MinHash Jaccard estimate vs "
    "exact Jaccard per LSH candidate pair (estimator-quality audit)",
)
def d_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash estimate (matching permutation minima
    / 16) next to the exact gram-set Jaccard — the audit that tells a
    pipeline owner whether the configured (perms, bands) are tight
    enough before committing a 100 TB dedup run to them.

    Scale: candidates come from the same band-bucket join as
    d_minhash_lsh; signatures and distinct-gram-hash sets are joined
    only for candidate members (pair-count sized, not corpus²). Both
    outputs are exact integer ratios — no rounding needed for the hash
    gate. The gram sets reuse the portable polynomial hashes, so the
    DuckDB mirror reproduces them bit-for-bit.
    """
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    sig = _minhash_signatures_pandas(docs).localCheckpoint()
    rows_per_band = _NUM_PERM // _BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("band_hash"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # distinct gram-HASH sets (same polynomial hashes the signatures
    # minimize over, so DuckDB's `grams` CTE mirrors them exactly)
    words = F.split(F.col("text"), " ")
    grams_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("gh", T.ArrayType(T.LongType())),
        ]
    )

    def gram_hashes(batches):
        import numpy as np
        import pandas as pd

        n = _NGRAM_N
        for pdf in batches:
            if pdf.empty:
                continue
            doc_words = [t.split(" ") for t in pdf["text"]]
            vocab = _np_word_hash_vocab(
                list({w for ws in doc_words for w in ws}), np
            )
            ids, ghs = [], []
            for doc_id, ws in zip(pdf["doc_id"], doc_words):
                if len(ws) < n:
                    continue
                wh = np.fromiter(
                    (vocab[w] for w in ws), dtype=np.int64, count=len(ws)
                )
                g = wh[: len(ws) - n + 1].copy()
                for k in range(1, n):
                    g = (g * 31 + wh[k : len(ws) - n + 1 + k]) % MOD
                ids.append(doc_id)
                ghs.append(np.unique(g).tolist())
            if ids:
                yield pd.DataFrame({"doc_id": ids, "gh": ghs})

    from spark_sql_server_spark.session import spread

    gh = spread(docs.select("doc_id", "text")).mapInPandas(
        gram_hashes, schema=grams_schema
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    ga = gh.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("gh_a"))
    gb = gh.select(F.col("doc_id").alias("doc_b"), F.col("gh").alias("gh_b"))
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    inter = F.size(F.array_intersect("gh_a", "gh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches / F.lit(float(_NUM_PERM))).alias("est_jaccard"),
            (
                inter.cast("double")
                / (F.size("gh_a") + F.size("gh_b") - inter).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# d_incremental_dedup — admission control for a new shard vs the corpus
# --------------------------------------------------------------------------

#: The "daily shard": documents with doc_id ≡ 7 (mod 10) arrive today;
#: everything else is the already-ingested corpus.
_INC_SHARD_MOD, _INC_SHARD_REM = 10, 7

_INC_ORACLE = f"""
    WITH newdocs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_INC_SHARD_MOD} = {_INC_SHARD_REM}
    ),
    base AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_INC_SHARD_MOD} <> {_INC_SHARD_REM}
    ),
    exact_dup AS (
      SELECT DISTINCT n.doc_id FROM newdocs n
      JOIN base b ON md5(n.text) = md5(b.text)
    ),
    shingled_new AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_NGRAM_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_NGRAM_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM newdocs)
      WHERE len(words) >= {_NGRAM_N}
    ),
    shingled_base AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_NGRAM_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_NGRAM_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM base)
      WHERE len(words) >= {_NGRAM_N}
    ),
    postings_new AS (SELECT doc_id, unnest(grams) AS gram FROM shingled_new),
    postings_base AS (SELECT doc_id, unnest(grams) AS gram FROM shingled_base),
    rare AS (
      SELECT gram FROM postings_base GROUP BY gram
      HAVING COUNT(*) <= (SELECT LEAST({_GRAM_DF_FRACTION} * COUNT(*),
                                       {_GRAM_DF_CAP}) FROM base)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
      FROM postings_new a
      JOIN rare r ON a.gram = r.gram
      JOIN postings_base b ON a.gram = b.gram
    ),
    near AS (
      SELECT DISTINCT c.new_id AS doc_id
      FROM cand c
      JOIN shingled_new a ON a.doc_id = c.new_id
      JOIN shingled_base b ON b.doc_id = c.base_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
              / (len(a.grams) + len(b.grams)
                 - len(list_intersect(a.grams, b.grams)))
            >= {_JACCARD_THRESHOLD}
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'dup_exact'
                WHEN nr.doc_id IS NOT NULL THEN 'dup_near'
                ELSE 'new' END AS status
    FROM newdocs d
    LEFT JOIN exact_dup e ON d.doc_id = e.doc_id
    LEFT JOIN near nr ON d.doc_id = nr.doc_id
    ORDER BY d.doc_id
"""


@query(
    "d_incremental_dedup",
    oracle=_INC_ORACLE,
    covers="north-star dedup: incremental shard admission vs the existing "
    "corpus (exact hash + near-dup against the corpus index only — "
    "no corpus-side recomputation of pairs)",
)
def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission control for a newly-arrived shard: each new document is
    labeled ``dup_exact`` (content hash already in the corpus),
    ``dup_near`` (3-gram Jaccard ≥ 0.5 with some corpus document, via
    the corpus's rare-gram inverted index), or ``new``.

    This is the shape that matters for a continuously-ingesting 100 TB
    pipeline: cost scales with |shard| × index-lookup, NOT with
    |corpus|² — the corpus side contributes only (a) a content-hash set
    (fixed-width semi-join) and (b) its gram posting lists, both of
    which a production system keeps materialized between runs; no
    corpus-vs-corpus pair is ever generated (contrast d_ngram_jaccard,
    which scores the whole corpus). The df cap comes from the BASE
    index (a stop-gram list is a property of the corpus, not of the
    day's shard), bounding every posting join exactly as in
    ``_pair_counts_for``. Jaccard stays exact via the same
    rare-join + common-gram-correction split."""
    from spark_sql_server_spark.session import spread

    from pyspark.sql import Observation

    docs = spread(load_table(spark, sf_dir, "documents"))
    is_new = (F.col("doc_id") % _INC_SHARD_MOD) == F.lit(_INC_SHARD_REM)
    newdocs = docs.filter(is_new)
    base = docs.filter(~is_new)
    # r13: the corpus-side doc count rides the base postings
    # checkpoint's job (same observe() discipline as _pair_counts_for —
    # the r12 form inlined a full corpus scan per `common` reference)
    _base_obs = Observation()
    base = base.observe(_base_obs, F.count(F.lit(1)).alias("n"))

    # exact admission: fixed-width hash semi-join against the corpus
    exact_ids = (
        newdocs.select("doc_id", F.md5("text").alias("h"))
        .join(base.select(F.md5("text").alias("h")).distinct(), "h", "left_semi")
        .select("doc_id")
    )

    def shingle(side: DataFrame) -> DataFrame:
        # r12: compiled-JVM shingling (see shingled_frame)
        return shingled_frame(side, _NGRAM_N)

    def postings(sh: DataFrame) -> DataFrame:
        # explode_outer + int64 gram keys + one checkpoint per side:
        # the same three hot-path rules as _pair_counts_for (see its
        # docstring for the InferFiltersFromGenerate / CacheManager
        # rationale)
        return (
            sh.select(
                "doc_id",
                F.explode_outer("grams").alias("gram"),
                F.size("grams").alias("n_grams"),
            )
            .select("doc_id", F.xxhash64("gram").alias("gkey"), "n_grams")
            .localCheckpoint()
        )

    post_new = postings(shingle(newdocs))
    post_base = postings(shingle(base))

    # r13: literal cap + checkpointed stop-gram list with an observed
    # count — `common` is consumed FOUR times below (two anti-joins +
    # two common-set builds) and the r12 spelling re-derived the whole
    # df aggregation (with a corpus scan for n_base inside) per
    # reference; when nothing caps out (every test SF) all four
    # consumers are identity/empty and are skipped adaptively (see
    # _pair_counts_for — identical exactness argument).
    n_base_docs = _base_obs.get["n"]
    cap = min(_GRAM_DF_FRACTION * n_base_docs, float(_GRAM_DF_CAP))
    # stop-gram list of the CORPUS index — tiny (≤ postings/cap keys)
    _common_obs = Observation()
    common = (
        post_base.groupBy("gkey")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > F.lit(cap))
        .select("gkey")
        .observe(_common_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_common = _common_obs.get["n"]
    if n_common == 0:
        rare_new, rare_base = post_new, post_base
    else:
        rare_new = post_new.join(F.broadcast(common), "gkey", "left_anti")
        rare_base = post_base.join(F.broadcast(common), "gkey", "left_anti")
    # r12 wave 11: (new_id, base_id) grouping key only; na + nb rides
    # as ONE aggregated exact int64 (constant per pair — see
    # _pair_counts_for's nab note)
    rare_shared = (
        rare_new.alias("a")
        .join(rare_base.alias("b"), F.col("a.gkey") == F.col("b.gkey"))
        .groupBy(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("base_id"),
        )
        .agg(
            F.count("*").alias("rare_inter"),
            F.max(F.col("a.n_grams") + F.col("b.n_grams")).alias("nab"),
        )
    )

    def common_sets(post: DataFrame, key: str) -> DataFrame:
        return (
            post.join(F.broadcast(common), "gkey")
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list("gkey")).alias(f"cg_{key}"))
            .withColumnRenamed("doc_id", key)
        )

    empty = F.array().cast("array<long>")
    if n_common == 0:
        # no capped-out corpus grams: the correction term is exactly 0
        pairs = rare_shared.withColumn("inter", F.col("rare_inter"))
    else:
        pairs = (
            rare_shared.join(common_sets(post_new, "new_id"), "new_id", "left")
            .join(common_sets(post_base, "base_id"), "base_id", "left")
            .withColumn(
                "inter",
                F.col("rare_inter")
                + F.size(
                    F.array_intersect(
                        F.coalesce("cg_new_id", empty),
                        F.coalesce("cg_base_id", empty),
                    )
                ),
            )
        )
    jac = F.col("inter").cast("double") / (
        F.col("nab") - F.col("inter")
    ).cast("double")
    near_ids = (
        pairs.filter(jac >= _JACCARD_THRESHOLD).select(
            F.col("new_id").alias("doc_id")
        )
    ).distinct()

    return (
        newdocs.select("doc_id")
        .join(exact_ids.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_ids.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, "dup_exact")
            .when(F.col("is_near") == 1, "dup_near")
            .otherwise("new")
            .alias("status"),
        )
        .orderBy("doc_id")
    )
