"""End-to-end corpus-curation pipeline — the composite the engine
exists for: quality gate → exact dedup → near-dup cluster removal →
benchmark decontamination, in one oracle-checked operator.

Stage order follows production practice (cheap map-side filters first,
the expensive pair-generation join only over survivors):

1. **Quality**: keep documents with Gopher-style score ≥ 3
   (map-only expression).
2. **Exact dedup**: keep the minimum doc_id per md5(text) group
   (one fixed-width-key shuffle).
3. **Near-dup removal**: 3-gram Jaccard pairs over the survivors →
   connected components → drop non-minimum cluster members
   (df-capped inverted-index join + iterative label propagation).
4. **Decontamination**: drop the eval subset itself and any training
   document whose 8-gram overlap with the eval subset reaches half
   (broadcast semi-join).

The DuckDB oracle mirrors the exact same staged set algebra (recursive
CTE for the components), so the driver hash-certifies the whole
pipeline, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.dedup import (
    _JACCARD_THRESHOLD,
    _NGRAM_JACCARD_ORACLE,
    _jaccard_pairs_for,
    _propagate_min_labels,
)
from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.operators.sampling import (
    _DECON_EVAL_MOD,
    _DECON_N,
    decontam_flags_for,
)
from spark_sql_server_spark.operators.textops import (
    QUALITY_SCORE_SQL,
    quality_score_col,
)
from spark_sql_server_spark.session import load_table

_MIN_QUALITY = 3

_SCOPED_JACCARD = _NGRAM_JACCARD_ORACLE.replace(
    "FROM documents", "FROM ex"
).replace("ORDER BY doc_a, doc_b", "")

_PIPE_ORACLE = f"""
    WITH RECURSIVE
    qual AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE ({QUALITY_SCORE_SQL}) >= {_MIN_QUALITY}
    ),
    ex AS (
      SELECT doc_id, text, lang, source, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM qual
      ) t WHERE rn = 1
    ),
    pairs AS (
      {_SCOPED_JACCARD}
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
                 FROM reach GROUP BY node),
    nd AS (
      SELECT e.* FROM ex e LEFT JOIN clusters c ON e.doc_id = c.doc_id
      WHERE c.doc_id IS NULL OR c.cluster_id = e.doc_id
    ),
    dsh AS (
      SELECT doc_id,
             list_distinct([
               array_to_string(words[i:i+{_DECON_N - 1}], ' ')
               FOR i IN range(1, len(words) - {_DECON_N - 1} + 1)
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM nd)
      WHERE len(words) >= {_DECON_N}
    ),
    deval AS (
      SELECT DISTINCT unnest(grams) AS gram FROM dsh
      WHERE doc_id % {_DECON_EVAL_MOD} = 0
    ),
    dhits AS (
      SELECT t.doc_id, COUNT(*) AS n_hit
      FROM (SELECT doc_id, unnest(grams) AS gram FROM dsh
            WHERE doc_id % {_DECON_EVAL_MOD} <> 0) t
      JOIN deval e ON t.gram = e.gram
      GROUP BY t.doc_id
    )
    SELECT nd.doc_id, nd.lang, nd.source, nd.n_chars
    FROM nd
    LEFT JOIN dsh s ON nd.doc_id = s.doc_id
    LEFT JOIN dhits h ON nd.doc_id = h.doc_id
    WHERE nd.doc_id % {_DECON_EVAL_MOD} <> 0
      AND (s.doc_id IS NULL OR 2 * COALESCE(h.n_hit, 0) < len(s.grams))
    ORDER BY nd.doc_id
"""


@query(
    "pipe_curate_corpus",
    oracle=_PIPE_ORACLE,
    covers="north-star pipeline composite: quality gate → exact dedup → "
    "near-dup cluster removal → decontamination, hash-certified "
    "end to end",
    bench=True,
)
def pipe_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain a training-data team actually runs,
    composed from the library's staged helpers.

    Scale: every stage keeps its individual design (map-only quality
    filter; fixed-width-key exact-dedup shuffle; df-capped int64-keyed
    inverted-index pair join over *survivors only* — the expensive
    stage sees the corpus after the cheap gates; checkpointed label
    propagation; broadcast decontamination semi-join). No stage
    collects data to the driver; the composition adds no new shuffle
    beyond its parts.
    """
    return (
        curated_docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept documents (all columns, including text) after the full
    curation chain — shared by pipe_curate_corpus (reports the corpus)
    and pipe_build_dataset (packs it into training windows)."""
    docs = load_table(spark, sf_dir, "documents")

    qual = docs.filter(quality_score_col(F.col("text")) >= _MIN_QUALITY)

    from pyspark.sql.window import Window as W

    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    ex = (
        qual.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .drop("rn")
        # three downstream consumers (pair join sides + anti join);
        # checkpoint once so the quality+dedup stages run once
        .localCheckpoint()
    )

    pairs = _jaccard_pairs_for(ex).select("doc_a", "doc_b")
    clusters = _propagate_min_labels(pairs)
    drop = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    nd = ex.join(drop, "doc_id", "left_anti").localCheckpoint()

    flags = decontam_flags_for(nd)
    contaminated = flags.filter(F.col("contaminated")).select("doc_id")
    return nd.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0).join(
        contaminated, "doc_id", "left_anti"
    )


# ---------------------------------------------------------------------------
# pipe_build_dataset: curated corpus → 2048-token training windows →
# per-window manifest, hash-certified end to end.
# ---------------------------------------------------------------------------

def _build_dataset_oracle() -> str:
    """Splice the curation CTE chain and the context-packing CTE chain
    into one recursive-CTE oracle: the packing side reads the ``kept``
    set instead of raw ``documents``."""
    from spark_sql_server_spark.operators.textops import _PACK_SQL

    pipe_ctes = _PIPE_ORACLE[: _PIPE_ORACLE.index("SELECT nd.doc_id")]
    pack = _PACK_SQL.format(NWORDS="len(string_split(text, ' '))")
    pack_ctes = pack[pack.index("toks AS") : pack.index("SELECT l.doc_id")]
    # the CTE block ends with the offsets CTE close paren + whitespace;
    # trim back to the paren so the comma splice is valid SQL
    pack_ctes = pack_ctes[: pack_ctes.rindex(")") + 1]
    pack_final = pack[pack.index("SELECT l.doc_id") :].replace(
        "ORDER BY doc_id", ""
    )
    return f"""
    {pipe_ctes.rstrip().rstrip(',')},
    kept AS (
      SELECT nd.doc_id, nd.text FROM nd
      LEFT JOIN dsh s ON nd.doc_id = s.doc_id
      LEFT JOIN dhits h ON nd.doc_id = h.doc_id
      WHERE nd.doc_id % {_DECON_EVAL_MOD} <> 0
        AND (s.doc_id IS NULL OR 2 * COALESCE(h.n_hit, 0) < len(s.grams))
    ),
    {pack_ctes.replace("FROM documents", "FROM kept")},
    packed AS ({pack_final})
    SELECT window_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS window_tokens
    FROM packed
    GROUP BY window_id
    ORDER BY window_id
"""


@query(
    "pipe_build_dataset",
    oracle=_build_dataset_oracle(),
    covers="north-star pipeline composite: curated corpus → 2048-token "
    "context windows → per-window shard manifest, one oracle for the "
    "whole build",
    bench=True,
)
def pipe_build_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after curation: pack the kept documents into
    2048-token training windows and emit the per-window manifest
    (docs packed, tokens filled) a shard writer consumes.

    Scale: the curation chain keeps its staged design; packing inherits
    t_pack_contexts' shard-partitioned running sum (no global window —
    the only cross-shard step is a 256-row offset aggregation); the
    manifest aggregate collapses map-side to one row per window. r12:
    the packing runs through :func:`packed_windows` — ONE tokenize +
    window pass over the narrow checkpointed token proxy (the SQL
    spelling re-ran the pipeline once per ``local`` CTE consumer), and
    the temp-view splice is gone with it.
    """
    from spark_sql_server_spark.operators.textops import packed_windows

    # no checkpoint here any more: the curated set is consumed exactly
    # once (packed_windows' narrow token-proxy build, which is itself
    # checkpointed) — the old spelling needed it because the packing
    # SQL read the curated view once per `local` CTE consumer
    kept = curated_docs(spark, sf_dir).select("doc_id", "text")
    packed = packed_windows(kept)
    return (
        packed.groupBy("window_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("window_tokens"),
        )
        .orderBy("window_id")
    )
