"""Similarity search (approximate nearest neighbors) over embeddings.

Beyond-reference surface: brute-force cosine top-k as the correctness
baseline, plus a random-hyperplane LSH-bucketed variant as the scale
path (bucket join instead of cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

_TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors

_BRUTE_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {_N_QUERIES}),
         scored AS (
           SELECT q.qid, v.vec_id,
                  list_cosine_similarity(q.qe, v.e) AS raw_sim
           FROM q JOIN v ON v.vec_id <> q.qid
         ),
         ranked AS (
           SELECT qid, vec_id, raw_sim,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY ROUND(raw_sim, 6) DESC, vec_id) AS rnk
           FROM scored
         )
    SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor,
           ROUND(raw_sim, 6) AS cos_sim
    FROM ranked WHERE rnk <= {_TOP_K}
    ORDER BY qid, rnk
"""


@query(
    "s_ann_bruteforce",
    oracle=_BRUTE_ORACLE,
    covers="north-star similarity search: brute-force cosine top-k",
    bench=True,
)
def s_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors for a small query set.

    Scale: the query side is tiny (a bounded O(|Q|) collect, the
    s_ann_ivf discipline) and rides an ``sc.broadcast``; the corpus is
    scanned exactly once, map-only. Ranking key is cosine rounded to
    6dp with vec_id tiebreak → deterministic across engines.

    r12 (guide §4.2): scoring used to be `cosine_sim` — an interpreted
    Catalyst HOF fold per (corpus row × query) pair, |corpus|·|Q| folds
    of 64 elements each (the same anti-pattern `_bucketize_pandas`'s
    docstring measured at ~2.3 s per 5k×64·32). One Arrow-batched numpy
    pass now computes every pair — but accumulated DIMENSION-BY-
    DIMENSION (`D += E[:,i]·Q[:,i]`, `na += E[:,i]²`), so each cell
    sees the IDENTICAL sequential IEEE add/mul sequence as the HOF
    left-fold and `dot / sqrt(na·nb)` is bit-identical to
    `cosine_sim` (a numpy matmul would re-associate the sum and shift
    6dp-boundary values — pinned by
    tests/test_llm_ops.py::test_bruteforce_fold_bit_identity).
    ROUND(…, 6) stays in Spark — Python has no BigDecimal-HALF_UP twin.
    """
    import numpy as np

    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qrows = emb.filter(F.col("vec_id") < _N_QUERIES).collect()
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.e for r in qrows], dtype=np.float64)
    nb = np.zeros(len(qids), dtype=np.float64)
    for i in range(Q.shape[1]):
        nb += Q[:, i] * Q[:, i]
    bq = spark.sparkContext.broadcast((qids, Q, nb))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )

    def score(batches):
        import pandas as pd

        b_qids, b_q, b_nb = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            E = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            n, dim = E.shape
            D = np.zeros((n, len(b_qids)), dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            for i in range(dim):
                col = E[:, i]
                D += col[:, None] * b_q[None, :, i]
                na += col * col
            cos = D / np.sqrt(na[:, None] * b_nb[None, :])
            r, j = np.nonzero(ids[:, None] != b_qids[None, :])
            yield pd.DataFrame(
                {"qid": b_qids[j], "vec_id": ids[r], "cos_raw": cos[r, j]}
            )

    scored = emb.mapInPandas(score, schema=schema).select(
        "qid", "vec_id", F.round("cos_raw", 6).alias("cos_sim")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "rnk", F.col("vec_id").alias("neighbor"), "cos_sim")
        .orderBy("qid", "rnk")
    )


_N_TABLES = 8  # LSH tables (OR-amplification: a pair matches if ANY table agrees)
_PLANES_PER_TABLE = 4  # planes per table (AND-amplification within a table)


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (LCG — no numpy
    at plan-build time, reproducible everywhere)."""
    vals = []
    state = seed * 6364136223846793005 + 1442695040888963407
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return vals


def _hyperplane_micro(seed: int, dim: int) -> list[int]:
    """Hyperplane components quantized to int64 micros — exact integer
    constants shared verbatim by the Spark operator and the DuckDB
    oracle, so sign-of-dot bucket bits are bit-identical everywhere."""
    import math

    return [int(math.floor(v * 1e6 + 0.5)) for v in _hyperplane(seed, dim)]


def _lsh_bucket(e: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit signature → integer bucket id."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(e, plane, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _bucketize_pandas(emb, tables: list[list[list[float]]]):
    """(vec_id, e) → exploded (vec_id, e, tbl, bucket) via an
    Arrow-batched numpy matmul.

    32 sign-of-dot-product bits per vector: as Catalyst HOF expressions
    this is 32 interpreted folds per row (measured ~2.3 s at 5k×64);
    one batched ``E @ P.T`` computes every plane at once. This is the
    vectorized-batch pattern every heavy per-vector op should use at
    scale — map-only, no shuffle, no driver involvement.
    """
    import numpy as np

    from pyspark.sql import types as T

    planes = np.array(
        [p for table in tables for p in table], dtype=np.float64
    )  # (n_tables*k, dim)
    n_tables = len(tables)
    k = len(tables[0])
    weights = (2 ** np.arange(k, dtype=np.int64))[None, None, :]

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.DoubleType())),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def bucketize(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            E = np.vstack(pdf["e"].to_numpy())  # (n, dim)
            bits = (E @ planes.T >= 0).reshape(len(pdf), n_tables, k)
            buckets = (bits * weights).sum(axis=2)  # (n, n_tables)
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(n_tables),
                    "e": pdf["e"].to_numpy().repeat(n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )
            yield out

    return emb.mapInPandas(bucketize, schema=schema)


def _lsh_table_buckets(e: Column, tables: list[list[list[float]]]) -> Column:
    """array<struct<tbl,bucket>> — one signature per LSH table.

    Multi-table (OR-amplified) hyperplane LSH: k planes AND-ed within a
    table, L tables OR-ed across. With low-cosine corpora a single
    k-plane table has collision probability (1-θ/π)^k ≈ nothing; L
    tables recover recall at L× the candidate volume.
    """
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _lsh_bucket(e, planes).alias("bucket"),
            )
            for t, planes in enumerate(tables)
        ]
    )


def _lsh_micro_tables(dim: int) -> list[list[list[int]]]:
    """The L×k hyperplanes of `s_ann_lsh`, quantized to int64 micros —
    the single source of truth for the operator AND its oracle."""
    return [
        [
            _hyperplane_micro(t * _PLANES_PER_TABLE + j + 1, dim)
            for j in range(_PLANES_PER_TABLE)
        ]
        for t in range(_N_TABLES)
    ]


def _lsh_micro_oracle(dim: int = 64) -> str:
    """DuckDB twin of the fixed-point LSH probe.

    Bucket bits are signs of EXACT int64 dot products (micro-quantized
    embeddings × micro-quantized plane literals; |term| ≤ 5.8e11, 64-dim
    sums ≤ 3.8e13 ≪ 2^63), so bucket membership — the approximate part
    of ANN-LSH — is bit-identical across engines under any evaluation
    order. Candidate scoring then mirrors `_BRUTE_ORACLE`: raw cosine,
    ROUND 6, vec_id tiebreak. The plane constants are inlined by
    `_lsh_micro_tables`, which the Spark operator shares verbatim.
    """
    rows = []
    for t, planes in enumerate(_lsh_micro_tables(dim)):
        for j, p in enumerate(planes):
            lit = "[" + ", ".join(str(v) for v in p) + "]"
            rows.append(f"({t}, {1 << j}, CAST({lit} AS BIGINT[]))")
    values = ", ".join(rows)
    return f"""
    WITH m AS (SELECT vec_id,
                      list_transform(embedding, x ->
                        CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS mv,
                      CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
         dims AS (SELECT CAST(range AS INT) + 1 AS pos FROM range({dim})),
         pts AS (SELECT vec_id, pos, mv[pos] AS v FROM m CROSS JOIN dims),
         planes AS (SELECT * FROM (VALUES {values}) AS t(tbl, wj, p)),
         pw AS (SELECT tbl, wj, pos, p[pos] AS w FROM planes CROSS JOIN dims),
         dots AS (SELECT pts.vec_id, pw.tbl, pw.wj,
                         CAST(SUM(pts.v * pw.w) AS BIGINT) AS dot
                  FROM pts JOIN pw ON pts.pos = pw.pos
                  GROUP BY pts.vec_id, pw.tbl, pw.wj),
         buckets AS (SELECT vec_id, tbl,
                            SUM(CASE WHEN dot >= 0 THEN wj ELSE 0 END) AS bucket
                     FROM dots GROUP BY vec_id, tbl),
         qb AS (SELECT vec_id AS qid, tbl, bucket FROM buckets
                WHERE vec_id < {_N_QUERIES}),
         cand AS (SELECT DISTINCT qb.qid, b.vec_id
                  FROM buckets b JOIN qb
                    ON b.tbl = qb.tbl AND b.bucket = qb.bucket
                   AND b.vec_id <> qb.qid),
         scored AS (SELECT c.qid, c.vec_id,
                           list_cosine_similarity(mq.e, mv_.e) AS raw_sim
                    FROM cand c
                    JOIN m mq ON mq.vec_id = c.qid
                    JOIN m mv_ ON mv_.vec_id = c.vec_id),
         ranked AS (SELECT qid, vec_id, raw_sim,
                           ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY ROUND(raw_sim, 6) DESC, vec_id) AS rnk
                    FROM scored)
    SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor,
           ROUND(raw_sim, 6) AS cos_sim
    FROM ranked WHERE rnk <= {_TOP_K}
    ORDER BY qid, rnk
    """


@query(
    "s_ann_lsh",
    oracle=_lsh_micro_oracle(64),
    covers="north-star similarity search: random-hyperplane LSH buckets, "
    "fixed-point bucket signs so candidate selection + ranking are "
    "oracle-certified",
    bench=True,
)
def s_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share a random-hyperplane signature
    with a query in at least one of L tables.

    Scale shape: the query set is a constant-size input (10 vectors —
    it does not grow with the corpus), so it is collected once and
    broadcast as a numpy matrix; the corpus is then scanned in a single
    map-only pass that computes all L bucket signatures per batch with
    one matmul, finds (corpus, query) bucket collisions with one
    broadcast compare, and scores the collisions with a batched einsum.
    No join, no shuffle of vectors — the only shuffled data is the
    (qid, vec_id, cos_sim) triples feeding the per-query top-k window.
    The r1 shape (explode to L bucket keys → broadcast-join → per-
    candidate HOF cosine) shuffled L rows per corpus vector and paid 3
    interpreted Catalyst folds per candidate. For *large* query sets the
    bucket-join form is the right plan — `d_embedding_neardup` keeps
    that pattern (applyInPandas over (tbl, bucket) groups).

    r5: bucket bits are signs of EXACT int64 micro dot products (the
    `s_kmeans`/`s_ann_ivf` fixed-point pattern), so the candidate set —
    the genuinely approximate part of LSH — is deterministic across
    engines and partitionings, and the whole probe is DuckDB-oracle
    certified (`_lsh_micro_oracle` inlines the same plane constants).
    Cosine ranking stays on the float path (ROUND 6 + vec_id tiebreak,
    exactly `s_ann_bruteforce`'s certified formulation).
    """
    import numpy as np

    from pyspark.sql import types as T

    dim = 64
    planes = np.array(
        [p for table in _lsh_micro_tables(dim) for p in table], dtype=np.int64
    )  # (L*k, dim) micro-quantized
    n_tables, k = _N_TABLES, _PLANES_PER_TABLE
    weights = (2 ** np.arange(k, dtype=np.int64))[None, None, :]

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "CAST(embedding AS array<double>) AS e",
        f"{_EMB_MICRO_EXPR} AS m",
    )
    # constant-size query side: vec_id < N pushes down to the parquet
    # scan, and the 10×dim matrix rides to executors as a broadcast
    qrows = emb.filter(F.col("vec_id") < _N_QUERIES).collect()
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.e for r in qrows], dtype=np.float64)
    QM = np.array([r.m for r in qrows], dtype=np.int64)
    qbits = (QM @ planes.T >= 0).reshape(len(qids), n_tables, k)
    qbuckets = (qbits * weights).sum(axis=2)  # (nq, L)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, Qn, qbuckets))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def match(batches):
        import pandas as pd

        b_qids, b_qn, b_qbuckets = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            E = np.vstack(pdf["e"].to_numpy())
            M = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
            bits = (M @ planes.T >= 0).reshape(len(ids), n_tables, k)
            buckets = (bits * weights).sum(axis=2)  # (n, L)
            # OR over tables: candidate iff any table's bucket matches
            coll = (buckets[:, None, :] == b_qbuckets[None, :, :]).any(axis=2)
            coll &= ids[:, None] != b_qids[None, :]
            i, j = np.nonzero(coll)
            if i.size == 0:
                continue
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            cos = np.round(np.einsum("ij,ij->i", En[i], b_qn[j]), 6)
            yield pd.DataFrame(
                {"qid": b_qids[j], "vec_id": ids[i], "cos_sim": cos}
            )

    scored = emb.mapInPandas(match, schema=schema)
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "rnk", F.col("vec_id").alias("neighbor"), "cos_sim")
        .orderBy("qid", "rnk")
    )


_NPROBE = 4


def _ivf_micro_oracle(nq: int, nprobe: int, top_k: int, dim: int) -> str:
    """DuckDB twin of the integer-L2 IVF probe: per-label micro-mean
    centroids, nprobe nearest clusters per query, exact re-rank within
    probed clusters — every quantity an exact int64."""
    argmin1 = (
        "SELECT vec_id, cluster FROM (SELECT vec_id, cluster, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn "
        "FROM va) WHERE rn = 1"
    )
    return (
        "WITH m AS (SELECT vec_id, label, list_transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS e "
        "FROM embeddings)"
        f", dims AS (SELECT CAST(range AS INT) + 1 AS pos FROM range({dim}))"
        ", pts AS (SELECT vec_id, label, pos, e[pos] AS v FROM m CROSS JOIN dims)"
        ", cent AS (SELECT label AS cluster, pos, "
        "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c "
        "FROM pts GROUP BY label, pos)"
        f", q AS (SELECT vec_id AS qid, pos, v FROM pts WHERE vec_id < {nq})"
        ", qc AS (SELECT q.qid, c.cluster, "
        "CAST(SUM((q.v - c.c) * (q.v - c.c)) AS BIGINT) AS d2 "
        "FROM q JOIN cent c ON q.pos = c.pos GROUP BY q.qid, c.cluster)"
        ", probes AS (SELECT qid, cluster FROM (SELECT qid, cluster, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cluster) AS rn "
        f"FROM qc) WHERE rn <= {nprobe})"
        ", va AS (SELECT p.vec_id, c.cluster, "
        "CAST(SUM((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS d2 "
        "FROM pts p JOIN cent c ON p.pos = c.pos GROUP BY p.vec_id, c.cluster)"
        f", asg AS ({argmin1})"
        ", cand AS (SELECT pr.qid, a.vec_id FROM asg a "
        "JOIN probes pr ON a.cluster = pr.cluster WHERE a.vec_id <> pr.qid)"
        ", scored AS (SELECT cd.qid, cd.vec_id, "
        "CAST(SUM((p.v - q.v) * (p.v - q.v)) AS BIGINT) AS d2 "
        "FROM cand cd JOIN pts p ON p.vec_id = cd.vec_id "
        "JOIN q ON q.qid = cd.qid AND q.pos = p.pos "
        "GROUP BY cd.qid, cd.vec_id)"
        ", ranked AS (SELECT qid, vec_id, d2, ROW_NUMBER() OVER ("
        "PARTITION BY qid ORDER BY d2, vec_id) AS rnk FROM scored)"
        " SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor, "
        f"d2 AS dist2 FROM ranked WHERE rnk <= {top_k} ORDER BY qid, rnk"
    )


@query(
    "s_ann_ivf",
    oracle=_ivf_micro_oracle(_N_QUERIES, _NPROBE, _TOP_K, 64),
    covers="north-star similarity search: IVF (coarse quantize → probe "
    "clusters), exact integer-L2 so probe + rank are oracle-certified",
    bench=True,
)
def s_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: centroids as the coarse codebook, queries probe
    their _NPROBE nearest clusters and rank only those clusters'
    vectors — the FAISS IVF-flat L2 formulation.

    Scale shape: the codebook is one elementwise-sum aggregation
    (posexplode + groupBy(cluster, dim)) whose output is k×dim rows —
    small at any corpus size — collected and broadcast exactly like a
    k-means model would be. The query set is likewise constant-size
    (10 vectors). Ranking is then a single map-only corpus pass: one
    numpy matmul assigns each batch to its nearest centroid, a second
    scores it against the (≤ nprobe·|Q|) queries probing that cluster.
    No join, no shuffle of vectors.

    r5: distances are exact int64 micro-space squared-L2 (ties break on
    cluster id / vec_id), and centroids are floor(sum/count) of exact
    integer sums — deterministic under any agg order, so probe
    selection, cluster assignment, and the final top-k are all
    DuckDB-oracle certified. Cosine ranking lives on in
    `s_ann_bruteforce`/`s_ann_lsh`.
    """
    import numpy as np

    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", f"{_EMB_MICRO_EXPR} AS m"
    )
    # codebook: per-label elementwise micro-mean (label standing in for
    # a k-means assignment — deterministic and cheap); integer sums →
    # exact under any partial-agg order
    centroids = (
        emb.select("label", F.posexplode("m").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("cm")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cm"))).alias("pm"))
        .select(
            F.col("label").alias("cluster"),
            F.transform("pm", lambda s: s.cm).alias("c"),
        )
    ).collect()
    clusters = np.array([r.cluster for r in centroids], dtype=np.int64)
    C = np.array([r.c for r in centroids], dtype=np.int64)

    qrows = emb.filter(F.col("vec_id") < _N_QUERIES).select("vec_id", "m").collect()
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([r.m for r in qrows], dtype=np.int64)
    # per query: the _NPROBE clusters it probes (exact integer d2 asc,
    # cluster id tiebreak)
    qd2 = (Q * Q).sum(1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(1)[None, :]
    order = np.lexsort((clusters[None, :].repeat(len(qids), 0), qd2), axis=1)
    probed = order[:, :_NPROBE]  # (nq, nprobe) indices into clusters
    probes_mask = np.zeros((len(clusters), len(qids)), dtype=bool)
    for j in range(len(qids)):
        probes_mask[probed[j], j] = True
    bq = spark.sparkContext.broadcast((qids, Q, clusters, C, probes_mask))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("dist2", T.LongType()),
        ]
    )

    def probe(batches):
        import pandas as pd

        b_qids, b_q, b_clusters, b_c, b_mask = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            E = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
            cd2 = (E * E).sum(1)[:, None] - 2 * (E @ b_c.T) + (b_c * b_c).sum(1)[None, :]
            # nearest centroid, cluster-id tiebreak (matches the oracle
            # window ORDER BY d2, cluster)
            assign = np.lexsort(
                (b_clusters[None, :].repeat(len(ids), 0), cd2), axis=1
            )[:, 0]
            cand = b_mask[assign]  # (n, nq): query probes this row's cluster
            cand &= ids[:, None] != b_qids[None, :]
            i, j = np.nonzero(cand)
            if i.size == 0:
                continue
            diff = E[i] - b_q[j]
            yield pd.DataFrame(
                {
                    "qid": b_qids[j],
                    "vec_id": ids[i],
                    "dist2": np.einsum("ij,ij->i", diff, diff),
                }
            )

    scored = emb.select("vec_id", "m").mapInPandas(probe, schema=schema)
    w = W.partitionBy("qid").orderBy(F.col("dist2"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "rnk", F.col("vec_id").alias("neighbor"), "dist2")
        .orderBy("qid", "rnk")
    )


_KMEANS_K = 8
_KMEANS_ITERS = 5


def _tree_reduce_partials(parts: DataFrame, keys: list[str]) -> DataFrame:
    """Reduce per-batch (key..., s: array<double>, n) partial rows to
    one row per (key..., component position) BEFORE any driver collect.

    posexplode fans each partial into its vector components, and the
    groupBy pre-aggregates executor-side (map-side combine), so the
    shuffle moves at most shuffle_partitions×k×dim rows and the collect
    returns exactly k×dim rows — independent of the input partition
    count. Without this, the driver would fold O(P×k×dim) raw partials
    (100s of MB at 100k+ partitions)."""
    return (
        parts.select(*keys, "n", F.posexplode("s").alias("pos", "v"))
        .groupBy(*keys, "pos")
        .agg(F.sum("v").alias("sv"), F.sum("n").alias("cn"))
    )


_EMB_DIM = 64

#: r12 (guide §2.4/§5): ceiling on the int64 component values the DRIVER
#: may fold directly from per-task partial rows (n_partitions × k × dim;
#: 2M values ≈ 16 MB). At or below it, each Lloyd's round collects the
#: per-task partials and folds them on the driver — int64 sums are
#: associative, so the fold is bit-identical to the distributed
#: tree-reduce while skipping that reduce's exchange + extra stage
#: (locally the fit is latency-bound: single-row stages of ~0.3-0.5 s
#: each, ×2 stages ×5 rounds). Above the bound — e.g. 100k+ partitions
#: at 100 TB — the tree-reduce path runs unchanged, keeping the driver
#: pull at O(k×dim) (the r4 design argument, preserved verbatim).
_FIT_DRIVER_FOLD_MAX_VALUES = 2_000_000

#: micro-space embedding expression (Spark SQL) — one HOF pass
_EMB_MICRO_EXPR = (
    "transform(embedding, x -> "
    "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
)


def _kmeans_fit_micro(spark: SparkSession, emb: DataFrame, k: int, iters: int):
    """Fixed-point Lloyd's fit over ``emb`` (vec_id, m: array<bigint>
    micros) → the final k×dim int64 codebook.

    Distributed shape: map-only corpus
    passes, per-batch partials, tree-reduce, O(k×dim) driver collect) —
    but every quantity is an int64: partial sums are exact and
    ASSOCIATIVE, so any partial-agg merge order produces bit-identical
    centroids, and the whole iterative fit becomes DuckDB-oracle
    certifiable (`_kmeans_micro_oracle` unrolls the same rounds in
    SQL). Centroid update is FLOOR(sum/count) — double division then
    floor, the identical IEEE sequence in Python and SQL (sums ≤1e10
    here, far below 2^53, so the double conversion is exact).
    """
    import math

    import numpy as np

    from pyspark.sql import types as T

    # r12 (guide §4.1): the fit reads only (vec_id, m) — project before
    # the checkpoint so callers' extra columns (s_semdedup ships a second
    # 64-long milli vector) are neither materialized per round nor
    # Arrow-shipped to the Python workers on every Lloyd's pass.
    emb = emb.select("vec_id", "m").localCheckpoint()
    init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    C = np.array([r.m for r in init], dtype=np.int64)

    part_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def partials(codebook):
        bc = spark.sparkContext.broadcast(codebook)

        def emit(batches):
            import pandas as pd

            Cb = bc.value
            # r12: accumulate across ALL of the task's Arrow batches and
            # emit one row set per TASK (≤ k rows), not per batch —
            # int64 sums are associative so the in-task fold is
            # bit-identical, and the partial-row count becomes
            # O(partitions × k) independent of batch size
            acc_s: dict[int, object] = {}
            acc_n: dict[int, int] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                E = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
                d2 = (E * E).sum(1)[:, None] - 2 * (E @ Cb.T) + (Cb * Cb).sum(1)[None, :]
                a = np.argmin(d2, axis=1)  # first-min → lowest cluster id
                for c in np.unique(a):
                    sel = a == c
                    ci = int(c)
                    s = E[sel].sum(axis=0)
                    if ci in acc_s:
                        acc_s[ci] += s
                        acc_n[ci] += int(sel.sum())
                    else:
                        acc_s[ci] = s
                        acc_n[ci] = int(sel.sum())
            if acc_s:
                cl = sorted(acc_s)
                yield pd.DataFrame(
                    {
                        "cluster": cl,
                        "s": [acc_s[c].tolist() for c in cl],
                        "n": [acc_n[c] for c in cl],
                    }
                )

        return emit

    # adaptive reduction (guide §2.4): below the driver-fold bound each
    # round is ONE map stage whose ≤ partitions×k partial rows the
    # driver folds itself (exact int64 — identical centroids); above it
    # the tree-reduce exchange keeps the collect at O(k×dim)
    n_parts = emb.rdd.getNumPartitions()
    dim = C.shape[1]
    driver_fold = n_parts * k * dim <= _FIT_DRIVER_FOLD_MAX_VALUES

    for _ in range(iters):
        parts_df = emb.mapInPandas(partials(C), schema=part_schema)
        nxt = C.copy()  # empty clusters keep their previous centroid
        counts: dict[int, int] = {}
        if driver_fold:
            fsums: dict[int, object] = {}
            for r in parts_df.collect():
                sv = np.asarray(r.s, dtype=np.int64)
                if r.cluster in fsums:
                    fsums[r.cluster] += sv
                    counts[r.cluster] += int(r.n)
                else:
                    fsums[r.cluster] = sv
                    counts[r.cluster] = int(r.n)
            for c, sv in fsums.items():
                for pos in range(dim):
                    # mirror of SQL CAST(FLOOR(CAST(sv AS DOUBLE)/n) AS BIGINT)
                    nxt[c, pos] = math.floor(float(int(sv[pos])) / float(counts[c]))
        else:
            reduced = _tree_reduce_partials(parts_df, ["cluster"]).collect()
            sums: dict[tuple[int, int], int] = {}
            for r in reduced:
                sums[(r.cluster, r.pos)] = int(r.sv)
                if r.pos == 0:
                    counts[r.cluster] = int(r.cn)
            for (c, pos), sv in sums.items():
                # mirror of SQL CAST(FLOOR(CAST(sv AS DOUBLE)/n) AS BIGINT)
                nxt[c, pos] = math.floor(float(sv) / float(counts[c]))
        C = nxt
    return C


def _kmeans_micro_parts(k: int, iters: int, dim: int = _EMB_DIM) -> str:
    """CTE prefix shared by the k-means and SemDeDup oracles: unrolled
    fixed-point Lloyd's rounds ending at ``afin`` (vec_id, cluster, d2),
    the bit-exact twin of `_kmeans_fit_micro` + final assignment.
    Join-based (pts×k rows per round) is fine at oracle scale; the
    Spark side's matmul form is the production path."""
    argmin = (
        "SELECT vec_id, cluster, d2 FROM ("
        "SELECT vec_id, cluster, d2, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id ORDER BY d2, cluster) AS rn FROM {src}) "
        "WHERE rn = 1"
    )
    parts = [
        "WITH m AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS e "
        "FROM embeddings)",
        f", dims AS (SELECT CAST(range AS INT) + 1 AS pos FROM range({dim}))",
        ", pts AS (SELECT vec_id, pos, e[pos] AS v FROM m CROSS JOIN dims)",
        ", c0 AS (SELECT CAST(vec_id AS INT) AS cluster, pos, v AS c "
        f"FROM pts WHERE vec_id < {k})",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", d{r} AS (SELECT p.vec_id, c.cluster, "
            "CAST(SUM((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS d2 "
            f"FROM pts p JOIN c{r - 1} c ON p.pos = c.pos "
            "GROUP BY p.vec_id, c.cluster)"
        )
        parts.append(f", a{r} AS ({argmin.format(src=f'd{r}')})")
        parts.append(
            f", s{r} AS (SELECT a.cluster, p.pos, "
            "CAST(SUM(p.v) AS BIGINT) AS sv, COUNT(*) AS n "
            f"FROM pts p JOIN a{r} a ON p.vec_id = a.vec_id "
            "GROUP BY a.cluster, p.pos)"
        )
        parts.append(
            f", c{r} AS (SELECT c.cluster, c.pos, "
            "COALESCE(CAST(FLOOR(CAST(s.sv AS DOUBLE) / s.n) AS BIGINT), c.c) AS c "
            f"FROM c{r - 1} c LEFT JOIN s{r} s "
            "ON c.cluster = s.cluster AND c.pos = s.pos)"
        )
    parts.append(
        ", dfin AS (SELECT p.vec_id, c.cluster, "
        "CAST(SUM((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS d2 "
        f"FROM pts p JOIN c{iters} c ON p.pos = c.pos "
        "GROUP BY p.vec_id, c.cluster)"
    )
    parts.append(", afin AS (" + argmin.format(src="dfin") + ")")
    return "".join(parts)


def _kmeans_micro_oracle(k: int, iters: int, dim: int = _EMB_DIM) -> str:
    return (
        _kmeans_micro_parts(k, iters, dim)
        + " SELECT vec_id, cluster, d2 AS dist2 FROM afin ORDER BY vec_id"
    )


@query(
    "s_kmeans",
    oracle=_kmeans_micro_oracle(_KMEANS_K, _KMEANS_ITERS),
    covers="north-star similarity: iterative k-means (Lloyd's) over "
    "embeddings, fixed-point arithmetic so the full fit + assignment is "
    "oracle-certified",
)
def s_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over the embedding corpus —
    the iterative-algorithm pattern for numeric ML on DataFrames.

    Each round is ONE map-only corpus pass: broadcast the k×dim
    codebook as numpy, assign each Arrow batch with one matmul, and
    emit per-batch *partial* (cluster, sum-vector, count) rows — the
    manual map-side combine, ≤k rows per batch regardless of corpus
    size. The driver folds those partials into the next codebook; it
    never touches corpus rows, only the constant-size codebook — the
    same loop structure as ``pyspark.ml.clustering.KMeans``. No join,
    no shuffle of vectors anywhere. Deterministic init (centroids =
    vec_id 0..k-1), fixed iteration count, lower-cluster-id tie-break.

    r5: arithmetic is int64 *micros* end-to-end — exact associative
    partial sums make the entire iterative fit deterministic under any
    partition/merge order, so the full 5-round fit AND the final
    (vec_id, cluster, dist2) assignment are DuckDB-oracle certified
    (the oracle unrolls the same rounds in SQL). Float k-means differs
    only by the 1e-6 input quantization; the pytest mirror pins the
    int64 path bit-exactly.
    """
    import numpy as np

    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_EMB_MICRO_EXPR} AS m"
    )
    C = _kmeans_fit_micro(spark, emb, _KMEANS_K, _KMEANS_ITERS)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dist2", T.LongType()),
        ]
    )

    def assigner(codebook):
        bc = spark.sparkContext.broadcast(codebook)

        def assign(batches):
            import pandas as pd

            Cb = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                E = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
                # exact integer squared euclidean; argmin ties break on
                # the lower cluster id (np.argmin is first-minimum)
                d2 = (E * E).sum(1)[:, None] - 2 * (E @ Cb.T) + (Cb * Cb).sum(1)[None, :]
                a = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": a.astype(np.int32),
                        "dist2": d2[np.arange(len(a)), a],
                    }
                )

        return assign

    return emb.mapInPandas(assigner(C), schema=schema).orderBy("vec_id")


#: float component → integer micros: float→double is exact, then one
#: IEEE multiply + add + floor — identical in Spark and DuckDB (a bare
#: double→BIGINT cast is NOT: Spark truncates, DuckDB rounds)
MICRO = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"

#: exact micro-space mean rendered back to DOUBLE — SUM of int64 micros
#: is exact and associative (partial-agg order cannot change it), and
#: FLOOR(sum/n + 0.5)/1e6 is the identical IEEE sequence in both
#: engines (the CLAUDE.md ratio rule; CAST to DOUBLE avoids the Spark
#: BIGINT÷DECIMAL-literal type trap)
MICRO_MEAN = (
    "(CAST(FLOOR(CAST({s} AS DOUBLE) / {n} + 0.5) AS DOUBLE) / 1000000.0)"
)

_CENTROID_MICRO_ORACLE = "".join(
    [
        "WITH v AS (SELECT label, embedding AS e FROM embeddings) ",
        "SELECT label, COUNT(*) AS n, ",
        ", ".join(
            MICRO_MEAN.format(
                s=f"SUM({MICRO.format(x=f'e[{i + 1}]')})", n="COUNT(*)"
            )
            + f" AS c{i}"
            for i in range(3)
        ),
        " FROM v GROUP BY label ORDER BY label",
    ]
)


@query(
    "s_label_centroids",
    oracle=_CENTROID_MICRO_ORACLE,
    covers="north-star similarity: per-label centroid (IVF coarse step), "
    "exact fixed-point aggregation",
)
def s_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids — the coarse quantizer step of an IVF index.

    At scale this is one hash aggregation; the centroid table is then
    broadcast for cluster assignment (`s_ann_ivf` pattern). Components
    aggregate as int64 *micros* so the sum is exact and associative —
    any partial-agg merge order yields the same centroid, which is what
    lets a distributed float-free mean be DuckDB-oracle-certified
    bit-exactly (a double SUM is order-dependent and was rows-only
    before r5).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").alias("e")
    )
    n = F.count("*")
    return (
        emb.groupBy("label")
        .agg(
            n.alias("n"),
            *[
                F.expr(
                    MICRO_MEAN.format(
                        s=f"SUM({MICRO.format(x=f'element_at(e, {i + 1})')})",
                        n="COUNT(*)",
                    )
                ).alias(f"c{i}")
                for i in range(3)
            ],
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic deduplication (Abbas et al. 2023) — k-means
# partition the embedding space, then deduplicate within clusters only.
# --------------------------------------------------------------------------

_SEMDEDUP_K = 32
_SEMDEDUP_TAU = 0.4  # cos ≥ 0.4 ⇔ dot > 0 AND 25·dot² ≥ 4·|x|²·|y|²

#: milli-space embedding expression — the τ-threshold test quantization.
#: Milli (not micro) keeps every threshold quantity int64-safe:
#: |dot| ≤ 64·580² ≈ 2.2e7, 25·dot² ≤ 1.2e16, 4·n2·n2 ≤ 1.9e15 ≪ 2^63.
_EMB_MILLI_EXPR = (
    "transform(embedding, x -> "
    "CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"
)


def _semdedup_micro_oracle(k: int, iters: int, dim: int = _EMB_DIM) -> str:
    """DuckDB twin of the fixed-point SemDeDup: the unrolled micro
    k-means rounds (shared with `s_kmeans`'s oracle) ending at the
    final assignment ``afin``, then within-cluster pair dots in exact
    int64 milli-space — cos ≥ τ (τ=0.4) becomes the pure-integer
    inequality 25·dot² ≥ 4·n2_i·n2_j with dot > 0, so keep/drop flags
    are bit-identical across engines (kept integer end-to-end: 25·dot²
    can reach 1.2e16 > 2^53, so a double route would NOT be exact)."""
    return (
        _kmeans_micro_parts(k, iters, dim)
        + ", tm AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS t "
        "FROM embeddings)"
        ", tpts AS (SELECT vec_id, pos, t[pos] AS tv FROM tm CROSS JOIN dims)"
        ", n2 AS (SELECT vec_id, CAST(SUM(tv * tv) AS BIGINT) AS n2 "
        "FROM tpts GROUP BY vec_id)"
        ", prs AS (SELECT a.vec_id AS i, b.vec_id AS j FROM afin a "
        "JOIN afin b ON a.cluster = b.cluster AND b.vec_id < a.vec_id)"
        ", pdots AS (SELECT p.i, p.j, CAST(SUM(ti.tv * tj.tv) AS BIGINT) AS dot "
        "FROM prs p JOIN tpts ti ON ti.vec_id = p.i "
        "JOIN tpts tj ON tj.vec_id = p.j AND tj.pos = ti.pos GROUP BY p.i, p.j)"
        ", dups AS (SELECT DISTINCT pdots.i AS vec_id FROM pdots "
        "JOIN n2 ni ON ni.vec_id = pdots.i JOIN n2 nj ON nj.vec_id = pdots.j "
        "WHERE pdots.dot > 0 AND 25 * pdots.dot * pdots.dot >= 4 * ni.n2 * nj.n2)"
        " SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep "
        "FROM afin a LEFT JOIN dups d ON a.vec_id = d.vec_id ORDER BY a.vec_id"
    )


@query(
    "s_semdedup",
    oracle=_semdedup_micro_oracle(_SEMDEDUP_K, _KMEANS_ITERS),
    covers="north-star dedup: SemDeDup semantic near-dup removal "
    "(k-means partition + within-cluster cosine), fixed-point fit and "
    "integer τ-threshold so keep/drop flags are oracle-certified",
    bench=True,
)
def s_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop embeddings that have a lower-vec_id neighbor with
    cosine ≥ τ **within their k-means cluster** — semantic near-dup
    removal without any cross-cluster pair work.

    Scale: this is the published SemDeDup recipe precisely because it
    scales — k is chosen ∝ corpus_size / target_cluster_size so the
    per-cluster pair matrix stays bounded (they used k=50k for LAION
    at web scale; k=32 here keeps sf-sized clusters comparable).
    The fit is `_kmeans_fit_micro` (map-only passes, ≤k rows per batch
    to the driver); assignment tags each Arrow batch with one matmul;
    the only shuffle is the groupBy(cluster) co-locating each cluster
    for its vectorized gram-matrix pass. Ties and keep-priority are
    deterministic: lower vec_id always wins.

    r5: the fit is the fixed-point int64 micro k-means (bit-identical
    under any partition/merge order), and the τ test compares exact
    int64 milli-space quantities (cos ≥ 0.4 ⇔ dot > 0 AND 25·dot² ≥
    4·|x|²·|y|²) — so cluster ids AND keep/drop flags are deterministic
    and the whole operator is DuckDB-oracle certified
    (`_semdedup_micro_oracle` unrolls the same rounds in SQL).
    """
    import numpy as np

    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        f"{_EMB_MICRO_EXPR} AS m",
        f"{_EMB_MILLI_EXPR} AS t",
    )
    C = _kmeans_fit_micro(spark, emb, _SEMDEDUP_K, _KMEANS_ITERS)
    bc = spark.sparkContext.broadcast(C)

    tagged_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("t", T.ArrayType(T.LongType())),
        ]
    )

    def tag(batches):
        import pandas as pd

        Cb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
            d2 = (M * M).sum(1)[:, None] - 2 * (M @ Cb.T) + (Cb * Cb).sum(1)[None, :]
            # exact integer argmin; first-min = lowest cluster id,
            # matching the oracle window ORDER BY d2, cluster
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": np.argmin(d2, axis=1).astype(np.int32),
                    "t": pdf["t"],
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("keep", T.BooleanType()),
        ]
    )

    def dedupe(pdf):
        import pandas as pd

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.vstack(pdf["t"].to_numpy()).astype(np.int64)
        # float64 matmul of int matrices is EXACT here (every partial
        # sum ≤ 2.2e7 ≪ 2^53) and ~100× faster than int64 matmul; the
        # threshold comparison then runs in pure int64 (25·dot² reaches
        # 1.2e16 > 2^53, so it must NOT be computed in doubles)
        G = (X.astype(np.float64) @ X.astype(np.float64).T).astype(np.int64)
        n2 = np.diag(G).copy()
        lhs = 25 * G * G
        rhs = 4 * n2[:, None] * n2[None, :]
        cond = (G > 0) & (lhs >= rhs)
        # dup[i] ⇔ ∃ j < i (sorted by vec_id) with cos(i,j) ≥ τ
        dup = np.triu(cond, 1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "keep": ~dup,
            }
        )

    tagged = emb.mapInPandas(tag, schema=tagged_schema)
    return (
        tagged.groupBy("cluster")
        .applyInPandas(dedupe, schema=out_schema)
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) ANN: compressed codes + asymmetric distance
# --------------------------------------------------------------------------

_PQ_M = 8  # subspaces (dim 64 → 8 dims per subspace)
_PQ_K = 16  # centroids per subspace → 4 bits/subspace, 4 bytes/vector
_PQ_ITERS = 5
_PQ_SHORTLIST = 50  # ADC shortlist size per query before exact re-rank


def _pq_fit(spark: SparkSession, emb, m: int, k: int, iters: int):
    """Per-subspace fixed-point Lloyd's fit over ``emb`` (vec_id, m:
    array<bigint> micros) → the (m, k, subdim) int64 codebook.

    Same discipline as :func:`_kmeans_fit_micro`: every round is ONE
    map-only corpus pass emitting per-batch partial (subspace, cluster,
    sum, count) rows — ≤ m·k rows per batch — and the driver folds only
    the constant-size codebook. All m subspaces train in the same pass.
    Deterministic init (subvectors of vec_id 0..k-1), first-minimum
    tie-break; integer sums are exact and associative so the fit is
    bit-identical under any partition/merge order (→ oracle-able).
    """
    import math

    import numpy as np

    from pyspark.sql import types as T

    emb = emb.localCheckpoint()
    init = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    X0 = np.array([r.m for r in init], dtype=np.int64)
    dim = X0.shape[1]
    sd = dim // m
    C = np.stack([X0[:, j * sd : (j + 1) * sd] for j in range(m)])  # (m, k, sd)

    part_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("s", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )

    def partials(codebook):
        bc = spark.sparkContext.broadcast(codebook)

        def emit(batches):
            import pandas as pd

            Cb = bc.value
            # r12: per-TASK accumulation (see _kmeans_fit_micro) — the
            # task emits ≤ m×k rows regardless of its batch count;
            # int64 folds are associative so partials are bit-identical
            acc_s: dict[tuple[int, int], object] = {}
            acc_n: dict[tuple[int, int], int] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                E = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
                for j in range(m):
                    S = E[:, j * sd : (j + 1) * sd]
                    Cj = Cb[j]
                    d2 = (S * S).sum(1)[:, None] - 2 * (S @ Cj.T) + (Cj * Cj).sum(1)[None, :]
                    a = np.argmin(d2, axis=1)
                    for c in np.unique(a):
                        sel = a == c
                        key = (j, int(c))
                        s = S[sel].sum(axis=0)
                        if key in acc_s:
                            acc_s[key] += s
                            acc_n[key] += int(sel.sum())
                        else:
                            acc_s[key] = s
                            acc_n[key] = int(sel.sum())
            if acc_s:
                keys = sorted(acc_s)
                yield pd.DataFrame(
                    {
                        "sub": [j for j, _ in keys],
                        "cluster": [c for _, c in keys],
                        "s": [acc_s[key].tolist() for key in keys],
                        "n": [acc_n[key] for key in keys],
                    }
                )

        return emit

    # adaptive reduction — same bound as _kmeans_fit_micro (per-task
    # partial volume is partitions × m × k × sd = partitions × k × dim)
    n_parts = emb.rdd.getNumPartitions()
    driver_fold = n_parts * m * k * sd <= _FIT_DRIVER_FOLD_MAX_VALUES

    for _ in range(iters):
        parts_df = emb.mapInPandas(partials(C), schema=part_schema)
        nxt = C.copy()  # empty cells keep their previous centroid
        counts: dict[tuple[int, int], int] = {}
        if driver_fold:
            fsums: dict[tuple[int, int], object] = {}
            for r in parts_df.collect():
                key = (r.sub, r.cluster)
                sv = np.asarray(r.s, dtype=np.int64)
                if key in fsums:
                    fsums[key] += sv
                    counts[key] += int(r.n)
                else:
                    fsums[key] = sv
                    counts[key] = int(r.n)
            for (j, c), sv in fsums.items():
                for pos in range(sd):
                    # mirror of SQL CAST(FLOOR(CAST(sv AS DOUBLE)/n) AS BIGINT)
                    nxt[j, c, pos] = math.floor(
                        float(int(sv[pos])) / float(counts[(j, c)])
                    )
        else:
            # tree-reduce before the collect (same rationale as
            # _kmeans_fit_micro): the driver receives O(m×k×sub_dim)
            # reduced rows, never O(P×m×k) raw partials
            reduced = _tree_reduce_partials(parts_df, ["sub", "cluster"]).collect()
            for r in reduced:
                if r.pos == 0:
                    counts[(r.sub, r.cluster)] = int(r.cn)
            for r in reduced:
                # mirror of SQL CAST(FLOOR(CAST(sv AS DOUBLE)/n) AS BIGINT)
                nxt[r.sub, r.cluster, r.pos] = math.floor(
                    float(int(r.sv)) / float(counts[(r.sub, r.cluster)])
                )
        C = nxt
    return C


def _pq_micro_oracle(
    m: int, k: int, iters: int, nq: int, shortlist: int, top_k: int,
    dim: int = _EMB_DIM,
) -> str:
    """DuckDB twin of the integer PQ pipeline: per-subspace fixed-point
    Lloyd's (unrolled), encode, integer ADC shortlist, exact re-rank."""
    sd = dim // m
    argmin_vs = (
        "SELECT vec_id, sub, cluster{extra} FROM (SELECT vec_id, sub, cluster, "
        "{extra2}ROW_NUMBER() OVER (PARTITION BY vec_id, sub "
        "ORDER BY d2, cluster) AS rn FROM {src}) WHERE rn = 1"
    )
    parts = [
        "WITH mm AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS e "
        "FROM embeddings)",
        f", dims AS (SELECT CAST(range AS INT) + 1 AS pos, "
        f"CAST(range AS INT) // {sd} AS sub FROM range({dim}))",
        ", pts AS (SELECT vec_id, sub, pos, e[pos] AS v FROM mm CROSS JOIN dims)",
        ", c0 AS (SELECT CAST(vec_id AS INT) AS cluster, sub, pos, v "
        f"FROM pts WHERE vec_id < {k})",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", d{r} AS (SELECT p.vec_id, c.sub, c.cluster, "
            "CAST(SUM((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS d2 "
            f"FROM pts p JOIN c{r - 1} c ON p.pos = c.pos "
            "GROUP BY p.vec_id, c.sub, c.cluster)"
        )
        parts.append(
            f", a{r} AS ("
            + argmin_vs.format(src=f"d{r}", extra="", extra2="")
            + ")"
        )
        parts.append(
            f", s{r} AS (SELECT a.sub, a.cluster, p.pos, "
            "CAST(SUM(p.v) AS BIGINT) AS sv, COUNT(*) AS n "
            f"FROM pts p JOIN a{r} a ON p.vec_id = a.vec_id AND p.sub = a.sub "
            "GROUP BY a.sub, a.cluster, p.pos)"
        )
        parts.append(
            f", c{r} AS (SELECT c.cluster, c.sub, c.pos, "
            "COALESCE(CAST(FLOOR(CAST(s.sv AS DOUBLE) / s.n) AS BIGINT), c.v) AS v "
            f"FROM c{r - 1} c LEFT JOIN s{r} s "
            "ON c.sub = s.sub AND c.cluster = s.cluster AND c.pos = s.pos)"
        )
    # every c{r} carries the centroid component as `v` (c0 inherits the
    # name from pts), so assignment CTEs uniformly read c.v
    parts.append(
        ", dfin AS (SELECT p.vec_id, c.sub, c.cluster, "
        "CAST(SUM((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS d2 "
        f"FROM pts p JOIN c{iters} c ON p.pos = c.pos "
        "GROUP BY p.vec_id, c.sub, c.cluster)"
    )
    parts.append(
        ", codes AS ("
        + argmin_vs.format(src="dfin", extra="", extra2="")
        + ")"
    )
    parts.append(
        f", adct AS (SELECT vec_id AS qid, sub, cluster, d2 FROM dfin "
        f"WHERE vec_id < {nq})"
    )
    parts.append(
        ", adc AS (SELECT t.qid, cd.vec_id, "
        "CAST(SUM(t.d2) AS BIGINT) AS adc_d2 "
        "FROM codes cd JOIN adct t ON cd.sub = t.sub AND cd.cluster = t.cluster "
        "WHERE cd.vec_id <> t.qid GROUP BY t.qid, cd.vec_id)"
    )
    parts.append(
        ", short AS (SELECT qid, vec_id FROM (SELECT qid, vec_id, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d2, vec_id) AS rn "
        f"FROM adc) WHERE rn <= {shortlist})"
    )
    parts.append(
        ", exact AS (SELECT s.qid, s.vec_id, "
        "CAST(SUM((p.v - q.v) * (p.v - q.v)) AS BIGINT) AS d2 "
        "FROM short s JOIN pts p ON p.vec_id = s.vec_id "
        "JOIN pts q ON q.vec_id = s.qid AND q.pos = p.pos "
        "GROUP BY s.qid, s.vec_id)"
    )
    parts.append(
        ", ranked AS (SELECT qid, vec_id, d2, ROW_NUMBER() OVER ("
        "PARTITION BY qid ORDER BY d2, vec_id) AS rnk FROM exact)"
        " SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor, "
        f"d2 AS dist2 FROM ranked WHERE rnk <= {top_k} ORDER BY qid, rnk"
    )
    return "".join(parts)


def pq_encode_mirror(E, C):
    """Pure-numpy PQ encoder (the pytest mechanism mirror): codes[i, j]
    = nearest C[j] centroid of E[i]'s j-th subvector (int64 micros,
    exact arithmetic, first-minimum tie-break)."""
    import numpy as np

    m, _, sd = C.shape
    codes = np.empty((E.shape[0], m), dtype=np.int32)
    for j in range(m):
        S = E[:, j * sd : (j + 1) * sd]
        Cj = C[j]
        d2 = (S * S).sum(1)[:, None] - 2 * (S @ Cj.T) + (Cj * Cj).sum(1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


@query(
    "s_ann_pq",
    oracle=_pq_micro_oracle(
        _PQ_M, _PQ_K, _PQ_ITERS, _N_QUERIES, _PQ_SHORTLIST, _TOP_K
    ),
    covers="north-star similarity: product-quantization ANN — 4-byte "
    "codes, integer asymmetric-distance shortlist, exact re-rank; fit + "
    "encode + ADC + re-rank all oracle-certified",
)
def s_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate nearest neighbors (FAISS PQx8 L2
    formulation).

    The corpus compresses to m=8 4-bit codes per vector (16× smaller
    than the float64 rows) in one map-only encode pass; each query
    builds an (m × k) asymmetric-distance table (exact integer
    micro-space squared-L2 to every subspace centroid) and scores every
    code with table GATHERS — no reconstruction, no join. The ADC
    shortlist (top _PQ_SHORTLIST/query on ADC distance) then re-ranks
    exactly, bounding exact-distance work to shortlist size.
    Scale: codebook fit is the map-only fixed-point Lloyd's loop
    (driver folds an (8×16×8) codebook); encode and scoring are
    embarrassingly parallel scans of the compressed codes — the
    memory-bound regime PQ exists for.

    r5: int64 micro arithmetic end-to-end makes fit, encode, ADC
    shortlist, and the exact re-rank deterministic under any agg order
    → the whole pipeline is DuckDB-oracle certified (the oracle unrolls
    the per-subspace Lloyd's rounds in SQL).
    """
    import numpy as np

    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_EMB_MICRO_EXPR} AS m"
    )
    C = _pq_fit(spark, emb, _PQ_M, _PQ_K, _PQ_ITERS)
    m, k, sd = C.shape

    queries = emb.filter(F.col("vec_id") < _N_QUERIES).orderBy("vec_id").collect()
    Q = np.array([r.m for r in queries], dtype=np.int64)
    qids = np.array([r.vec_id for r in queries])
    # ADC tables: adc_tab[q, j, c] = exact ||Q[q]_j - C[j, c]||² (int64)
    Qs = Q.reshape(len(Q), m, sd)
    diff = Qs[:, :, None, :] - C[None, :, :, :]  # (nq, m, k, sd)
    adc_tab = (diff * diff).sum(axis=3)  # (nq, m, k) int64

    bc = spark.sparkContext.broadcast((C, adc_tab, qids))
    score_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("adc_d2", T.LongType()),
        ]
    )

    def adc_score(batches):
        import pandas as pd

        Cb, adct, qid_arr = bc.value

        for pdf in batches:
            if pdf.empty:
                continue
            E = np.vstack(pdf["m"].to_numpy()).astype(np.int64)
            codes = pq_encode_mirror(E, Cb)  # (n, m)
            rows = np.arange(m)[None, :]
            # ADC distance: gather per-subspace table entries and sum
            d2 = adct[:, rows, codes].sum(axis=2)  # (n_q, n) int64
            n = E.shape[0]
            vid = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qid_arr, n),
                    "vec_id": np.tile(vid, len(qid_arr)),
                    "adc_d2": d2.ravel(),
                }
            )

    scored = emb.mapInPandas(adc_score, schema=score_schema).filter(
        F.col("qid") != F.col("vec_id")
    )
    wq = W.partitionBy("qid").orderBy(F.col("adc_d2"), F.col("vec_id"))
    shortlist = (
        scored.withColumn("srnk", F.row_number().over(wq))
        .filter(F.col("srnk") <= _PQ_SHORTLIST)
        .select("qid", "vec_id")
    )
    # exact integer re-rank of the shortlist only
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("m").alias("qm")
    )
    exact = (
        shortlist.join(emb, "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with("qm", "m", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist2"),
        )
    )
    wf = W.partitionBy("qid").orderBy(F.col("dist2"), F.col("vec_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .filter(F.col("rnk") <= _TOP_K)
        .select("qid", "rnk", F.col("vec_id").alias("neighbor"), "dist2")
        .orderBy("qid", "rnk")
    )
