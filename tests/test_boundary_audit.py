"""Rounding-boundary-distance audit for every transcendental that feeds
certified (hash-gated) output.

Why this exists: the r3 driver failure of ``t_ngram_lm_score`` was a
certified double sitting *exactly* on its rounding boundary — invisible
locally, flipped by a 1-ulp libm difference in the driver's DuckDB
build. Quotients of exact integers are now rounded in FLOOR micro-space
(identical IEEE ops both engines — no cross-engine risk by
construction, so they are NOT audited here). What remains risky is any
``ROUND``/``FLOOR``-rounded value derived from a *transcendental*
(``LN``, cosine-via-float-fold): libm/fold order may differ across
engines in the last ulp, so certification is only safe when every such
value keeps a healthy distance from its rounding boundary.

For each audited operator this test extracts the distinct pre-rounding
doubles (via DuckDB — fast, no Spark needed) and asserts each sits at
least ``_MIN_DIST`` from the nearest rounding boundary. Filter
thresholds that gate certified row *membership* (e.g. cosine ≥ 0.4)
are audited the same way: a raw value within an ulp of the threshold
would add/drop a row in one engine only.

Why ``_MIN_DIST`` is 1e-12, not the 1e-9 originally proposed: with N
distinct values falling effectively uniformly over a g-spaced rounding
grid, the *expected* minimum boundary distance is g/(2N) — for the 916
bigram lp values on the 1e-6 grid that is ~5.5e-10, and for the ~25k
ANN cosines ~2e-11, so a fixed 1e-9 floor is statistically
unattainable regardless of how the expression is written (measured
minima at sf0.01: lp 4.2e-11, cosine 2.8e-11 — exactly at the
order-statistics prediction). What the audit must catch is the class
that actually failed in r3: *structural* ties at distance ~0 (a mean
of integer micros landing exactly on .5). Cross-engine drift on an
identical double input is bounded by a few ulps of libm (ln, ~4e-16
near |x|=4) or a re-ordered 64-element float fold (~1.4e-14 relative),
so 1e-12 sits ≥100× above the worst drift while flagging every
structural tie. A transcendental of a rational can never be *exactly*
on a half-grid boundary (ln(a/b) is irrational unless 0, and grid
points themselves round identically), so any sub-1e-12 hit indicates
a structural quotient sneaking into the certified chain — convert it
to integer-space certification.

If a new operator trips this audit, don't widen the tolerance — convert
its certification to exact integer space (see t_ngram_lm_score,
sampling.py) or restructure the expression.

Runs at sf0.001 + sf0.01 always; sf0.1 too when BOUNDARY_AUDIT_FULL=1
(the pre-submit sweep).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from spark_sql_server_spark.operators.sampling import _hexval_sql

#: minimum allowed distance (in value space) from a 6dp rounding
#: boundary — ≥100× the worst cross-engine drift on an identical
#: double input; see module docstring for why 1e-9 is unattainable.
_MIN_DIST = 1e-12

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
if os.environ.get("BOUNDARY_AUDIT_FULL"):
    _SF_DIRS.append("/root/testdata/sf0.1")


def _grid_distance(x: float, decimals: int = 6) -> float:
    """Distance of ``x`` from the nearest rounding boundary of the
    10^-decimals grid (boundaries sit at half-grid points: k + 0.5
    grid units). Valid for both ROUND(x, d) and FLOOR(x*10^d + 0.5)
    certification — both flip exactly at those half-points."""
    scale = 10.0 ** decimals
    m = x * scale
    frac = (m % 1.0 + 1.0) % 1.0
    return abs(frac - 0.5) / scale


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _audit(values: list[float], label: str, decimals: int = 6) -> None:
    assert values, f"{label}: audit query returned no values"
    worst = min(values, key=lambda v: _grid_distance(v, decimals))
    d = _grid_distance(worst, decimals)
    assert d >= _MIN_DIST, (
        f"{label}: value {worst!r} sits {d:.3e} from its "
        f"{decimals}dp rounding boundary (< {_MIN_DIST}) — certification "
        "is libm-fragile; convert to integer-space certification"
    )


def _threshold_audit(
    values: list[float], threshold: float, label: str
) -> None:
    assert values, f"{label}: audit query returned no values"
    worst = min(values, key=lambda v: abs(v - threshold))
    d = abs(worst - threshold)
    assert d >= _MIN_DIST, (
        f"{label}: raw value {worst!r} sits {d:.3e} from the row-"
        f"membership threshold {threshold} — a 1-ulp engine drift "
        "would add/drop a certified row"
    )


@pytest.fixture(scope="module", params=_SF_DIRS, ids=lambda p: p.rsplit("/", 1)[-1])
def con(request):
    c = _connect(request.param)
    yield c
    c.close()


def test_lm_score_lp_boundaries(con):
    """t_ngram_lm_score: every distinct bigram lp = LN((c12+1)/(c1+v))
    must clear its ROUND(..., 6) boundary — the sum of the rounded lps
    (in exact micros) is the certified value, so one flipped lp shifts
    sum_lp_micros by 1."""
    rows = con.sql(
        """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        bi AS (
          SELECT ws[i] AS w1, ws[i + 1] AS w2
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2
        ),
        uni AS (
          SELECT tok, COUNT(*) AS c1
          FROM (SELECT unnest(ws) AS tok FROM w)
          GROUP BY tok
        ),
        vocab AS (SELECT COUNT(*) AS v FROM uni),
        big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2)
        SELECT DISTINCT LN((big.c12 + 1.0) / (uni.c1 + vocab.v)) AS x
        FROM big JOIN uni ON big.w1 = uni.tok CROSS JOIN vocab
        """
    ).fetchall()
    _audit([r[0] for r in rows], "t_ngram_lm_score lp")


def test_weighted_sample_ln_boundaries(con):
    """t_weighted_sample: the ROUND(LN(u), 6) draw per document. The
    rounded value divides by an integer weight (IEEE-exact) and feeds
    an ORDER BY ... LIMIT, so a flipped last digit could reorder the
    top-k tail."""
    rows = con.sql(
        f"""
        SELECT DISTINCT
               LN(({_hexval_sql('md5(text)')} + 0.5) / 16777216.0) AS x
        FROM documents
        """
    ).fetchall()
    _audit([r[0] for r in rows], "t_weighted_sample ln(u)")


def test_weighted_sample_topk_gap(con):
    """t_weighted_sample: beyond per-value rounding safety, the top-k
    cut itself must be stable. Given the ln boundary audit holds (no
    6dp flip possible), ROUND(ln, 6) is bit-identical cross-engine and
    the division by an integer weight is exact IEEE — so the es_key
    wobble is ≤ ~1e-14 and the cut is fragile only if the k/k+1 gap is
    below _MIN_DIST (exact ties are fine: the doc_id tiebreak is
    engine-stable)."""
    from spark_sql_server_spark.operators.sampling import _WEIGHTED_K

    rows = con.sql(
        f"""
        SELECT ROUND(LN(({_hexval_sql('md5(text)')} + 0.5) / 16777216.0), 6)
                 / GREATEST(n_chars, 1) AS es_key
        FROM documents
        ORDER BY es_key DESC
        LIMIT {_WEIGHTED_K + 1}
        """
    ).fetchall()
    keys = [r[0] for r in rows]
    if len(keys) <= _WEIGHTED_K:
        return  # corpus smaller than k: no cut to audit
    gap = keys[_WEIGHTED_K - 1] - keys[_WEIGHTED_K]
    if gap != 0.0:
        assert gap > _MIN_DIST, (
            f"t_weighted_sample: top-k cut gap {gap:.3e} is below the "
            "cross-engine es_key wobble margin — the k-th member is "
            "engine-fragile"
        )


def test_tfidf_boundaries(con):
    """t_tfidf: distinct tf·LN(n/df) values (certified after FLOOR
    micro-rounding) for the emitted doc range."""
    rows = con.sql(
        """
        WITH tf AS (
          SELECT doc_id, word, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
          GROUP BY doc_id, word
        ),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        df AS (
          SELECT word, COUNT(*) AS df FROM tf GROUP BY word
          HAVING COUNT(*) < (SELECT n_docs FROM n)
        )
        SELECT DISTINCT tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS x
        FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
        WHERE tf.doc_id < 50
        """
    ).fetchall()
    _audit([r[0] for r in rows], "t_tfidf tf*ln(n/df)")


def test_embedding_cosine_boundaries(con):
    """d_embedding_neardup: all-pairs raw cosines — both the 6dp
    rounding of emitted pairs and the 0.4 membership threshold for
    every pair (a threshold flip adds/drops a certified row)."""
    from spark_sql_server_spark.operators.dedup import _COS_DUP_THRESHOLD

    rows = con.sql(
        """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings)
        SELECT list_cosine_similarity(a.e, b.e) AS x
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        """
    ).fetchall()
    sims = [r[0] for r in rows]
    _threshold_audit(sims, _COS_DUP_THRESHOLD, "d_embedding_neardup τ")
    emitted = [s for s in sims if s >= _COS_DUP_THRESHOLD]
    _audit(emitted, "d_embedding_neardup cos_sim")


def test_ann_cosine_boundaries(con):
    """s_ann_bruteforce: raw query-corpus cosines feeding the ranked
    6dp-rounded cos_sim column."""
    from spark_sql_server_spark.operators.similarity import _N_QUERIES

    rows = con.sql(
        f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
             q AS (SELECT vec_id AS qid, e AS qe FROM v
                   WHERE vec_id < {_N_QUERIES})
        SELECT DISTINCT list_cosine_similarity(q.qe, v.e) AS x
        FROM q JOIN v ON v.vec_id <> q.qid
        """
    ).fetchall()
    _audit([r[0] for r in rows], "s_ann_bruteforce raw_sim")


def test_round6_cross_engine_identity(request):
    """The round6/ROUND6 helpers claim FLOOR(x*1e6+0.5)/1e6 is the
    identical IEEE op sequence in Spark, DuckDB, and Python — verify it
    over adversarial inputs: exact grid points, exact half-grid points
    (the tie), values one ulp either side of ties, negatives, large
    magnitudes, and a seeded random sweep."""
    import math
    import random

    import duckdb

    spark = request.getfixturevalue("spark")

    rng = random.Random(42)
    xs: list[float] = []
    for k in (0, 1, 7, 123456, -1, -987654):
        base = k / 1e6
        half = (k + 0.5) / 1e6
        xs += [base, half, math.nextafter(half, math.inf),
               math.nextafter(half, -math.inf)]
    xs += [rng.uniform(-1000, 1000) for _ in range(2000)]
    xs += [rng.uniform(-1e9, 1e9) for _ in range(200)]

    from spark_sql_server_spark.operators.relational import ROUND6

    py = [math.floor(x * 1e6 + 0.5) / 1e6 for x in xs]

    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i INT, x DOUBLE")
    srows = sdf.selectExpr("i", f"{ROUND6('x')} AS r").collect()
    sp = [r.r for r in sorted(srows, key=lambda r: r.i)]
    # the helper must yield DOUBLE in Spark, not DECIMAL — the raw
    # FLOOR(x)/1000000.0 spelling silently does (BIGINT / DECIMAL(8,1)
    # literal), which breaks the driver's pandas hash
    assert all(isinstance(v, float) for v in sp)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(xs)))
    du = [r[1] for r in con.execute(
        f"SELECT i, {ROUND6('x')} FROM t ORDER BY i"
    ).fetchall()]

    for i, (a, b, c) in enumerate(zip(py, sp, du)):
        assert a == b == c, (
            f"x={xs[i]!r}: python={a!r} spark={b!r} duckdb={c!r}"
        )
