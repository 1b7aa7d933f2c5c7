"""Quality verification for the rows-only (non-SQL-expressible) LLM
pipeline operators: recall vs exact baselines, pure-Python reference
implementations for the hash-based fingerprints, numpy checks for the
vector math."""

from __future__ import annotations

import numpy as np
import pytest

from spark_sql_server_spark.operators import REGISTRY
from tests.conftest import SF_SMOKE

MOD = 1_000_000_007


def _poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % MOD
    return acc


class TestMinHashLSH:
    def test_signatures_match_pure_python_reference(self, spark):
        """Pin the exact signature values: the r1 Catalyst-HOF version
        was silently degenerate (a two-arg transform lambda received the
        array *index* as the permutation id, collapsing all 16 perms to
        one), so recall tests alone are not enough — every perm must
        match an independent pure-Python minhash."""
        from spark_sql_server_spark.operators.dedup import (
            _NGRAM_N,
            _NUM_PERM,
            _minhash_signatures_pandas,
        )
        from spark_sql_server_spark.session import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        rows = _minhash_signatures_pandas(docs).orderBy("doc_id").limit(20).collect()
        import duckdb

        texts = dict(
            duckdb.connect()
            .execute(
                f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
                "ORDER BY doc_id LIMIT 20"
            )
            .fetchall()
        )
        for r in rows:
            words = texts[r.doc_id].split(" ")
            wh = [_poly_hash(w) for w in words]
            grams = set()
            for i in range(len(wh) - _NGRAM_N + 1):
                g = wh[i]
                for k in range(1, _NGRAM_N):
                    g = (g * 31 + wh[i + k]) % MOD
                grams.add(g)
            expect = [
                min(((2 * p + 1) * g + 7919 * p) % MOD for g in grams)
                for p in range(_NUM_PERM)
            ]
            assert list(r.sig) == expect, f"doc {r.doc_id}"
            assert len(set(r.sig)) > 1, "degenerate signature (r1 bug shape)"

    def test_recall_vs_exact_jaccard(self, spark):
        """LSH candidates must cover (almost) all true near-dup pairs —
        the planted near-dups in the synthetic corpus have Jaccard ≥ 0.9,
        far above the 4x4 band threshold."""
        true_pairs = {
            (r.doc_a, r.doc_b)
            for r in REGISTRY["d_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
        }
        cand_pairs = {
            (r.doc_a, r.doc_b)
            for r in REGISTRY["d_minhash_lsh"].fn(spark, SF_SMOKE).collect()
        }
        assert true_pairs, "synthetic corpus should contain planted near-dups"
        recall = len(true_pairs & cand_pairs) / len(true_pairs)
        assert recall >= 0.9, f"LSH recall {recall} too low"

    def test_candidates_mostly_similar(self, spark):
        """Precision sanity: the planted dups dominate the candidate set."""
        true_pairs = {
            (r.doc_a, r.doc_b)
            for r in REGISTRY["d_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
        }
        cand = REGISTRY["d_minhash_lsh"].fn(spark, SF_SMOKE).collect()
        hits = sum(1 for r in cand if (r.doc_a, r.doc_b) in true_pairs)
        assert hits / max(len(cand), 1) >= 0.5


class TestSimHash:
    def test_matches_pure_python_reference(self, spark):
        rows = REGISTRY["d_simhash"].fn(spark, SF_SMOKE).limit(20).collect()
        import duckdb

        con = duckdb.connect()
        texts = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
                "ORDER BY doc_id LIMIT 20"
            ).fetchall()
        )
        for r in rows:
            words = sorted(set(texts[r.doc_id].split(" ")), key=texts[r.doc_id].split(" ").index)
            hashes = [_poly_hash(w) for w in dict.fromkeys(texts[r.doc_id].split(" "))]
            sim = 0
            for bit in range(32):
                votes = sum(1 if (h >> bit) & 1 else -1 for h in hashes)
                if votes > 0:
                    sim |= 1 << bit
            assert r.simhash == sim, f"doc {r.doc_id}: {r.simhash} != {sim}"

    def test_near_dups_have_close_simhash(self, spark):
        sims = {
            r.doc_id: r.simhash
            for r in REGISTRY["d_simhash"].fn(spark, SF_SMOKE).collect()
        }
        pairs = REGISTRY["d_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
        assert pairs
        dists = [
            bin(sims[r.doc_a] ^ sims[r.doc_b]).count("1")
            for r in pairs
            if r.jaccard >= 0.9
        ]
        # planted dups: hamming distance far below the ~16 of random pairs
        assert dists and sum(dists) / len(dists) <= 6


class TestSimHashPairs:
    def test_recall_vs_exact(self, spark):
        true_pairs = {
            (r.doc_a, r.doc_b)
            for r in REGISTRY["d_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
            if r.jaccard >= 0.9
        }
        cand = {
            (r.doc_a, r.doc_b)
            for r in REGISTRY["d_simhash_pairs"].fn(spark, SF_SMOKE).collect()
        }
        assert true_pairs
        recall = len(true_pairs & cand) / len(true_pairs)
        assert recall >= 0.8, f"simhash-band recall {recall}"

    def test_hamming_bound_respected(self, spark):
        rows = REGISTRY["d_simhash_pairs"].fn(spark, SF_SMOKE).collect()
        assert rows
        assert all(0 <= r.hamming <= 6 for r in rows)


class TestKMeans:
    def test_matches_numpy_lloyds_mirror(self, spark):
        """s_kmeans (distributed fixed-point partial-sum Lloyd's) must
        agree BIT-EXACTLY with an independent numpy int64 mirror run
        from the same deterministic init — assignments and distances
        are exact integers, so any disagreement is a bug, not noise."""
        import math

        from spark_sql_server_spark.operators.similarity import (
            _KMEANS_ITERS,
            _KMEANS_K,
        )
        from spark_sql_server_spark.session import load_table

        emb = (
            load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("vec_id", "CAST(embedding AS array<double>) e")
            .orderBy("vec_id")
            .collect()
        )
        ids = np.array([r.vec_id for r in emb])
        E = np.floor(
            np.array([r.e for r in emb], dtype=np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        C = E[: _KMEANS_K].copy()
        for _ in range(_KMEANS_ITERS):
            d2 = (E * E).sum(1)[:, None] - 2 * (E @ C.T) + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            for c in range(_KMEANS_K):
                if (a == c).any():
                    sub = E[a == c]
                    n = len(sub)
                    C[c] = [
                        math.floor(float(s) / float(n))
                        for s in sub.sum(axis=0).tolist()
                    ]
        d2 = (E * E).sum(1)[:, None] - 2 * (E @ C.T) + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        expect = {
            int(i): (int(c), int(d))
            for i, c, d in zip(ids, a, d2[np.arange(len(a)), a])
        }

        got = {
            r.vec_id: (r.cluster, r.dist2)
            for r in REGISTRY["s_kmeans"].fn(spark, SF_SMOKE).collect()
        }
        assert got == expect

    def test_iterations_reduce_inertia(self, spark):
        """Lloyd's guarantee: final within-cluster inertia must be well
        below the inertia of the deterministic init assignment (the
        synthetic embeddings are near-uniform — label purity is not a
        property of this corpus, but inertia descent always is)."""
        from spark_sql_server_spark.operators.similarity import _KMEANS_K
        from spark_sql_server_spark.session import load_table

        emb = (
            load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("vec_id", "CAST(embedding AS array<double>) e")
            .orderBy("vec_id")
            .collect()
        )
        ids = np.array([r.vec_id for r in emb])
        E = np.array([r.e for r in emb], dtype=np.float64)
        C0 = E[: _KMEANS_K]

        def inertia(C, assign):
            return float(((E - C[assign]) ** 2).sum())

        d2 = (E * E).sum(1)[:, None] - 2 * (E @ C0.T) + (C0 * C0).sum(1)[None, :]
        init_inertia = inertia(C0, np.argmin(d2, axis=1))

        got = {
            r.vec_id: r.cluster
            for r in REGISTRY["s_kmeans"].fn(spark, SF_SMOKE).collect()
        }
        assign = np.array([got[i] for i in ids.tolist()])
        final_centroids = np.vstack(
            [
                E[assign == c].mean(axis=0) if (assign == c).any() else C0[c]
                for c in range(_KMEANS_K)
            ]
        )
        assert inertia(final_centroids, assign) < 0.9 * init_inertia


class TestSemDedup:
    @staticmethod
    def _numpy_mirror():
        """Full numpy replication of s_semdedup's fixed-point path:
        micro Lloyd's fit from the same deterministic init (exact int64
        throughout, floor(sum/count) centroid update), nearest-centroid
        assignment, then within-cluster lower-vec_id-wins dedup via the
        exact milli-space τ inequality 25·dot² ≥ 4·n2_i·n2_j."""
        import math

        from spark_sql_server_spark.operators.similarity import (
            _KMEANS_ITERS,
            _SEMDEDUP_K,
        )
        from spark_sql_server_spark.session import build_session, load_table

        spark = build_session()
        emb = (
            load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("vec_id", "CAST(embedding AS array<double>) e")
            .orderBy("vec_id")
            .collect()
        )
        ids = np.array([r.vec_id for r in emb])
        E = np.array([r.e for r in emb], dtype=np.float64)
        M = np.floor(E * 1e6 + 0.5).astype(np.int64)
        T = np.floor(E * 1e3 + 0.5).astype(np.int64)
        C = M[:_SEMDEDUP_K].copy()
        for _ in range(_KMEANS_ITERS):
            d2 = (M * M).sum(1)[:, None] - 2 * (M @ C.T) + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            for c in range(_SEMDEDUP_K):
                if (a == c).any():
                    s = M[a == c].sum(axis=0)
                    n = int((a == c).sum())
                    C[c] = [math.floor(float(v) / float(n)) for v in s]
        d2 = (M * M).sum(1)[:, None] - 2 * (M @ C.T) + (C * C).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        keep = {}
        for c in np.unique(assign):
            sel = np.where(assign == c)[0]
            order = sel[np.argsort(ids[sel])]
            G = T[order] @ T[order].T
            n2 = np.diag(G).copy()
            cond = (G > 0) & (25 * G * G >= 4 * n2[:, None] * n2[None, :])
            dup = np.triu(cond, 1).any(axis=0)
            for i, d in zip(order, dup):
                keep[int(ids[i])] = not bool(d)
        return keep, dict(zip(ids.tolist(), assign.tolist()))

    def test_matches_numpy_mirror(self, spark):
        """Keep/drop flags and cluster ids must agree EXACTLY with the
        independent numpy replication — the fixed-point path has no
        float order-dependence left (int64 sums are associative, the τ
        test is a pure integer inequality)."""
        expect_keep, expect_assign = self._numpy_mirror()
        rows = REGISTRY["s_semdedup"].fn(spark, SF_SMOKE).collect()
        assert len(rows) == len(expect_keep)
        for r in rows:
            assert expect_keep[r.vec_id] == r.keep, f"keep mismatch at {r.vec_id}"
            assert expect_assign[r.vec_id] == r.cluster, (
                f"cluster mismatch at {r.vec_id}"
            )

    def test_dropped_have_lower_neighbor(self, spark):
        """Every dropped vector must have a lower-vec_id neighbor with
        cos ≥ τ (exact milli-space inequality) in its own cluster (the
        lower-id-wins rule), and the cluster minimum is always kept —
        a group never vanishes."""
        from spark_sql_server_spark.session import load_table

        rows = REGISTRY["s_semdedup"].fn(spark, SF_SMOKE).collect()
        dropped = [r for r in rows if not r.keep]
        assert dropped, "corpus should contain semantic near-dups"
        milli = {
            r.vec_id: np.array(r.t, dtype=np.int64)
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr(
                "vec_id",
                "transform(embedding, x -> "
                "CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) t",
            )
            .collect()
        }
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster, []).append(r)
        for d in dropped:
            t_d = milli[d.vec_id]
            n2_d = int(t_d @ t_d)
            found = False
            for other in by_cluster[d.cluster]:
                if other.vec_id >= d.vec_id:
                    continue
                t_o = milli[other.vec_id]
                dot = int(t_d @ t_o)
                if dot > 0 and 25 * dot * dot >= 4 * n2_d * int(t_o @ t_o):
                    found = True
                    break
            assert found, f"vec {d.vec_id} dropped without a ≥τ lower neighbor"


class TestBruteforceFoldIdentity:
    def test_bruteforce_fold_bit_identity(self, spark):
        """r12: s_ann_bruteforce scores with a per-dimension-accumulated
        numpy pass instead of the Catalyst `cosine_sim` HOF fold. The
        accumulation order is dimension-by-dimension, so every cell sees
        the identical sequential IEEE sequence — raw cosines must be
        BIT-identical to the HOF fold (not merely round6-equal)."""
        from pyspark.sql import functions as F

        from spark_sql_server_spark.operators.dedup import cosine_sim
        from spark_sql_server_spark.operators.similarity import _N_QUERIES
        from spark_sql_server_spark.session import load_table

        emb = load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe")
        )
        hof = {
            (r.qid, r.vec_id): r.c
            for r in emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                cosine_sim(F.col("qe"), F.col("e")).alias("c"),
            )
            .collect()
        }
        rows = emb.collect()
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        E = np.array([r.e for r in rows], dtype=np.float64)
        qmask = ids < _N_QUERIES
        qids, Q = ids[qmask], E[qmask]
        nb = np.zeros(len(qids))
        na = np.zeros(len(ids))
        D = np.zeros((len(ids), len(qids)))
        for i in range(E.shape[1]):
            nb += Q[:, i] * Q[:, i]
            col = E[:, i]
            D += col[:, None] * Q[None, :, i]
            na += col * col
        cos = D / np.sqrt(na[:, None] * nb[None, :])
        n_checked = 0
        for r, vid in enumerate(ids):
            for j, qid in enumerate(qids):
                if vid == qid:
                    continue
                assert cos[r, j] == hof[(qid, vid)], (
                    f"fold mismatch at (q={qid}, v={vid}): "
                    f"{cos[r, j]!r} != {hof[(qid, vid)]!r}"
                )
                n_checked += 1
        assert n_checked == len(hof)


class TestAnnLsh:
    def test_recall_vs_bruteforce(self, spark):
        brute = REGISTRY["s_ann_bruteforce"].fn(spark, SF_SMOKE).collect()
        lsh = REGISTRY["s_ann_lsh"].fn(spark, SF_SMOKE).collect()
        top1 = {(r.qid, r.neighbor) for r in brute if r.rnk == 1}
        found = {(r.qid, r.neighbor) for r in lsh}
        # single-table 8-plane LSH: modest recall target on top-1
        recall = len(top1 & found) / len(top1)
        assert recall >= 0.3, f"ANN-LSH top-1 recall {recall}"

    def test_lsh_results_subset_ranked_correctly(self, spark):
        lsh = REGISTRY["s_ann_lsh"].fn(spark, SF_SMOKE).collect()
        by_q: dict[int, list] = {}
        for r in lsh:
            by_q.setdefault(r.qid, []).append(r)
        for q, rs in by_q.items():
            sims = [r.cos_sim for r in sorted(rs, key=lambda x: x.rnk)]
            assert sims == sorted(sims, reverse=True)


class TestAnnIvf:
    @staticmethod
    def _micro_corpus(spark):
        from spark_sql_server_spark.session import load_table

        rows = (
            load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("vec_id", "label", "CAST(embedding AS array<double>) e")
            .orderBy("vec_id")
            .collect()
        )
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        labels = np.array([r.label for r in rows], dtype=np.int64)
        E = np.floor(
            np.array([r.e for r in rows], dtype=np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        return ids, labels, E

    def test_recall_vs_l2_bruteforce(self, spark):
        """This corpus has weak cluster structure, so cluster membership
        barely predicts neighborhoods and IVF recall degrades toward
        nprobe/k. The bound asserts IVF does no worse than that floor;
        plus the exact IVF guarantee: whenever the true L2 top-1's
        cluster IS probed, IVF must return it at rank 1."""
        from spark_sql_server_spark.operators.similarity import _N_QUERIES

        ids, labels, E = self._micro_corpus(spark)
        ivf = REGISTRY["s_ann_ivf"].fn(spark, SF_SMOKE).collect()
        found = {(r.qid, r.neighbor) for r in ivf}
        rank1 = {r.qid: r.neighbor for r in ivf if r.rnk == 1}

        hits = 0
        qsel = ids < _N_QUERIES
        for qi, qv in zip(ids[qsel], E[qsel]):
            d2 = ((E - qv) ** 2).sum(axis=1)
            cand = [(int(d2[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qi]
            top1 = min(cand)[1]
            if (int(qi), top1) in found:
                hits += 1
                assert rank1[qi] == top1  # exact guarantee when probed
        assert hits / qsel.sum() >= 0.3, f"IVF top-1 recall {hits / qsel.sum()}"

    def test_distances_exact(self, spark):
        """Mechanism correctness: every returned dist2 must equal the
        exact integer micro-space squared L2 recomputed in numpy."""
        ids, labels, E = self._micro_corpus(spark)
        byid = {int(i): E[k] for k, i in enumerate(ids)}
        ivf = REGISTRY["s_ann_ivf"].fn(spark, SF_SMOKE).collect()
        assert ivf
        for r in ivf:
            diff = byid[r.qid] - byid[r.neighbor]
            assert r.dist2 == int((diff * diff).sum())

    def test_returns_k_per_query(self, spark):
        ivf = REGISTRY["s_ann_ivf"].fn(spark, SF_SMOKE).collect()
        by_q: dict[int, int] = {}
        for r in ivf:
            by_q[r.qid] = max(by_q.get(r.qid, 0), r.rnk)
        assert all(k == 5 for k in by_q.values())


class TestAnnPq:
    def test_recall_vs_l2_bruteforce(self, spark):
        """At SF_SMOKE the ADC shortlist (50) covers most of the corpus,
        so the true L2 top-1 should usually survive quantization into
        the shortlist and win the exact re-rank."""
        from spark_sql_server_spark.operators.similarity import _N_QUERIES
        from spark_sql_server_spark.session import load_table

        rows = (
            load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("vec_id", "CAST(embedding AS array<double>) e")
            .orderBy("vec_id")
            .collect()
        )
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        E = np.floor(
            np.array([r.e for r in rows], dtype=np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        pq = REGISTRY["s_ann_pq"].fn(spark, SF_SMOKE).collect()
        found = {(r.qid, r.neighbor) for r in pq}
        hits = total = 0
        for qi, qv in zip(ids[ids < _N_QUERIES], E[ids < _N_QUERIES]):
            d2 = ((E - qv) ** 2).sum(axis=1)
            cand = [(int(d2[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qi]
            top1 = min(cand)[1]
            total += 1
            hits += (int(qi), top1) in found
        assert hits / total >= 0.9, f"PQ top-1 recall {hits / total}"

    def test_full_numpy_mirror(self, spark):
        """Mechanism: the whole integer PQ pipeline (fit → encode → ADC
        shortlist → exact re-rank) reproduced in pure numpy from the
        same codebook must yield the same neighbors and distances —
        exact equality, everything is int64."""
        import numpy as np

        from spark_sql_server_spark.operators.similarity import (
            _EMB_MICRO_EXPR,
            _N_QUERIES,
            _PQ_ITERS,
            _PQ_K,
            _PQ_M,
            _PQ_SHORTLIST,
            _TOP_K,
            _pq_fit,
            pq_encode_mirror,
        )
        from spark_sql_server_spark.session import load_table

        emb = load_table(spark, SF_SMOKE, "embeddings").selectExpr(
            "vec_id", f"{_EMB_MICRO_EXPR} AS m"
        )
        C = _pq_fit(spark, emb, _PQ_M, _PQ_K, _PQ_ITERS)
        rows = sorted(emb.collect(), key=lambda r: r.vec_id)
        E = np.array([r.m for r in rows], dtype=np.int64)
        vid = np.array([r.vec_id for r in rows])
        codes = pq_encode_mirror(E, C)
        m, k, sd = C.shape
        qsel = vid < _N_QUERIES
        Q = E[qsel]
        Qs = Q.reshape(len(Q), m, sd)
        dtab = ((Qs[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
        rows_idx = np.arange(m)[None, :]
        adc = dtab[:, rows_idx, codes].sum(axis=2)  # (nq, n) int64

        expected = {}
        for qi in range(len(Q)):
            order = sorted(
                (i for i in range(len(vid)) if vid[i] != qi),
                key=lambda i: (int(adc[qi, i]), vid[i]),
            )[:_PQ_SHORTLIST]
            exact = sorted(
                order,
                key=lambda i: (int(((E[qi] - E[i]) ** 2).sum()), vid[i]),
            )[:_TOP_K]
            expected[qi] = [
                (int(vid[i]), int(((E[qi] - E[i]) ** 2).sum())) for i in exact
            ]

        got = REGISTRY["s_ann_pq"].fn(spark, SF_SMOKE).collect()
        by_q: dict[int, list] = {}
        for r in sorted(got, key=lambda r: (r.qid, r.rnk)):
            by_q.setdefault(r.qid, []).append((r.neighbor, r.dist2))
        assert by_q == expected


class TestCentroids:
    def test_vs_numpy(self, spark):
        import duckdb

        rows = REGISTRY["s_label_centroids"].fn(spark, SF_SMOKE).collect()
        con = duckdb.connect()
        data = con.execute(
            f"SELECT label, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
        ).fetchall()
        by_label: dict[int, list] = {}
        for label, emb in data:
            by_label.setdefault(label, []).append(np.array(emb, dtype=np.float64))
        for r in rows:
            ref = np.mean(by_label[r.label], axis=0)
            assert r.n == len(by_label[r.label])
            for i in range(3):
                # micro-space quantization (inputs floored to 1e-6, mean
                # floored to 1e-6) can deviate up to ~1.5e-6 from the
                # true float mean
                assert abs(getattr(r, f"c{i}") - ref[i]) < 2e-6


class TestApproxAggregates:
    def test_hll_within_5pct_of_exact(self, spark):
        """Raw estimate accuracy, tighter than the certified 3-sigma
        boolean (the registry op now emits the certified columns only)."""
        from pyspark.sql import functions as F

        from spark_sql_server_spark.session import load_table

        li = load_table(spark, SF_SMOKE, "lineitem")
        rows = (
            li.groupBy("l_returnflag")
            .agg(
                F.approx_count_distinct("l_partkey").alias("approx_parts"),
                F.countDistinct("l_partkey").alias("exact_parts"),
                F.percentile_approx("l_quantity", 0.5).alias("approx_median"),
            )
            .collect()
        )
        assert rows
        for r in rows:
            assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.05
            assert 1 <= r.approx_median <= 50

    def test_certified_booleans_true(self, spark):
        rows = REGISTRY["q_approx_distinct"].fn(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            assert r.approx_ok and r.median_rank_ok


class TestFrameSampling:
    def test_strided_frames(self, spark):
        import duckdb

        from spark_sql_server_spark.operators.multimodal import frame_sample_full

        rows = frame_sample_full(spark, SF_SMOKE).collect()
        con = duckdb.connect()
        texts = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
            ).fetchall()
        )
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert len(by_doc) == len(texts)
        for doc_id, frames in list(by_doc.items())[:20]:
            blob = texts[doc_id].encode("utf-8")
            expected_idx = list(range(0, max(len(blob) // 64, 1), 4))
            assert sorted(f.frame_idx for f in frames) == expected_idx
            first = next(f for f in frames if f.frame_idx == 0)
            assert bytes(first.frame) == blob[:64]
            assert first.frame_head_hex == blob[:4].hex()

    def test_corpus_is_ascii(self):
        # the multimodal oracles equate DuckDB char codes with UTF-8
        # bytes — valid only while the documents corpus stays ASCII;
        # this guard fails loudly if a testdata rev breaks that
        import duckdb

        n = duckdb.connect().execute(
            f"SELECT COUNT(*) FROM '{SF_SMOKE}/documents.parquet' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0


class TestMultimodal:
    def test_feature_extraction_batch_shape(self, spark):
        df = REGISTRY["m_media_features"].fn(spark, SF_SMOKE)
        rows = df.collect()
        assert len(rows) == 500
        assert df.schema.fieldNames() == [
            "doc_id", "size_bytes", "byte_mean", "byte_min", "byte_max", "head_hex",
        ]

    def test_byte_stats_match_python(self, spark):
        import duckdb

        rows = {
            r.doc_id: r
            for r in REGISTRY["m_media_features"].fn(spark, SF_SMOKE).limit(10).collect()
        }
        con = duckdb.connect()
        texts = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet' "
                "ORDER BY doc_id LIMIT 10"
            ).fetchall()
        )
        for doc_id, r in rows.items():
            blob = texts[doc_id].encode("utf-8")
            assert r.size_bytes == len(blob)
            assert abs(r.byte_mean - sum(blob) / len(blob)) < 1e-9
            assert r.head_hex == blob[:4].hex()

    def test_decode_stub_raises_without_fake(self):
        from spark_sql_server_spark.operators.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG", "png")

    def test_metadata_scan_prunes_blob(self, spark, tmp_path):
        """When the media table is stored as parquet, a metadata-only
        aggregate must prune the blob column at the scan (ReadSchema
        without `media`) — the point of the blob+metadata layout."""
        from spark_sql_server_spark.operators.multimodal import make_media_table

        path = str(tmp_path / "media.parquet")
        make_media_table(spark, SF_SMOKE).write.mode("overwrite").parquet(path)
        stored = spark.read.parquet(path)
        agg = stored.groupBy(stored.meta.media_type.alias("media_type")).count()
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read_schema, plan
        assert "media:binary" not in read_schema[0], read_schema[0]

    def test_media_meta_aggregate(self, spark):
        rows = REGISTRY["m_media_meta"].fn(spark, SF_SMOKE).collect()
        assert rows[0].n_blobs == 500


class TestEmbeddingNeardupBucketed:
    """The registered near-dup operator is LSH-bucketed; these pin it
    bit-identical to the (unregistered) all-pairs baseline — recall 1.0
    at the oracle threshold, per VERDICT r1 #3."""

    def test_equals_allpairs_baseline(self, spark):
        from spark_sql_server_spark.operators.dedup import (
            _embedding_neardup_allpairs,
        )

        got = [tuple(r) for r in REGISTRY["d_embedding_neardup"].fn(spark, SF_SMOKE).collect()]
        want = [tuple(r) for r in _embedding_neardup_allpairs(spark, SF_SMOKE).collect()]
        assert len(want) > 0  # sf0.001 has qualifying pairs — a real check
        assert got == want

    def test_no_cartesian_in_plan(self, spark):
        from spark_sql_server_spark.plans import executed_plan

        plan = executed_plan(REGISTRY["d_embedding_neardup"].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestGramDfCap:
    """A ubiquitous shingle must not explode the inverted-index
    self-join (VERDICT r1 #5): candidate fan-out stays bounded by the
    df-cap while genuine near-dup pairs (which share rare grams) keep
    full recall."""

    @pytest.fixture()
    def planted_dir(self, spark, tmp_path):
        stop = "of the and"  # one shingle shared by EVERY doc
        rows = []
        for i in range(100):
            body = f"unique{i}a unique{i}b unique{i}c unique{i}d"
            rows.append((i, f"{body} {stop}", "t", "en", 1))
        # docs 200/201: genuine near-dups (share many rare grams)
        dup = "alpha beta gamma delta epsilon zeta eta theta"
        rows.append((200, f"{dup} one", "t", "en", 1))
        rows.append((201, f"{dup} two", "t", "en", 1))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string, n_chars int"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_fanout_bounded_and_neardups_found(self, spark, planted_dir):
        from spark_sql_server_spark.operators.dedup import _ngram_candidates

        cand = _ngram_candidates(spark, planted_dir).collect()
        # without the cap the stop shingle alone yields 100*99/2 ≈ 5k
        # candidate pairs; with it only rare-gram pairs survive
        assert len(cand) < 50
        assert (200, 201) in {(r.doc_a, r.doc_b) for r in cand}

    def test_neardup_pair_reported_exactly(self, spark, planted_dir):
        got = [tuple(r) for r in REGISTRY["d_ngram_jaccard"].fn(spark, planted_dir).collect()]
        assert any(a == 200 and b == 201 for a, b, _ in got)
        # jaccard must be the exact full-set value, unaffected by the cap
        jac = next(j for a, b, j in got if (a, b) == (200, 201))
        # 9 words → 7 trigrams each; 6 shared (the last trigram differs:
        # "eta theta one" vs "eta theta two") → 6 / (7+7-6)
        assert jac == pytest.approx(6 / 8)


class TestConnectedComponentsPaths:
    """_propagate_min_labels is adaptive: driver union-find under the
    edge threshold, distributed min-label propagation above. Both paths
    must emit identical (doc_id, cluster_id) labels."""

    _EDGES = [
        # chain 1-2-3-4, star 10-{11,12,13}, cycle 20-21-22-20, pair 30-31
        (1, 2), (2, 3), (3, 4),
        (10, 11), (10, 12), (10, 13),
        (20, 21), (21, 22), (20, 22),
        (30, 31),
    ]
    _WANT = {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }

    def _pairs(self, spark):
        return spark.createDataFrame(
            self._EDGES, "doc_a BIGINT, doc_b BIGINT"
        )

    def test_driver_union_find(self, spark):
        from spark_sql_server_spark.operators.dedup import _propagate_min_labels

        got = {
            r.doc_id: r.cluster_id
            for r in _propagate_min_labels(self._pairs(spark)).collect()
        }
        assert got == self._WANT

    def test_distributed_path_identical(self, spark, monkeypatch):
        import spark_sql_server_spark.operators.dedup as dedup

        monkeypatch.setattr(dedup, "_CC_DRIVER_THRESHOLD", -1)
        got = {
            r.doc_id: r.cluster_id
            for r in dedup._propagate_min_labels(self._pairs(spark)).collect()
        }
        assert got == self._WANT


class TestIncrementalDedup:
    """d_incremental_dedup must agree with the full-corpus operators on
    the cross-shard facts it claims."""

    def test_statuses_consistent_with_full_corpus_ops(self, spark):
        from spark_sql_server_spark.operators.dedup import (
            _INC_SHARD_MOD,
            _INC_SHARD_REM,
            _JACCARD_THRESHOLD,
            _jaccard_pairs_for,
        )
        from spark_sql_server_spark.session import load_table

        res = {
            r["doc_id"]: r["status"]
            for r in REGISTRY["d_incremental_dedup"].fn(spark, SF_SMOKE).collect()
        }
        docs = load_table(spark, SF_SMOKE, "documents")
        is_new = lambda i: i % _INC_SHARD_MOD == _INC_SHARD_REM  # noqa: E731
        # every shard doc got exactly one status
        shard_ids = {r["doc_id"] for r in docs.collect() if is_new(r["doc_id"])}
        assert set(res) == shard_ids
        assert set(res.values()) <= {"dup_exact", "dup_near", "new"}

        # exact dups: same definition as d_dedup_exact's hash grouping
        import hashlib

        by_hash: dict[str, list[int]] = {}
        for r in docs.select("doc_id", "text").collect():
            by_hash.setdefault(
                hashlib.md5(r["text"].encode()).hexdigest(), []
            ).append(r["doc_id"])
        expected_exact = {
            i
            for ids in by_hash.values()
            for i in ids
            if is_new(i) and any(not is_new(j) for j in ids)
        }
        assert {i for i, s in res.items() if s == "dup_exact"} == expected_exact

        # near dups: full-corpus jaccard pairs, restricted to cross-shard
        # links, must label the shard side dup_near (unless exact won)
        pairs = _jaccard_pairs_for(docs).collect()
        expected_near = set()
        for p in pairs:
            if p["jaccard"] >= _JACCARD_THRESHOLD:
                a, b = p["doc_a"], p["doc_b"]
                if is_new(a) != is_new(b):
                    expected_near.add(a if is_new(a) else b)
        for i in expected_near:
            assert res[i] in ("dup_exact", "dup_near")
        for i, s in res.items():
            if s == "dup_near":
                assert i in expected_near or res[i] != "new"


class TestThumbnail:
    def test_payload_matches_numpy_mirror(self, spark):
        import numpy as np

        from spark_sql_server_spark.operators.multimodal import (
            _THUMB_W,
            thumbnail_full,
        )
        from spark_sql_server_spark.session import load_table

        texts = {
            r["doc_id"]: r["text"].encode()
            for r in load_table(spark, SF_SMOKE, "documents").collect()
        }
        rows = thumbnail_full(spark, SF_SMOKE).collect()
        seen = set()
        for r in rows:
            data = texts[r["doc_id"]]
            h2 = (len(data) // _THUMB_W) // 2
            arr = (
                np.frombuffer(data[: _THUMB_W * 2 * h2], np.uint8)
                .reshape(2 * h2, _THUMB_W)
                .astype(np.int64)
            )
            pooled = (
                arr[0::2, 0::2] + arr[0::2, 1::2]
                + arr[1::2, 0::2] + arr[1::2, 1::2]
            ) // 4
            assert bytes(r["thumb"]) == pooled.astype(np.uint8).tobytes()
            assert (r["out_h"], r["out_w"]) == (h2, _THUMB_W // 2)
            seen.add(r["doc_id"])
        # every large-enough doc produced a thumbnail
        expected = {i for i, t in texts.items() if len(t) >= 2 * _THUMB_W}
        assert seen == expected
