"""Embedding operators: normalisation, int8 quantisation error bound,
PCA recovery of a planted low-rank structure, projection parity with
numpy, and partitioning invariance of the distributed covariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marex_spark.operators.embed import (
    dequantize_int8,
    embedding_normalize,
    pca_fit,
    pca_project,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    # planted rank-2 structure in 8-d + small noise
    basis = rng.normal(size=(2, 8))
    coef = rng.normal(size=(300, 2)) * np.array([5.0, 2.0])
    X = coef @ basis + rng.normal(scale=0.05, size=(300, 8)) + 1.5
    rows = [(i, [float(v) for v in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, X


def test_normalize_unit_and_zero(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = embedding_normalize(df).orderBy("vec_id").collect()
    assert abs(out[0].embedding[0] - 0.6) < 1e-6
    assert out[1].embedding == [0.0, 0.0]  # zero vector untouched


def test_quantize_roundtrip_error_bound(vecs):
    df, X = vecs
    q = quantize_int8(df)
    back = dequantize_int8(q, out_col="deq").collect()
    for r in back:
        v = np.array(r.embedding, dtype=np.float64)
        dq = np.array(r.deq, dtype=np.float64)
        assert np.all(np.abs(v - dq) <= r.scale / 2 + 1e-9)
        assert max(abs(x) for x in np.array(r.qvec)) <= 127


def test_pca_recovers_planted_rank(vecs):
    df, X = vecs
    m = pca_fit(df, k=4)
    ev = m["explained_variance"]
    # two planted directions dominate the noise floor
    assert ev[0] > ev[2] * 50 and ev[1] > ev[2] * 50
    # parity with numpy eig on the exact covariance
    cov = np.cov(X.T, bias=True)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(ev, w[:4], rtol=1e-6)


def test_pca_project_matches_numpy_and_is_partition_invariant(vecs):
    df, X = vecs
    m = pca_fit(df, k=2)
    m2 = pca_fit(df.repartition(13), k=2)
    np.testing.assert_allclose(m["components"], m2["components"], atol=1e-9)
    out = pca_project(df, m).orderBy("vec_id").collect()
    got = np.array([r.projected for r in out])
    want = (X - m["mean"]) @ m["components"].T
    np.testing.assert_allclose(got, want, atol=1e-4)
    # projected variance equals the eigenvalues
    np.testing.assert_allclose(
        got.var(axis=0), m["explained_variance"], rtol=1e-3
    )


class TestPcaPower:
    """Deterministic subspace-iteration fit (the fully SQL-replayable
    tier backing the emb_pca_power oracle, queries/similarity.py)."""

    def test_orthonormal_and_aligned_with_eigh(self, vecs):
        from marex_spark.operators.embed import pca_power_fit

        df, X = vecs
        m = pca_power_fit(df, k=2, n_iter=10)
        Q = m["components"]
        np.testing.assert_allclose(Q @ Q.T, np.eye(2), atol=1e-9)
        # the planted fixture has a strong eigengap, so 10 rounds
        # converge: components match the eigh tier up to sign (signs
        # are fixed the same way on both paths)
        ref = pca_fit(df, k=2)["components"]
        np.testing.assert_allclose(np.abs(Q @ ref.T), np.eye(2), atol=1e-3)
        np.testing.assert_allclose(m["mean"], X.mean(axis=0), atol=1e-6)

    def test_bit_identical_across_partitionings(self, vecs):
        from marex_spark.operators.embed import pca_power_fit

        df, _ = vecs
        m1 = pca_power_fit(df.coalesce(1), k=3, n_iter=6)
        m2 = pca_power_fit(df.repartition(17), k=3, n_iter=6)
        # decimal sums make the covariance order-independent, and the
        # driver iteration is a fixed op sequence — EXACT equality,
        # not allclose (this is what lets the DuckDB oracle hash-match)
        assert m1["mean"].tolist() == m2["mean"].tolist()
        assert m1["components"].tolist() == m2["components"].tolist()

    def test_empty_raises(self, spark):
        from marex_spark.operators.embed import pca_power_fit

        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            pca_power_fit(df, k=2)


class TestKMeans:
    """Lloyd's k-means: recovers planted blobs, is partition-invariant,
    and keeps empty clusters at their previous centroid."""

    @pytest.fixture(scope="class")
    def blobs(self, spark):
        rng = np.random.default_rng(7)
        centers = np.array(
            [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
        )
        X = np.vstack(
            [c + rng.normal(scale=0.3, size=(40, 3)) for c in centers]
        )
        truth = np.repeat(np.arange(3), 40)
        rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return df, truth

    def test_recovers_planted_blobs(self, blobs):
        from marex_spark.operators.embed import kmeans_assign, kmeans_fit

        df, truth = blobs
        cents = kmeans_fit(df, k=3, n_iter=4)
        out = kmeans_assign(df, cents).orderBy("vec_id").collect()
        got = np.array([r.cent_id for r in out])
        # every planted blob lands in exactly one learned cluster
        for b in range(3):
            assert len(set(got[truth == b])) == 1
        assert len({got[truth == b][0] for b in range(3)}) == 3
        # each blob's centroid sits at its planted center
        for b in range(3):
            ci = got[truth == b][0]
            assert np.abs(np.array(cents[ci]).max() - 10.0) < 0.2

    def test_partition_invariant(self, blobs):
        from marex_spark.operators.embed import kmeans_fit

        df, _ = blobs
        a = kmeans_fit(df, k=3, n_iter=2)
        b = kmeans_fit(df.repartition(13), k=3, n_iter=2)
        # decimal-fold sums make the fit independent of partitioning
        assert a == b

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        from marex_spark.operators.embed import kmeans_fit

        # two far blobs, k=3: at least one seed strands with no
        # exclusive territory after the first update on some draws;
        # regardless, every returned centroid must be finite and k kept
        rng = np.random.default_rng(3)
        X = np.vstack(
            [
                [0.0, 0.0] + rng.normal(scale=0.1, size=(20, 2)),
                [50.0, 50.0] + rng.normal(scale=0.1, size=(20, 2)),
            ]
        )
        rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = kmeans_fit(df, k=3, n_iter=3)
        assert len(cents) == 3
        assert all(np.isfinite(c).all() for c in np.array(cents))

    def test_validation(self, blobs):
        from marex_spark.operators.embed import kmeans_fit

        df, _ = blobs
        with pytest.raises(ValueError):
            kmeans_fit(df, k=0)
        with pytest.raises(ValueError):
            kmeans_fit(df.filter("vec_id < 0"), k=2)


class TestPQFit:
    def test_pq_fit_equals_per_subspace_kmeans(self, spark):
        """The batched trainer must be value-identical to running
        kmeans_fit on each subspace slice independently — the batching
        only fuses the m update aggregations into one job."""
        import numpy as np
        from pyspark.sql import functions as F

        from marex_spark.operators.embed import kmeans_fit, pq_fit

        rng = np.random.default_rng(7)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=32)]) for i in range(80)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        books = pq_fit(df, m=4, k=5, n_iter=2)
        for j in range(4):
            sub = df.select(
                "vec_id", F.slice("embedding", j * 8 + 1, 8).alias("embedding")
            )
            expect = kmeans_fit(sub, k=5, n_iter=2)
            assert books[j] == expect, f"subspace {j}"

    def test_pq_fit_validation(self, spark):
        import pytest

        from marex_spark.operators.embed import pq_fit

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            pq_fit(df, m=2)  # 3 dims not divisible
        with pytest.raises(ValueError):
            pq_fit(df.limit(0), m=1)


class TestPQKernel:
    def test_kernel_matches_expression_path(self, spark):
        """The numpy ADC kernel must reproduce the decimal-fold
        expression path value-for-value: same codes (ties to lowest
        codeword), same quantized LUT sums."""
        import numpy as np
        from pyspark.sql import functions as F

        from marex_spark.operators.embed import (
            kmeans_assign_cols,
            pq_fit,
            pq_score_kernel,
        )
        from marex_spark.queries.similarity import _dec_dist2_col

        rng = np.random.default_rng(12)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=32)]) for i in range(120)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        books = pq_fit(df, m=4, k=6, n_iter=1)
        query = [float(x) for x in rng.normal(size=32)]

        adc = None
        sel = ["vec_id"]
        expr = df
        for j in range(4):
            sl = F.slice("embedding", j * 8 + 1, 8)
            code, _ = kmeans_assign_cols(sl, books[j])
            qsub = F.array(*[F.lit(v) for v in query[j * 8 : (j + 1) * 8]])
            lut = F.array(*[_dec_dist2_col(qsub, c) for c in books[j]])
            # double-cast each LUT term, sum in subspace order (the
            # kernel's IEEE fold)
            term = F.element_at(lut, code + F.lit(1)).cast("double")
            adc = term if adc is None else adc + term
            expr = expr.withColumn(f"code{j}", code)
            sel.append(f"code{j}")
        expect = {
            r.vec_id: (r.adc, r.code0, r.code1, r.code2, r.code3)
            for r in expr.withColumn("adc", adc).select(*sel, "adc").collect()
        }
        got = {
            r.vec_id: (r.adc, r.code0, r.code1, r.code2, r.code3)
            for r in pq_score_kernel(df, books, query).collect()
        }
        assert got == expect

    def test_pq_fit_kernel_equals_expression(self, spark):
        """pq_fit's Arrow tier must reproduce the expression path's
        codebooks bit-for-bit — same micro-unit assignments, same
        decimal-exact update means — including across iterations
        (divergence compounds) and with negative elements (HALF_UP is
        away-from-zero)."""
        import numpy as np

        from marex_spark.operators.embed import pq_fit

        rng = np.random.default_rng(77)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=24) * 3.0])
            for i in range(150)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        for n_iter in (1, 2):
            expr_books = pq_fit(df, m=3, k=5, n_iter=n_iter)
            kern_books = pq_fit(df, m=3, k=5, n_iter=n_iter, kernel=True)
            assert kern_books == expr_books

    def test_kmeans_fit_kernel_equals_expression(self, spark):
        """kmeans_fit's full-Arrow iteration (a 1-subspace PQ fit) must
        reproduce the expression iteration bit-for-bit."""
        import numpy as np

        from marex_spark.operators.embed import kmeans_fit

        rng = np.random.default_rng(31)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=16) * 2.0])
            for i in range(130)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        expr_c = kmeans_fit(df, k=6, n_iter=2)
        kern_c = kmeans_fit(df, k=6, n_iter=2, kernel=True)
        assert kern_c == expr_c


class TestSemDeDup:
    def test_exact_duplicates_drop_one_side(self, spark):
        from marex_spark.operators.embed import semdedup

        # two identical pairs + two singletons; cosine(dup pair) = 1
        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semdedup(df, tau=0.99, k=2, n_iter=1).collect()
        assert {r.vec_id for r in out} == {1, 2, 3, 4}
        keep = {r.vec_id: r.keep for r in out}
        # exactly one of the identical pair is dropped; singletons kept
        assert sorted([keep[1], keep[2]]) == [False, True]
        assert keep[3] and keep[4]

    def test_k_derived_from_corpus_count(self, spark):
        from marex_spark.operators.embed import semdedup

        rows = [(i, [float(i % 3), 1.0]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # 20 vectors / target 5 = 4 clusters, floored at 8 → k=8
        out = semdedup(df, tau=0.999, k=None, n_iter=1, target_cluster_size=5)
        got = out.select("cent_id").distinct().count()
        assert got <= 8  # k = max(8, ceil(20/5)) = 8 centroids trained
        assert out.count() == 20


class TestSemDeDupKernel:
    @pytest.mark.slow
    def test_kernel_equals_expression_tier_on_fixture(self, spark):
        """The applyInPandas kernel must reproduce the exploded-join
        tier row-for-row on the real fixture (same micro-unit decimal
        chain — this is the pin that lets both tiers share one
        oracle)."""
        from marex_spark.queries.similarity import (
            dedup_semdedup,
            dedup_semdedup_fast,
        )

        sf = "/root/testdata/sf0.001"
        a = {tuple(r) for r in dedup_semdedup(spark, sf).collect()}
        b = {tuple(r) for r in dedup_semdedup_fast(spark, sf).collect()}
        assert a == b

    def test_kernel_handles_negative_components_and_ties(self, spark):
        """Negative products exercise the HALF_UP away-from-zero
        micro rounding; identical vectors exercise the dist2 tie
        (drop the higher id)."""
        from marex_spark.operators.embed import semdedup, semdedup_kernel

        rows = [
            (1, [-1.0, 0.5, -0.25]),
            (2, [-1.0, 0.5, -0.25]),   # exact dup of 1 (tie on dist2)
            (3, [1.0, -0.5, 0.25]),    # anti-parallel to 1 (cos = -1)
            (4, [0.0, 0.0, 1.0]),
            (5, [0.1, 0.1, 0.98]),     # near-dup of 4
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = {tuple(r) for r in semdedup(df, tau=0.9, k=2, n_iter=1).collect()}
        b = {tuple(r) for r in semdedup_kernel(df, tau=0.9, k=2, n_iter=1).collect()}
        assert a == b
        keep = {r[0]: r[2] for r in a}
        assert sorted([keep[1], keep[2]]) == [False, True]  # one dup dropped
        assert keep[3]  # anti-parallel is NOT a near-dup


class TestKMeansAssignKernel:
    def test_kernel_equals_literal_tier(self, spark):
        """The Arrow assignment kernel must reproduce the literal-
        expression tier exactly — same micro-unit decimal distances,
        same first-argmin tie-break — on real fixture embeddings."""
        from marex_spark.operators.embed import (
            kmeans_assign,
            kmeans_fit,
        )
        from marex_spark.sources.parquet import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = kmeans_fit(emb, k=8, n_iter=1)
        lit = {
            (r.vec_id, r.cent_id, r.dist2)
            for r in kmeans_assign(emb, cents, kernel=False)
            .select("vec_id", "cent_id", "dist2")
            .collect()
        }
        ker = {
            (r.vec_id, r.cent_id, r.dist2)
            for r in kmeans_assign(emb, cents, kernel=True)
            .select("vec_id", "cent_id", "dist2")
            .collect()
        }
        assert lit == ker

    def test_fit_kernel_tier_equals_literal(self, spark, monkeypatch):
        """Forcing the fit's assignment through the kernel (budget →
        0) must yield identical centroids."""
        import marex_spark.operators.embed as em
        from marex_spark.sources.parquet import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        a = em.kmeans_fit(emb, k=4, n_iter=2)
        monkeypatch.setattr(em, "_ASSIGN_LITERAL_BUDGET", 0)
        b = em.kmeans_fit(emb, k=4, n_iter=2)
        assert a == b

    @pytest.mark.slow
    def test_blas_mode_finds_planted_dups(self, spark):
        """exact=False (float64 BLAS end to end) is the approximate
        production mode: the float k-means fit can block borderline
        vectors into different clusters than the decimal fit (observed:
        1/500 flips on the fixture), so it carries no exact-equality
        contract. What it MUST do: find every planted exact duplicate
        (cos 1.0 pairs land in the same cluster — identical vectors
        have identical assignments) and keep the rest of a
        near-orthogonal corpus, agreeing with the exact tier on ≥99%
        of decisions."""
        from marex_spark.operators.embed import semdedup_kernel
        from marex_spark.sources.synthetic import synthetic_embeddings

        emb = synthetic_embeddings(spark, 2000, dim=32, dup_every=100)
        a = semdedup_kernel(emb, tau=0.95, k=8, n_iter=1).collect()
        b = semdedup_kernel(emb, tau=0.95, k=8, n_iter=1, exact=False).collect()
        ka = {r.vec_id: r.keep for r in a}
        kb = {r.vec_id: r.keep for r in b}
        # every planted dup pair (i, i+1 for i % 100 == 0) loses
        # exactly one member, in BOTH modes
        for mode in (ka, kb):
            for i in range(0, 2000, 100):
                assert sorted([mode[i], mode[i + 1]]) == [False, True], i
        n_disagree = sum(1 for v in ka if ka[v] != kb[v])
        assert n_disagree <= 20, n_disagree  # ≥99% agreement


def test_srp_fast_tier_bit_identical_to_exact(spark):
    """srp_fingerprints_fast (numpy matmul per Arrow batch) must match
    the decimal-sum expression tier bit for bit on the fixture — the
    two tiers index with the same geometry, so a corpus indexed by the
    fast tier serves the oracle-verified query rows unchanged."""
    from marex_spark.operators.embed import srp_fingerprints_fast
    from marex_spark.queries.similarity import (
        _exploded,
        _srp_fingerprints_exact,
    )
    from marex_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    d = len(emb.select("embedding").first()[0])
    exact = {
        r.vec_id: r.srp
        for r in _srp_fingerprints_exact(
            spark, _exploded(emb, "vec_id"), d
        ).collect()
    }
    fast = {r.vec_id: r.srp for r in srp_fingerprints_fast(emb).collect()}
    assert fast == exact
    assert len(fast) == 500
    assert any(v < 0 for v in fast.values()), "bit 63 must be exercised"
