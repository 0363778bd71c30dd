"""Embedding-column operators for the training-data pipeline:
normalisation, int8 scalar quantisation, and distributed PCA.

These are the preparation stages upstream of the similarity suite
(queries/similarity.py): ANN assumes unit vectors, storage at 100 TB
wants 4× int8 compression, and IVF bucketing benefits from
decorrelated axes. All hot-path arithmetic stays JVM-side
(``aggregate``/``zip_with``/``transform`` higher-order functions);
the only driver-side step is the 64×64 eigendecomposition, fed by a
map-side partial-covariance pass (the classic "matrix agg = partial
X'X per partition + driver combine" pattern — the shuffle moves
d×(d+1) floats per partition, never the vectors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def embedding_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """L2-normalise vectors (unit sphere — the form every cosine
    operator downstream assumes). Zero vectors pass through unchanged
    rather than dividing by zero."""
    out_col = out_col or vec_col
    norm = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    # materialise the norm as a plain column FIRST: referencing the
    # aggregate subtree inside the transform lambda re-evaluates it per
    # ELEMENT (O(d²) per row — review finding); a projected column is
    # evaluated once per row
    return (
        df.withColumn("_nrm", norm)
        .withColumn(
            out_col,
            F.when(
                F.col("_nrm") > 0.0,
                F.transform(vec_col, lambda x: x / F.col("_nrm")),
            ).otherwise(F.col(vec_col)),
        )
        .drop("_nrm")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantisation: scale = max|v|/127,
    q_i = floor(v_i/scale + 0.5) (explicit half-up — identical maths is
    expressible in the DuckDB oracle, where round() ties-to-even would
    diverge). Storage drops 4×; dequantisation error ≤ scale/2 per
    coordinate. Zero vectors get scale 0 and all-zero codes."""
    amax = F.aggregate(
        vec_col,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    # amax as a projected column: inside the transform lambda the
    # aggregate would re-run per element (O(d²) per row)
    d = df.withColumn("_amax", amax).withColumn(
        "scale", F.col("_amax") / F.lit(127.0)
    )
    q = F.when(
        F.col("_amax") > 0.0,
        F.transform(
            vec_col,
            lambda x: F.floor(
                x.cast("double") / (F.col("_amax") / 127.0) + 0.5
            ).cast("int"),
        ),
    ).otherwise(F.transform(vec_col, lambda x: F.lit(0)))
    return d.withColumn("qvec", q).drop("_amax")


def dequantize_int8(
    df: DataFrame, q_col: str = "qvec", scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    return df.withColumn(
        out_col,
        F.transform(q_col, lambda x: (x.cast("double") * F.col(scale_col)).cast("float")),
    )


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit a k-component PCA on an embedding column.

    Distributed part: one ``mapInArrow`` pass emits per-batch partial
    (count, sum, X'X) — d² + d + 1 doubles each — which a tiny driver
    reduce combines into the covariance; the eigendecomposition of the
    d×d matrix is driver-side numpy (d is 64-1024 for real embedding
    stores; the O(d³) step is microseconds and independent of n).
    Component signs are fixed deterministically (largest-|coefficient|
    positive) so results are stable across partitionings.

    Returns {"mean": (d,), "components": (k, d), "explained_variance":
    (k,)} as plain numpy — broadcastable into :func:`pca_project`.
    """
    import pyarrow as pa

    def _partials(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            col = tbl[vec_col].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(col)
            if n == 0:
                continue
            d = len(flat) // n
            X = flat.reshape(n, d)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([n], type=pa.int64()),
                    pa.array([X.sum(axis=0)], type=pa.list_(pa.float64())),
                    pa.array([(X.T @ X).reshape(-1)], type=pa.list_(pa.float64())),
                ],
                names=["n", "s", "xtx"],
            )

    parts = (
        df.select(vec_col)
        .mapInArrow(_partials, schema="n long, s array<double>, xtx array<double>")
        .collect()
    )
    n = sum(r.n for r in parts)
    if n == 0:
        raise ValueError("pca_fit on an empty DataFrame")
    s = np.sum([np.asarray(r.s) for r in parts], axis=0)
    xtx = np.sum([np.asarray(r.xtx) for r in parts], axis=0)
    d = len(s)
    mean = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coeff| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
    }


def _seqfold(vals) -> float:
    """Sequential left fold starting at 0.0 — the exact IEEE-double
    op sequence a SQL ``SUM(x ORDER BY i)`` performs (0.0 + x0 == x0
    bit-for-bit), so driver-side folds replay in any ANSI engine."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def pca_power_fit(
    df: DataFrame, k: int = 4, n_iter: int = 10, vec_col: str = "embedding"
) -> dict:
    """Deterministic top-k subspace (orthogonal/power) iteration PCA.

    The throughput tier is :func:`pca_fit` (mapInArrow float partials +
    driver ``eigh``); this variant makes every arithmetic step
    cross-engine bit-exact, which gives the full distributed
    covariance → fit → project pipeline a value-hash oracle
    (queries/similarity.py::emb_pca_power full-corpus fit and
    ::emb_pca_project sample fit — ``pca_fit``'s eigh is not
    SQL-expressible, so the eigh tier lives outside the registry,
    pinned against this tier in tests/test_embed.py):

    - mean and X'X accumulate through exact DECIMAL(38,6) sums in ONE
      map-side-combinable aggregation (the shuffle carries at most
      d²+d partial rows per task, never the vectors — scale-safe), so
      the covariance matrix is order-independent and identical in any
      engine;
    - the iteration runs driver-side over plain Python floats (IEEE
      doubles) with explicit ascending-index folds, mirroring ordered
      SQL SUMs; fixed quasi-random seeds and a fixed round count keep
      the op sequence engine-independent (no convergence test);
    - classical Gram-Schmidt re-orthonormalises the block each round;
      signs fix to largest-|coefficient|-positive (lowest index wins
      ties).

    With near-isotropic spectra a fixed small round count does not
    converge to the eigenbasis — the value here is that the *machinery*
    (covariance pass, iteration arithmetic, projection fold) is
    hash-verified end-to-end; production fits use :func:`pca_fit`.
    Returns the same model dict shape as :func:`pca_fit`.
    """
    import math

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pca_power_fit on an empty DataFrame")
    d = len(first[0])
    n = df.count()
    vdbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    prods = F.flatten(
        F.transform(vdbl, lambda xi: F.transform(vdbl, lambda xj: xi * xj))
    )
    sums = (
        df.select(F.posexplode(F.concat(vdbl, prods)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum(F.col("val").cast("decimal(38,6)")).cast("double").alias("s"))
        .collect()
    )
    smap = {r["pos"]: r["s"] for r in sums}
    nf = float(n)
    mean = [smap[j] / nf for j in range(d)]
    cov = [
        [smap[d + i * d + j] / nf - mean[i] * mean[j] for j in range(d)]
        for i in range(d)
    ]

    # fixed quasi-random seeds (same formula as emb_project_fixed's basis)
    q = [
        [(((c * 37 + j * 11) % 13) - 6) / 7.0 for j in range(d)]
        for c in range(k)
    ]
    for _ in range(n_iter):
        w = [
            [_seqfold(cov[i][j] * q[c][j] for j in range(d)) for i in range(d)]
            for c in range(k)
        ]
        newq: list[list[float]] = []
        for c in range(k):
            u = list(w[c])
            if c:
                dps = [
                    _seqfold(w[c][j] * newq[p][j] for j in range(d))
                    for p in range(c)
                ]
                adj = [
                    _seqfold(dps[p] * newq[p][j] for p in range(c))
                    for j in range(d)
                ]
                u = [u[j] - adj[j] for j in range(d)]
            nrm = math.sqrt(_seqfold(x * x for x in u))
            newq.append([x / nrm for x in u])
        q = newq

    comps = []
    for c in range(k):
        jmax = max(range(d), key=lambda j: (abs(q[c][j]), -j))
        s = -1.0 if q[c][jmax] < 0 else 1.0
        comps.append([x * s for x in q[c]])
    return {"mean": np.array(mean), "components": np.array(comps)}


def _kmeans_dist2(vec_col, centroid: list[float]):
    """Exact decimal-fold squared L2 distance to one centroid.

    The per-element ``(x - m)^2`` is double (bit-identical in any
    engine given identical inputs); the *sum* folds DECIMAL(38,6)
    casts, so it is order-independent and equals a SQL
    ``SUM(CAST(.. AS DECIMAL(38,6)))`` over exploded positions —
    which is what keeps the DuckDB oracle hash-identical."""
    carr = F.array(*[F.lit(float(m)) for m in centroid])
    diffsq = F.zip_with(
        vec_col, carr, lambda x, m: (x.cast("double") - m) * (x.cast("double") - m)
    )
    return F.aggregate(
        diffsq,
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, v: acc + v.cast("decimal(38,6)"),
    ).cast("double")


def kmeans_assign_cols(vec_col: str, centroids: list[list[float]]):
    """(cent_id, dist2) Column pair for a fixed centroid list.

    Centroids ship as plan literals (k×d doubles), so assignment is a
    pure per-row codegen expression: no join, no shuffle, no UDF — at
    100 TB this is the shape you want (the scan stays embarrassingly
    parallel; only the tiny update aggregate shuffles). Ties break to
    the lowest cent_id (``array_position`` returns the first match).
    """
    dists = F.array(*[_kmeans_dist2(vec_col, c) for c in centroids])
    best = F.array_min(dists)
    cent = (F.array_position(dists, best) - 1).cast("int")
    return cent, best


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = True,
    kernel: bool = False,
) -> list[list[float]]:
    """Distributed Lloyd's k-means for IVF centroid training.

    Deterministic end to end (the registry entry ``emb_kmeans_assign``
    replays it as pure SQL in DuckDB):

    - seeding: the ``k`` rows with smallest ``(md5(id), id)`` — a
      content-independent pseudo-random draw both engines agree on;
    - assignment: squared-L2 argmin via :func:`kmeans_assign_cols`
      (decimal-fold distances, lowest-id tiebreak), shuffle-free;
    - update: per-(centroid, position) mean via posexplode +
      order-independent decimal sums (``davg``). Map-side partial
      aggregation collapses the exploded rows before the shuffle, so
      the exchange moves only k×d rows per partition regardless of n.
      Empty clusters keep their previous centroid.

    Driver state is k×d doubles per iteration — the same "small model,
    big scan" tiering as :func:`pca_fit`. Returns the final centroids
    as plain Python lists (usable as literals in downstream plans).
    """
    from marex_spark.functions.decimals import davg

    if k <= 0 or n_iter < 0:
        raise ValueError("kmeans_fit needs k > 0 and n_iter >= 0")
    seed_rows = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kmeans_fit on an empty DataFrame")
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(n_iter):
        if exact and kernel:
            # full-Arrow iteration (assignment AND update sums in one
            # numpy pass — a k-means is a 1-subspace PQ): bit-identical
            # to the expression iteration, pinned in tests/test_embed.py
            cents = _pq_fit_kernel_iter(
                df, [cents], 1, k, len(cents[0]), vec_col
            )[0]
            continue
        if not exact:
            # BLAS throughput mode (no oracle determinism contract):
            # ONE fused Arrow pass — matmul-argmin assignment AND the
            # per-centroid float sums in the same batch loop (the same
            # shape as _pq_fit_kernel_iter). The old form re-crossed the
            # Python boundary for assignment only, then posexploded the
            # vectors into n·d JVM rows for an avg aggregate — at 1M×64
            # that 64M-row explode+agg was 14.6 s/iteration vs ~2 s for
            # the fused pass (tools/profile_semdedup.py, r10; guide
            # §2.3 "aggregate before you shuffle", §4.2).
            cents = _kmeans_fit_blas_iter(df, cents, vec_col)
            continue
        if k * len(cents[0]) > _ASSIGN_LITERAL_BUDGET:
            # large-k tier: assignment via the Arrow kernel (value-
            # identical), update aggregate unchanged
            assigned = kmeans_assign_kernel(
                df.select(vec_col), cents, vec_col=vec_col
            ).select("cent_id", F.posexplode(vec_col).alias("pos", "x"))
            mean_agg = davg(F.col("x").cast("double")).alias("m")
        else:
            cent_col, _ = kmeans_assign_cols(vec_col, cents)
            assigned = df.select(
                cent_col.alias("cent_id"), F.posexplode(vec_col).alias("pos", "x")
            )
            mean_agg = davg(F.col("x").cast("double")).alias("m")
        upd = (
            assigned.groupBy("cent_id", "pos")
            .agg(mean_agg)
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cent.setdefault(r.cent_id, {})[r.pos] = float(r.m)
        cents = [
            [by_cent[ci][p] for p in range(len(cents[ci]))]
            if ci in by_cent
            else cents[ci]  # empty cluster: keep previous centroid
            for ci in range(len(cents))
        ]
    return cents


def pq_fit(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    kernel: bool = False,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: one k-codeword Lloyd's codebook
    per contiguous d/m-dim subspace. Output is EXACTLY
    ``[kmeans_fit(slice_j) for j in range(m)]`` (pinned in
    tests/test_embed.py) — same md5-seeding (seed rows depend only on
    ids, so all subspaces share them), same assignment expression,
    same decimal update means — but all m codebooks train in ONE job
    per iteration: the m subspace assignments posexplode into a single
    unioned aggregate keyed (subspace, centroid, position), so the
    driver pays 1 + n_iter collects total instead of m·(1 + n_iter)
    (measured 4x wall at m=4 — each collect's whole-stage codegen of
    the literal-centroid fold dominates at bench scale).

    ``kernel=True`` runs each iteration as ONE ``mapInArrow`` pass
    (the throughput tier, same tiering as :func:`pq_score_kernel`):
    numpy computes the exact micro-unit subspace assignments and
    per-(subspace, centroid, position) integer partial sums per batch,
    and the driver finishes the decimal-exact means — value-identical
    to the expression path (same ``floor(|x|·1e6+0.5)·sign`` HALF_UP
    decimal emulation, order-independent integer sums, one double
    conversion then one double division; pinned in
    tests/test_embed.py::TestPQKernel::test_pq_fit_kernel_equals_expression).
    The interpreted zip_with/aggregate folds the expression path pays
    were ~90% of the ann_pq_adc_fast bench row."""
    from functools import reduce

    from marex_spark.functions.decimals import davg

    if m <= 0 or k <= 0 or n_iter < 0:
        raise ValueError("pq_fit needs m > 0, k > 0 and n_iter >= 0")
    seed_rows = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError("pq_fit on an empty DataFrame")
    d = len(seed_rows[0][vec_col])
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m}")
    sd = d // m
    books = [
        [[float(x) for x in r[vec_col]][j * sd : (j + 1) * sd] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(n_iter):
        if kernel:
            books = _pq_fit_kernel_iter(df, books, m, k, sd, vec_col)
            continue
        parts = []
        for j in range(m):
            sl = F.slice(vec_col, j * sd + 1, sd)
            code, _ = kmeans_assign_cols(sl, books[j])
            parts.append(
                df.select(
                    F.lit(j).alias("sub"),
                    code.alias("cent_id"),
                    F.posexplode(sl).alias("pos", "x"),
                )
            )
        upd = (
            reduce(DataFrame.unionByName, parts)
            .groupBy("sub", "cent_id", "pos")
            .agg(davg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by: dict[tuple[int, int], dict[int, float]] = {}
        for r in upd:
            by.setdefault((r.sub, r.cent_id), {})[r.pos] = float(r.m)
        books = [
            [
                [by[(j, c)][p] for p in range(sd)]
                if (j, c) in by
                else books[j][c]  # empty cluster: keep previous centroid
                for c in range(k)
            ]
            for j in range(m)
        ]
    return books


def _kmeans_fit_blas_iter(
    df: DataFrame,
    cents_in: list[list[float]],
    vec_col: str,
) -> list[list[float]]:
    """One Lloyd iteration of :func:`kmeans_fit`'s BLAS mode as a single
    fused Arrow pass: matmul-argmin assignment (identical math to
    :func:`kmeans_assign_kernel` ``exact=False`` — ``|x|² − 2X·Cᵀ +
    |C|²``, first argmin wins ties) and the per-centroid float64 sums
    accumulate in the SAME batch loop; each task emits one (k × d)
    partial-sum grid + counts, so the JVM never sees exploded vector
    components. Empty clusters keep their previous centroid (same rule
    as the expression-tier update). No oracle determinism contract on
    this mode (float sum order differs from the old Spark avg by last-
    ulp rounding only)."""
    import pyarrow as pa

    C = np.asarray(cents_in, dtype=np.float64)  # (k, d)
    k, d = C.shape

    def _run(batches):
        import pyarrow.compute as pc

        c2 = (C * C).sum(axis=1)
        sums = np.zeros((k, d), dtype=np.float64)
        cnts = np.zeros(k, dtype=np.int64)
        seen = False
        for batch in batches:
            if batch.num_rows == 0:
                continue
            seen = True
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            col = tbl[vec_col].chunk(0)
            flat = pc.list_flatten(col).to_numpy().astype(np.float64)
            X = flat.reshape(batch.num_rows, -1)
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2
            code = d2.argmin(axis=1)  # first min wins ties
            np.add.at(sums, code, X)
            cnts += np.bincount(code, minlength=k)
        if not seen:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.arange(k, dtype=np.int32)),
                pa.array(sums.tolist(), type=pa.list_(pa.float64())),
                pa.array(cnts),
            ],
            names=["cent_id", "s", "n"],
        )

    rows = df.select(vec_col).mapInArrow(
        _run, schema="cent_id int, s array<double>, n long"
    ).collect()
    tot_s = np.zeros((k, d), dtype=np.float64)
    tot_n = np.zeros(k, dtype=np.int64)
    for r in rows:
        tot_s[r.cent_id] += np.asarray(r.s, dtype=np.float64)
        tot_n[r.cent_id] += r.n
    return [
        (tot_s[c] / tot_n[c]).tolist() if tot_n[c] else cents_in[c]
        for c in range(k)
    ]


def _pq_fit_kernel_iter(
    df: DataFrame,
    books: list[list[list[float]]],
    m: int,
    k: int,
    sd: int,
    vec_col: str,
) -> list[list[list[float]]]:
    """One Lloyd iteration of :func:`pq_fit` as a single Arrow pass.

    Each batch emits the m·k·sd grid of exact integer micro-unit
    partial sums + assignment counts; summing int64 micro-units is the
    DECIMAL(38,6) sum (order-independent), so the driver-side finish
    ``float(total)/1e6/count`` reproduces davg's
    ``CAST(decimal-sum AS DOUBLE)/COUNT`` bit for bit (int→double is
    exact below 2^53 and both engines do the same two IEEE ops)."""
    import pyarrow as pa

    cents = np.asarray(books, dtype=np.float64)  # (m, k, sd)

    def _run(batches):
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            col = tbl[vec_col].chunk(0)
            flat = pc.list_flatten(col).to_numpy().astype(np.float64)
            X = flat.reshape(batch.num_rows, -1)
            sums = np.zeros((m, k, sd), dtype=np.int64)
            cnts = np.zeros((m, k), dtype=np.int64)
            for j in range(m):
                sub = X[:, j * sd : (j + 1) * sd]
                d2 = (
                    np.floor(
                        (sub[:, None, :] - cents[j][None, :, :]) ** 2 * 1e6
                        + 0.5
                    )
                    .astype(np.int64)
                    .sum(axis=2)
                )  # (n, k) exact micro-units, same as the decimal folds
                code = np.argmin(d2, axis=1)  # first min = lowest cent_id
                # x cast to decimal(38,6): HALF_UP = away-from-zero
                xm = (
                    np.floor(np.abs(sub) * 1e6 + 0.5) * np.sign(sub)
                ).astype(np.int64)
                np.add.at(sums[j], code, xm)
                cnts[j] += np.bincount(code, minlength=k)
            subs, cs = np.meshgrid(np.arange(m), np.arange(k), indexing="ij")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(subs.ravel().astype(np.int32)),
                    pa.array(cs.ravel().astype(np.int32)),
                    pa.array(
                        sums.reshape(m * k, sd).tolist(),
                        type=pa.list_(pa.int64()),
                    ),
                    pa.array(cnts.ravel()),
                ],
                names=["sub", "cent_id", "s", "n"],
            )

    rows = df.select(vec_col).mapInArrow(
        _run, schema="sub int, cent_id int, s array<long>, n long"
    ).collect()
    tot_s = np.zeros((m, k, sd), dtype=np.int64)
    tot_n = np.zeros((m, k), dtype=np.int64)
    for r in rows:
        tot_s[r.sub, r.cent_id] += np.asarray(r.s, dtype=np.int64)
        tot_n[r.sub, r.cent_id] += r.n
    return [
        [
            [
                float(tot_s[j, c, p]) / 1e6 / float(tot_n[j, c])
                for p in range(sd)
            ]
            if tot_n[j, c]
            else books[j][c]  # empty cluster: keep previous centroid
            for c in range(k)
        ]
        for j in range(m)
    ]


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cent_col: str = "cent_id",
    dist_col: str = "dist2",
    kernel: bool | None = None,
) -> DataFrame:
    """Attach (cent_id, dist2) for a fitted centroid list — the IVF
    bucketing step: partition/bucket the corpus by ``cent_id`` and ANN
    probes read only their bucket. ``kernel=None`` auto-selects the
    Arrow tier when k×d exceeds ``_ASSIGN_LITERAL_BUDGET`` (literal
    plans and codegen stop scaling past ~10^3 centroids); both tiers
    are value-identical (equality-pinned)."""
    if kernel is None:
        kernel = (
            len(centroids) * (len(centroids[0]) if centroids else 0)
            > _ASSIGN_LITERAL_BUDGET
        )
    if kernel:
        return kmeans_assign_kernel(
            df, centroids, vec_col=vec_col, cent_col=cent_col, dist_col=dist_col
        )
    cent, dist = kmeans_assign_cols(vec_col, centroids)
    return df.withColumn(cent_col, cent).withColumn(dist_col, dist)


def pca_project(
    df: DataFrame, model: dict, vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project vectors onto the fitted components — JVM-side: each
    output coordinate is one ``aggregate(zip_with(vec - mean, comp))``
    over literal arrays, so the hot path never leaves codegen and the
    model ships as plan literals (no UDF, no broadcast variable)."""
    mean = [float(v) for v in model["mean"]]
    comps = model["components"]
    cols = []
    for i in range(comps.shape[0]):
        comp = F.array(*[F.lit(float(c)) for c in comps[i]])
        mean_arr = F.array(*[F.lit(m) for m in mean])
        centered = F.zip_with(vec_col, mean_arr, lambda x, m: x.cast("double") - m)
        dot = F.aggregate(
            F.zip_with(centered, comp, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(dot.alias(f"_p{i}"))
    return df.select("*", F.array(*cols).alias(out_col))


def pq_score_kernel(
    df: DataFrame,
    books: list[list[list[float]]],
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Vectorized PQ encode + ADC scoring (the throughput tier of
    queries/similarity.ann_pq_adc, same tiering as detect's packed
    kernel vs its relational oracle form).

    The SQL-expression form evaluates its literal-centroid folds
    through Catalyst's interpreted higher-order functions (zip_with /
    aggregate block whole-stage codegen), which caps per-row speed; at
    corpus scale the right shape is one numpy pass per Arrow batch:
    stack the batch to (n, d), per subspace compute the (n, k)
    distance matrix in three BLAS-ish ops, argmin (ties to the lowest
    codeword, same as array_position), LUT-gather the ADC estimate.

    Bit-parity with the decimal-fold expression path: every squared
    difference quantizes to 6 decimals exactly like the engines'
    CAST(.. AS DECIMAL(38,6)) (floor(x·1e6 + 0.5)/1e6 on nonneg terms)
    before summing, and the final ADC adds the m LUT doubles in
    subspace order — pinned value-identical in
    tests/test_embed.py::TestPQKernel on random data.
    """
    import pyarrow as pa

    m = len(books)
    sd = len(books[0][0])
    k = len(books[0])
    cents = np.asarray(books, dtype=np.float64)  # (m, k, sd)
    q = np.asarray(query, dtype=np.float64)

    def _q6i(x: np.ndarray) -> np.ndarray:
        # decimal(38,6) cast emulation for nonnegative terms, in exact
        # integer micro-units — summing these is the decimal sum
        return np.floor(x * 1e6 + 0.5).astype(np.int64)

    # LUT under the same exact-decimal sum the expression path uses:
    # integer micro-unit accumulation, ONE double conversion at the end
    # (mirrors decimal(38,6) -> double)
    lut = np.empty((m, k))
    for j in range(m):
        diff = q[j * sd : (j + 1) * sd][None, :] - cents[j]  # (k, sd)
        lut[j] = _q6i(diff * diff).sum(axis=1) / 1e6

    def _run(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            ids = tbl[id_col].to_numpy()
            col = tbl[vec_col].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(ids)
            if n == 0:
                continue
            X = flat.reshape(n, -1)
            codes = np.empty((m, n), dtype=np.int64)
            adc = np.zeros(n)
            for j in range(m):
                sub = X[:, j * sd : (j + 1) * sd]
                d2 = _q6i(
                    (sub[:, None, :] - cents[j][None, :, :]) ** 2
                ).sum(axis=2)  # (n, k) exact micro-units
                codes[j] = np.argmin(d2, axis=1)  # first min = lowest id
                adc = adc + lut[j][codes[j]]  # subspace order, IEEE
            arrays = [pa.array(ids), pa.array(adc)]
            names = [id_col, "adc"]
            for j in range(m):
                arrays.append(pa.array(codes[j].astype(np.int32)))
                names.append(f"code{j}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    codes_schema = ", ".join(f"code{j} int" for j in range(m))
    return df.select(id_col, vec_col).mapInArrow(
        _run, schema=f"{id_col} long, adc double, {codes_schema}"
    )


def srp_planes(d: int, bits: int = 64, tag: str = "srp") -> np.ndarray:
    """Deterministic md5-derived hyperplanes — the identical formula
    the SQL oracle and DataFrame tier evaluate per cell
    (((md5-int15 % 2001) - 1000)/1000), so every tier indexes with the
    same geometry. bits × d doubles; built once per worker."""
    import hashlib

    W = np.empty((bits, d))
    for j in range(bits):
        for i in range(d):
            h = int(
                hashlib.md5(f"{tag}:{j}:{i}".encode()).hexdigest()[:15], 16
            )
            W[j, i] = (h % 2001 - 1000) / 1000.0
    return W


def srp_fingerprints_fast(
    df: DataFrame,
    bits: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fp_name: str = "srp",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Throughput tier of the SRP fingerprint (queries/similarity.py
    ann_srp_topk computes the same bits via decimal-sum expressions for
    oracle parity): ONE numpy matmul per Arrow batch — (n, d) @ (d,
    bits) then sign-pack into int64. This is the tier that indexes a
    1M+ vector corpus (bench row ann_srp_1m_vectors).

    Parity note: bit j is sign(dot); float64 matmul and the exact
    decimal sum can only disagree when |dot| sits inside float
    rounding error (~1e-13·d) of zero — pinned bit-identical on the
    test fixtures, and any real corpus hits that knife edge with
    probability ~0.

    ``keep_cols`` passes extra columns through the Arrow batches
    unchanged (e.g. the vector itself for a downstream exact rerank,
    or a label) — the map stays a single stateless projection, which
    is what makes it usable on a STREAM (streaming/embed.py
    srp_probe_stream)."""
    import pyarrow as pa

    keeps = [
        c for c in (keep_cols or []) if c not in (id_col, fp_name)
    ]
    state: dict = {}

    def _run(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            ids = tbl[id_col].to_numpy()
            col = tbl[vec_col].combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(ids)
            if n == 0:
                continue
            X = flat.reshape(n, -1)
            W = state.get("W")
            if W is None or W.shape[1] != X.shape[1]:
                W = state["W"] = srp_planes(X.shape[1], bits)
            B = (X @ W.T) >= 0  # (n, bits)
            fp = np.zeros(n, dtype=np.uint64)
            for j in range(bits):
                fp |= B[:, j].astype(np.uint64) << np.uint64(j)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(fp.view(np.int64))]
                + [tbl[c].combine_chunks() for c in keeps],
                names=[id_col, fp_name, *keeps],
            )

    sel = [id_col, vec_col] + [c for c in keeps if c != vec_col]
    keep_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keeps
    )
    return df.select(*sel).mapInArrow(
        _run, schema=f"{id_col} long, {fp_name} long{keep_schema}"
    )


def semdedup(
    df: DataFrame,
    tau: float = 0.95,
    k: int | None = None,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_cluster_size: int = 4096,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) as one blocked-pair plan.

    k-means over the corpus (:func:`kmeans_fit`), exact pairwise
    cosine WITHIN each learned cluster only, then a one-pass keep
    rule: a vector is dropped when some tau-neighbour in its cluster
    ranks earlier in (dist2-to-centroid DESC, id ASC) priority — the
    kept representative of each near-duplicate neighbourhood is the
    one FARTHEST from its centroid (the paper's low-centroid-
    similarity preference), deterministic tie-break by id. One pass,
    not the iterative greedy variant — droppers may themselves be
    dropped. Returns ``(id_col, cent_id bigint, keep boolean)``.

    Scale shape (the r6 verdict's scale-killer, fixed): pair
    generation is O(n * cluster_size) via the cluster block key —
    ``k=None`` derives ``k = ceil(n / target_cluster_size)`` so the
    per-cluster pair cost stays bounded as the corpus grows (the
    paper runs k≈50k on LAION-440M for the same reason). Assumes
    fixed-dimension dense vectors: the pair join on component index
    then covers EVERY component, so the per-pair decimal sums ARE the
    exact vector norms and the centroid distance rides the pair rows
    — the keep rule therefore needs NO join against the corpus-sized
    assignment or norm tables, and nothing is force-broadcast. The
    only corpus-scale operations are hash-partitioned equi-joins plus
    one small left anti-style join against the (dup-bounded) dropped
    set, which AQE may broadcast when it is actually small.

    Tier bound: closed — :func:`kmeans_assign` auto-selects the
    Arrow kernel tier (:func:`kmeans_assign_kernel`, value-identical)
    when k×d exceeds the literal budget, so derived k from a true
    10^9-vector corpus assigns at kernel speed.
    """
    from marex_spark.functions.decimals import dsum

    if n_iter < 0:
        raise ValueError("semdedup needs n_iter >= 0")
    if k is None:
        n = df.count()
        k = max(8, -(-n // max(1, target_cluster_size)))
    cents = kmeans_fit(df, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col)
    asg = kmeans_assign(df, cents, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"), "cent_id", "dist2"
    )
    e = (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(vec_col).alias("idx", "comp"),
        )
        .withColumn("comp", F.col("comp").cast("double"))
        .join(asg, "vec_id")
    )
    x, y = e.alias("x"), e.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.idx") == F.col("y.idx"))
            & (F.col("x.cent_id") == F.col("y.cent_id"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .groupBy(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
        .agg(
            dsum(F.col("x.comp") * F.col("y.comp"), "dot"),
            dsum(F.col("x.comp") * F.col("x.comp"), "na2"),
            dsum(F.col("y.comp") * F.col("y.comp"), "nb2"),
            F.min(F.col("x.dist2")).alias("da"),
            F.min(F.col("y.dist2")).alias("db"),
        )
    )
    # Per pair (a<b) exactly one side drops: b when da >= db (ties keep
    # the lower id's priority, u<v), else a — the same set the sym-union
    # form produces, without materialising it.
    dropped = (
        pairs.filter(
            F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
            >= F.lit(float(tau))
        )
        .select(
            F.when(F.col("da") >= F.col("db"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("vec_id")
        )
        .distinct()
    )
    return (
        asg.join(dropped.withColumn("_d", F.lit(True)), "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            F.col("cent_id").cast("long").alias("cent_id"),
            F.col("_d").isNull().alias("keep"),
        )
    )


def semdedup_kernel(
    df: DataFrame,
    tau: float = 0.95,
    k: int | None = None,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_cluster_size: int = 4096,
    pair_block_elems: int = 1 << 20,
    exact: bool = True,
) -> DataFrame:
    """Throughput tier of :func:`semdedup` (same tiering as
    ``ann_pq_adc_fast`` vs ``ann_pq_adc``): one ``applyInPandas`` per
    learned cluster computes the within-cluster pairwise cosines in
    numpy instead of a component-exploded self-join — the exploded
    form shuffles n·d rows and evaluates interpreted decimal folds,
    the kernel moves each cluster's vectors ONCE and runs BLAS-shaped
    batched products.

    ``exact=False`` is the production mode for corpora where the
    oracle-replay determinism contract doesn't apply: float64 BLAS
    matmuls end to end (matmul-argmin assignment, normalised X·Xᵀ
    cosine blocks) — same keep rule, decisions identical except on
    razor-edge τ ties. The 1M-vector bench row runs this mode.

    Value-identical to :func:`semdedup` (and therefore to its DuckDB
    oracle) by integer micro-unit decimal emulation: every pairwise
    product rounds to int64 micro-units with Spark's HALF_UP
    (``sign·floor(|v|·1e6 + 0.5)`` — away from zero, covering negative
    components, where the PQ kernel's nonneg distances needed plain
    floor), sums exactly in int64, and converts to double once — the
    same value chain as ``SUM(CAST(x*y AS DECIMAL(38,6)))::DOUBLE``.
    Pair blocks are tiled to ``pair_block_elems`` floats so a
    4096-vector cluster never materialises an n²·d cube. The default
    (2^20 elements ≈ 8 MB of dots per block) keeps each block
    cache-resident for the keep-rule scan that immediately consumes
    it: the old 2^24 default produced 128 MB blocks that round-tripped
    DRAM between the matmul and the scan — measured 2× slower at 1M
    vectors (8.2 vs 4.3 s kernel min, decisions identical; a fully
    vectorised keep rule over n² masks was 4× slower again for the
    same reason). r10: the keep-rule scan is vectorised PER BLOCK
    (masks the same size as the dots block, so still cache-resident) —
    decisions identical, removes the per-row Python loop
    (tools/ab_semdedup_inner.py v1s; the full-mask form stays
    refuted).

    Scale shape: one shuffle by ``cent_id`` (bounded groups by
    construction — ``k`` derives from the corpus count), no pair
    explosion leaves the kernel, output is one row per vector."""
    import numpy as np
    import pandas as pd

    if k is None:
        n = df.count()
        k = max(8, -(-n // max(1, target_cluster_size)))
    cents = kmeans_fit(
        df, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col, exact=exact
    )
    if exact:
        asg = kmeans_assign(df, cents, vec_col=vec_col)
    else:
        asg = kmeans_assign_kernel(df, cents, vec_col=vec_col, exact=False)
    asg = asg.select(F.col(id_col).alias("vec_id"), vec_col, "cent_id", "dist2")
    tau_f = float(tau)

    def _micro(v: "np.ndarray") -> "np.ndarray":
        # Spark CAST(double AS DECIMAL(38,6)): HALF_UP, away from zero
        return (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)

    def _run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()[order]]
        )
        d2 = pdf["dist2"].to_numpy()[order]
        n_c = len(ids)
        keep = np.ones(n_c, dtype=bool)
        if n_c > 1:
            if exact:
                na2 = _micro(X * X).sum(axis=1)  # exact per-vector norms
                nrm = np.sqrt(na2.astype(np.float64) / 1e6)
            else:
                nrm = np.sqrt((X * X).sum(axis=1))
            dropped = np.zeros(n_c, dtype=bool)
            d = X.shape[1]
            if exact:
                rows_per_block = max(1, pair_block_elems // max(1, n_c * d))
            else:
                # BLAS blocks: (rows × d) @ (d × n_c), no n²·d cube
                rows_per_block = max(1, pair_block_elems // max(1, n_c))
            cols = np.arange(n_c)
            for a0 in range(0, n_c - 1, rows_per_block):
                a1 = min(a0 + rows_per_block, n_c - 1)
                # products for pairs (a, b) with a in [a0,a1), b > a —
                # columns start at a0 (triangle blocking: pairs with
                # b < a0 are never consumed, so the flops halve)
                if exact:
                    prod = _micro(
                        X[a0:a1, None, :] * X[None, a0:, :]
                    ).sum(axis=2)
                    dots = prod.astype(np.float64) / 1e6
                else:
                    dots = X[a0:a1] @ X[a0:].T
                sub = cols[a0:]
                # vectorised keep-rule scan over the (cache-sized)
                # block — the rule is order-independent (droppers may
                # themselves be dropped; one pass, not iterative), so
                # the per-pair drops union freely. The old per-row
                # Python loop paid n_c interpreter iterations per
                # cluster (~1M total at the 1M-vector row); the block
                # masks are the same size as `dots`, so cache
                # residency is unchanged. A/B: decisions identical,
                # min 4.36 → 3.26 s and flatter under ambient
                # pressure (8.4 → 4.3 s worst pass;
                # tools/ab_semdedup_inner.py v0s vs v1s, r10). The
                # FULL-mask form stays refuted (41-115 s at 2^24).
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (nrm[a0:a1, None] * nrm[sub][None, :])
                # Spark/DuckDB order NaN above every value, so a 0/0
                # cosine (zero-norm vector) satisfies >= tau in the
                # SQL tiers — replicate, don't diverge
                dup = (cos >= tau_f) | np.isnan(cos)
                dup &= sub[None, :] > cols[a0:a1][:, None]
                if dup.any():
                    # keep rule, per pair (a<b): drop b when da >= db
                    # (ties keep the lower id's priority), else drop a
                    drop_b = dup & (d2[a0:a1, None] >= d2[sub][None, :])
                    dropped[a0:] |= drop_b.any(axis=0)
                    dropped[a0:a1] |= (dup & ~drop_b).any(axis=1)
            keep = ~dropped
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cent_id": pdf["cent_id"].to_numpy()[order].astype("int64"),
                "keep": keep,
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"vec_id {id_type}, cent_id long, keep boolean"
    out = asg.groupBy("cent_id").applyInPandas(_run, schema=out_schema)
    if id_col != "vec_id":
        out = out.withColumnRenamed("vec_id", id_col)
    return out


# Literal-centroid assignment embeds k×d doubles in the plan and k
# decimal folds in codegen — fine to ~10^3 centroids, pathological
# past it (plan bloat + Janino limits). Above this element budget,
# assignment moves to the Arrow kernel tier automatically.
_ASSIGN_LITERAL_BUDGET = 32768  # k*d


def kmeans_assign_kernel(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cent_col: str = "cent_id",
    dist_col: str = "dist2",
    exact: bool = True,
) -> DataFrame:
    """Arrow-kernel tier of :func:`kmeans_assign` for large centroid
    counts (true SemDeDup k≈50k, IVF nlist≈√n): centroids ride the
    task closure once, each batch computes all k exact micro-unit
    distances vectorised and takes the first argmin — value-identical
    to the literal-expression tier (same ``floor(d²·1e6+0.5)`` int64
    sums as the decimal folds, same lowest-index tie-break), pinned in
    tests/test_embed.py. All input columns pass through.

    ``exact=False`` is the BLAS throughput mode: one float64 matmul
    argmin (``|x|² − 2x·C + |C|²``) per batch — O(nkd) fused flops
    instead of a python loop over k with per-element rounding; assign-
    ments agree with the exact tier except on razor-edge ties (same
    contract as the reference's own float kernels)."""
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    C = np.asarray(centroids, dtype=np.float64)

    def _run(batches) -> Iterator:
        import pyarrow.compute as pc

        c2 = (C * C).sum(axis=1)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            col = tbl[vec_col].chunk(0)
            flat = pc.list_flatten(col).to_numpy().astype(np.float64)
            X = flat.reshape(batch.num_rows, -1)
            if exact:
                best = np.full(X.shape[0], np.iinfo(np.int64).max, np.int64)
                arg = np.zeros(X.shape[0], np.int32)
                for j in range(C.shape[0]):
                    diff = X - C[j]
                    # exact micro-unit decimal sum (diffs² are nonneg)
                    micro = (
                        np.floor(diff * diff * 1e6 + 0.5)
                        .astype(np.int64)
                        .sum(axis=1)
                    )
                    upd = micro < best  # strict: first argmin wins ties
                    best = np.where(upd, micro, best)
                    arg = np.where(upd, j, arg)
                dists = best.astype(np.float64) / 1e6
            else:
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2
                arg = d2.argmin(axis=1).astype(np.int32)  # first min wins
                dists = np.maximum(d2[np.arange(len(arg)), arg], 0.0)
            arrays = [tbl.column(i).chunk(0) for i in range(tbl.num_columns)]
            arrays += [pa.array(arg, pa.int32()), pa.array(dists)]
            yield pa.RecordBatch.from_arrays(
                arrays, names=list(tbl.column_names) + [cent_col, dist_col]
            )

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInArrow(
        _run, schema=f"{in_schema}, {cent_col} int, {dist_col} double"
    )
