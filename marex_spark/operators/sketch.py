"""Theta-sketch distinct counting — parameterised operator tier.

The registered query ``sketch_theta_distinct`` (queries/dedup.py) pins
this module's constants. The sketch is the fixed-threshold member of
the KMV/theta family (Dasgupta et al., "Theta sketches", 2016): hash
every item to a uniform 60-bit integer (md5's first 15 hex chars),
keep only hashes below ``2^60 / scale``, and estimate the distinct
count as ``survivors · scale`` — unbiased with relative stderr
~ ``sqrt(scale / D)``.

Why this over ``approx_count_distinct``: Spark's HLL++ registers are
engine-private (no other system replays them, so no oracle can verify
the value, and two engines never agree bit-for-bit), while the theta
survivor set is exact arithmetic on md5 — deterministic in ANY engine.
And unlike a plain ``COUNT(DISTINCT x)`` the exchange carries ~1/scale
of the distinct mass: the threshold filter runs map-side.

Mergeability (the 100 TB property): a survivor set is a uniform
hash-sample of the distinct values, so the sketch of a UNION of
corpora is exactly the union of their survivor sets re-deduplicated —
profiles can be maintained incrementally per partition/day/source and
merged without touching raw data. ``theta_survivors`` returns the set;
``theta_estimate`` folds survivor sets (any number, any overlap) into
per-group estimates. Both stay pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_THETA_BITS = 60  # md5's first 15 hex chars

# Reserved column name for the scale tag: collision-resistant so a
# caller DataFrame that legitimately carries a 'scale' column (even as
# a group col) is never misread as a tagged survivor set.
THETA_SCALE_TAG = "__theta_scale"


def theta_threshold(scale: int) -> int:
    """Survivor threshold for a 1/scale keep-rate. ``scale`` must be a
    positive power of two so the threshold divides the hash range
    exactly (keeps the estimate's scale factor integer-exact)."""
    if scale <= 0 or scale & (scale - 1):
        raise ValueError(f"scale must be a positive power of two, got {scale}")
    return (1 << _THETA_BITS) // scale


def theta_hash(item: Column) -> Column:
    """Uniform 60-bit integer from any string expression — the exact
    arithmetic any md5-capable engine replays (conv on 15 hex chars)."""
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")


def theta_survivors(
    df: DataFrame,
    group_cols: list[str],
    item: Column,
    scale: int,
    tag_scale: bool = False,
) -> DataFrame:
    """(group_cols…, h) survivor rows: hash ``item``, keep hashes under
    the threshold MAP-SIDE, then distinct. The exchange carries
    ~1/scale of the distinct mass. Survivor sets are the mergeable
    representation — union any number of them and re-distinct — but
    ONLY across sets built with the SAME ``scale`` (the threshold
    defines the sample; mixing keep-rates silently biases the
    estimate). ``tag_scale=True`` appends the scale as the reserved
    column ``__theta_scale`` (:data:`THETA_SCALE_TAG` — NOT plain
    'scale', which a caller's own schema could carry) so
    :func:`theta_estimate` can reject a mixed-scale merge at run
    time — use it whenever survivor sets are persisted and merged
    later (the per-day/source incremental-profile shape)."""
    if THETA_SCALE_TAG in group_cols:
        raise ValueError(f"{THETA_SCALE_TAG!r} is a reserved column name")
    t = theta_threshold(scale)
    h = theta_hash(item)
    cols = [*group_cols, h.alias("h")]
    if tag_scale:
        cols.append(F.lit(scale).cast("long").alias(THETA_SCALE_TAG))
    return df.select(*cols).filter(F.col("h") < t).distinct()


def theta_estimate(
    survivors: DataFrame,
    group_cols: list[str],
    scale: int,
    n_name: str = "n_sample",
    est_name: str = "est_distinct",
) -> DataFrame:
    """Fold survivor rows (possibly a union of several sketches with
    arbitrary overlap — duplicates collapse in the distinct) into
    ``(group_cols…, n_sample, est_distinct)``.

    REQUIREMENT: every folded set must have been built with this same
    ``scale`` — the estimate is ``survivors · scale``, so a set kept at
    a different rate biases it with no arithmetic signal. Sets tagged
    via ``theta_survivors(tag_scale=True)`` are verified row-by-row
    here (a mismatch raises inside the job; the tag rides the reserved
    ``__theta_scale`` column, so an unrelated 'scale' column in the
    caller's schema — even one listed in ``group_cols`` — passes
    through untouched); untagged sets are the caller's
    responsibility."""
    if THETA_SCALE_TAG in group_cols:
        raise ValueError(f"{THETA_SCALE_TAG!r} is a reserved column name")
    if THETA_SCALE_TAG in survivors.columns:
        ok = F.col(THETA_SCALE_TAG) == F.lit(scale)
        survivors = survivors.filter(
            F.when(ok, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("theta_estimate: survivor set built with scale "),
                        F.col(THETA_SCALE_TAG).cast("string"),
                        F.lit(f", estimate requested at scale {scale}"),
                    )
                )
            )
        ).drop(THETA_SCALE_TAG)
    return (
        survivors.distinct()
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias(n_name),
            (F.count("*") * scale).cast("long").alias(est_name),
        )
    )


def theta_distinct(
    df: DataFrame,
    group_cols: list[str],
    item: Column,
    scale: int,
) -> DataFrame:
    """One-shot convenience: survivors → per-group estimate."""
    return theta_estimate(
        theta_survivors(df, group_cols, item, scale), group_cols, scale
    )


# ---------------------------------------------------------------------------
# MinHash signatures + pairwise overlap — parameterised tier (the
# registered query ``sketch_source_overlap`` pins k=64 over 3-gram
# shingles per source; queries/dedup.py).
# ---------------------------------------------------------------------------

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1, the classic Carter-Wegman modulus


def minhash_params(k: int, p: int = MINHASH_PRIME) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficient lists for k permutations
    ``(s*a + b) % p`` — fixed LCG-derived constants so every engine
    (and the DuckDB oracle) replays the identical signature."""
    a = [(1_103_515_245 * (h + 1) + 12_345) % p for h in range(k)]
    b = [(22_695_477 * h + 1) % p for h in range(k)]
    return a, b


def minhash_signatures(
    df: DataFrame,
    group_cols: list[str],
    item: Column,
    k: int,
    p: int = MINHASH_PRIME,
) -> DataFrame:
    """``(group_cols…, m0..m{k-1})`` — one k-permutation MinHash
    signature per group out of ONE map-side-combined groupBy (the k
    minima as columns; no item distinct needed because ``min`` is
    idempotent over duplicates). At 100 TB each corpus pays a single
    pass; all downstream comparison runs on the groups-sized
    signature table."""
    a, b = minhash_params(k, p)
    s = (theta_hash(item) % p).alias("s")
    base = df.select(*group_cols, s)
    return base.groupBy(*group_cols).agg(
        *[
            F.min((F.col("s") * a[h] + b[h]) % p).alias(f"m{h}")
            for h in range(k)
        ]
    )


def signature_overlap(
    sig: DataFrame,
    group_col: str,
    k: int,
    broadcast_right: bool = True,
) -> DataFrame:
    """Pairwise ``(a, b, n_match, est_jaccard)`` over a signature
    table: est_jaccard = matching-minima fraction (unbiased, stderr
    ~ sqrt(J(1-J)/k)). The join is groups × groups on the SIGNATURE
    table (k ints per group), never on items — broadcast by default
    since group counts (sources, days, shards) are small."""
    a, b = sig.alias("a"), sig.alias("b")
    n_match = None
    for h in range(k):
        t = F.when(F.col(f"a.m{h}") == F.col(f"b.m{h}"), 1).otherwise(0)
        n_match = t if n_match is None else n_match + t
    right = F.broadcast(b) if broadcast_right else b
    est = F.floor(
        (F.col("n_match") / float(k)) * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    return (
        a.join(right, F.col(f"a.{group_col}") < F.col(f"b.{group_col}"))
        .select(
            F.col(f"a.{group_col}").alias(f"{group_col}_a"),
            F.col(f"b.{group_col}").alias(f"{group_col}_b"),
            n_match.cast("long").alias("n_match"),
        )
        .withColumn("est_jaccard", est)
    )
