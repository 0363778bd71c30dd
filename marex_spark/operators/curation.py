"""Corpus-curation operators — parameterised tier.

``domain_top_n`` is the per-domain document cap every crawl-curation
pipeline runs (FineWeb/RefinedWeb: at most N docs per registered
domain, preferring the higher-quality ones). The registered query
``pipe_domain_cap`` (queries/text.py) pins its constants.

Scale shape — measured, not assumed: the textbook treatment calls a
single ``ROW_NUMBER() OVER (PARTITION BY domain)`` a skew trap (the
hottest domain sorts on one task) and prescribes salted two-phase
top-N. On Spark ≥3.5 that prescription is WRONG: because the rank
filter sits directly on the row_number output, Catalyst's
InferWindowGroupLimit rule inserts ``WindowGroupLimit(Partial)``
BEFORE the shuffle — every input task forwards at most n rows per
domain, so the exchange carries O(domains · n · input_tasks) rows and
the hot domain's reducer sees n·input_tasks rows, not its full row
set. Measured at 5M docs with a 90%-hot domain (SCALE.md §Round 7):
single window 0.67 s vs hand-rolled salted two-phase 5.69 s — the
salting pays a full extra corpus shuffle to re-implement what the
optimizer already does. The plan pin (tests/test_plans.py) asserts
the Partial group limit stays below the exchange so a regression (or
an operator rewrite that breaks the filter-on-rank pattern the rule
needs) fails loudly.

``domain_top_n_salted`` keeps the two-phase form as the comparison
arm and as the documented fallback for engines without the rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def domain_top_n(
    df: DataFrame,
    domain_col: str,
    order_by: list[Column],
    n: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Keep the top ``n`` rows per ``domain_col`` under ``order_by``
    (which must be a deterministic total order — include a unique
    tiebreak column), ranked 1..n in ``rank_name``.

    The ``filter(row_number() <= n)`` shape is load-bearing: it is the
    exact pattern Catalyst's InferWindowGroupLimit rewrites into a
    map-side partial top-n, which is what makes this skew-proof (see
    module docstring). Do not split the filter from the window."""
    if rank_name in df.columns:
        raise ValueError(
            f"rank_name {rank_name!r} already exists in the input; "
            "pass a different rank_name instead of silently overwriting"
        )
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    return df.withColumn(
        rank_name, F.row_number().over(w).cast("int")
    ).filter(F.col(rank_name) <= n)


def domain_top_n_salted(
    df: DataFrame,
    domain_col: str,
    order_by: list[Column],
    n: int,
    salt_col: Column | None = None,
    n_salts: int = 8,
    rank_name: str = "rank",
) -> DataFrame:
    """Salted two-phase top-N — the classic hand-rolled skew guard:
    phase 1 ranks within ``(domain, salt)`` and keeps ≤n per salt (any
    row in a domain's global top-n is in its salt bucket's top-n, so
    no candidate is lost), phase 2 re-ranks the ≤ n·n_salts survivors
    per domain. Value-identical to :func:`domain_top_n` by
    construction (equality-tested); measurably SLOWER on Spark ≥3.5
    because the group-limit rule already prunes map-side and the
    salting adds a full corpus shuffle. Kept for engines without the
    rule and as the rehearsal comparison arm."""
    if salt_col is None:
        # stable within a job and uniform enough to split a hot domain;
        # never changes WHICH rows win (phase 2 re-ranks per domain).
        salt_col = F.pmod(F.spark_partition_id(), F.lit(n_salts))
    # collision-free temp names: never clobber caller columns
    salt_name, r1_name = "__salt", "__r1"
    while salt_name in df.columns:
        salt_name += "_"
    while r1_name in df.columns:
        r1_name += "_"
    salted = df.withColumn(salt_name, salt_col.cast("int"))
    w1 = Window.partitionBy(domain_col, salt_name).orderBy(*order_by)
    cand = (
        salted.withColumn(r1_name, F.row_number().over(w1))
        .filter(F.col(r1_name) <= n)
        .drop(salt_name, r1_name)
    )
    return domain_top_n(cand, domain_col, order_by, n, rank_name=rank_name)
