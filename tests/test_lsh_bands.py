"""The late-r7 one-exchange `_lsh_bands` must be value-identical to
the original two-step form (posexplode → per-(doc,h) min → per-(doc,
band) key assembly) on arbitrary corpora — the refactor changed the
physical shape only. Locks the minima AND the md5 band-key strings."""

from pyspark.sql import functions as F

from marex_spark.queries.dedup import (
    _BAND_ROWS,
    _MH_A,
    _MH_B,
    _MH_P,
    _N_HASH,
    _lsh_bands,
    _shingles,
)


def _old_lsh_bands(docs):
    """Literal pre-refactor shape (kept verbatim for the equality lock)."""
    sh = _shingles(docs, 3)
    si = sh.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % _MH_P
        ).alias("s"),
    )
    perms = F.array(
        *[
            ((F.col("s") * _MH_A[h] + _MH_B[h]) % _MH_P).alias(f"p{h}")
            for h in range(_N_HASH)
        ]
    )
    hashed = (
        si.select("doc_id", F.posexplode(perms).alias("h", "hh"))
        .groupBy("doc_id", "h")
        .agg(F.min("hh").alias("minhash"))
    )
    return hashed.groupBy(
        "doc_id", (F.col("h") / _BAND_ROWS).cast("long").alias("band")
    ).agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "minhash"))).minhash,
                    lambda m: m.cast("string"),
                ),
            )
        ).alias("band_key")
    )


def _corpus(spark, n=240):
    """Deterministic corpus with planted dups, short docs, and a
    sub-shingle-length doc (2 words → zero shingles)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * (7 + j) + j * j, F.lit(50)),
                )
                for j in range(12)
            ],
        ).alias("text"),
    )
    dup = base.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    tiny = base.limit(1).select(
        (F.col("doc_id") + 200000).alias("doc_id"), F.lit("a b").alias("text")
    )
    return base.unionByName(dup).unionByName(tiny)


def test_one_exchange_bands_equal_two_step_form(spark):
    docs = _corpus(spark)
    new = {(r.doc_id, r.band, r.band_key) for r in _lsh_bands(docs).collect()}
    old = {(r.doc_id, r.band, r.band_key) for r in _old_lsh_bands(docs).collect()}
    assert new == old
    # zero-shingle docs contribute no band rows in either form
    assert not any(d == 200000 for d, _, _ in new)
    # every banded doc carries all N_HASH/BAND_ROWS bands
    per_doc = {}
    for d, b, _ in new:
        per_doc.setdefault(d, set()).add(b)
    assert all(v == set(range(_N_HASH // _BAND_ROWS)) for v in per_doc.values())
