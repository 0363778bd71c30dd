"""dedup_simhash_pairs: the banding pigeonhole must be COMPLETE — the
banded candidate join may generate extra candidates (verified away by
the hamming gate) but can never lose a qualifying pair. Brute-force
all-pairs hamming on the fixture's fingerprints is the ground truth."""

from itertools import combinations

from marex_spark.queries.dedup import (
    _SH_MAX_HAMMING,
    dedup_simhash,
    dedup_simhash_pairs,
)

SF = "/root/testdata/sf0.001"


def test_banded_pairs_equal_brute_force(spark):
    fps = {r.doc_id: r.simhash for r in dedup_simhash(spark, SF).collect()}
    truth = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= _SH_MAX_HAMMING
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_pairs(spark, SF).collect()
    }
    assert got == truth
    assert truth, "fixture must contain qualifying pairs (planted dups)"
