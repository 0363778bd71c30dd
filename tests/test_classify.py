"""Hashed-BoW logistic regression (operators/classify.py): learns a
planted separable vocabulary, is partition-invariant (decimal folds),
and validates inputs."""

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.classify import (
    hashed_bow_features,
    logreg_fit,
    logreg_predict,
)


@pytest.fixture(scope="module")
def planted(spark):
    # class-1 docs use the "good*" vocabulary, class-0 the "bad*" one —
    # linearly separable in hashed-BoW space (dim 16 > vocab collisions
    # matter little at this size)
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, "good fine nice solid clear good fine", 1.0))
        else:
            rows.append((i, "bad junk noise broken trash bad junk", 0.0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, y double")
    feats = hashed_bow_features(docs, dim=16)
    labels = docs.select("doc_id", "y")
    return docs, feats, labels


@pytest.mark.slow
def test_learns_planted_separation(planted):
    docs, feats, labels = planted
    w = logreg_fit(feats, labels, dim=16, n_iter=20, lr=1.0)
    pred = logreg_predict(feats, w).join(labels, "doc_id")
    acc = pred.filter(
        (F.col("label") & (F.col("y") == 1.0))
        | (~F.col("label") & (F.col("y") == 0.0))
    ).count() / pred.count()
    assert acc == 1.0


@pytest.mark.slow
def test_partition_invariant(planted):
    docs, feats, labels = planted
    a = logreg_fit(feats, labels, dim=16, n_iter=2)
    b = logreg_fit(
        feats.repartition(13), labels.repartition(7), dim=16, n_iter=2
    )
    assert a == b


def test_intercept_feature_present(planted):
    docs, feats, labels = planted
    rows = feats.filter(F.col("j") == 16).count()
    assert rows == docs.count()
    assert feats.filter(F.col("j") > 16).count() == 0


def test_validation(planted, spark):
    _, feats, labels = planted
    with pytest.raises(ValueError):
        logreg_fit(feats, labels, dim=0)
    with pytest.raises(ValueError):
        logreg_fit(feats, labels.filter("doc_id < 0"), dim=16)


class TestBPE:
    """BPE trainer (operators/bpe.py): learns the expected merges on a
    planted corpus and survives 1-char words."""

    def test_learns_planted_merges(self, spark):
        from marex_spark.operators.bpe import bpe_fit, bpe_segment

        # 'ab' dominates: appears in every word of the corpus
        words = spark.createDataFrame(
            [("abab", 10), ("abc", 5), ("cab", 3)], "word string, cnt long"
        )
        merges = bpe_fit(words, n_merges=2)
        # pair (a,b) count = 10*2 + 5 + 3 = 28, the clear winner
        assert merges[0] == ("a", "b")
        # second round: 'ab ab' in 'abab' (10) beats 'ab c' (5) & 'c ab' (3)
        assert merges[1] == ("ab", "ab")
        freq = {r.symbol: r.freq for r in bpe_segment(words, merges).collect()}
        assert freq["abab"] == 10
        assert freq["ab"] == 5 + 3  # from 'abc' and 'cab'
        assert freq["c"] == 5 + 3

    def test_single_char_words_survive(self, spark):
        from marex_spark.operators.bpe import bpe_fit, bpe_segment

        words = spark.createDataFrame(
            [("a", 100), ("bb", 2)], "word string, cnt long"
        )
        merges = bpe_fit(words, n_merges=3)
        assert merges[0] == ("b", "b")
        freq = {r.symbol: r.freq for r in bpe_segment(words, merges).collect()}
        assert freq == {"a": 100, "bb": 2}

    def test_validation(self, spark):
        from marex_spark.operators.bpe import bpe_fit

        words = spark.createDataFrame([("x", 1)], "word string, cnt long")
        with pytest.raises(ValueError):
            bpe_fit(words, n_merges=-1)
        assert bpe_fit(words, n_merges=0) == []
