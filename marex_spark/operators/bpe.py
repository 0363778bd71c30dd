"""In-engine BPE tokenizer training: iterative byte-pair-encoding
merges learned from a corpus word-frequency table.

Same "small model, big scan" tiering as kmeans_fit/logreg_fit
(operators/embed.py, classify.py): each merge round is one
map-side-combinable pair-count aggregation over the (tiny) distinct
word table; the driver holds only the learned merge list. Determinism
contract: pair ties break lexicographically, and merges apply as TWO
non-overlapping left-to-right ``replace`` passes per round (each pass
has the exact semantics both Spark's and DuckDB's ``replace`` share;
the second pass catches the alternating occurrences the first pass's
consumed boundary spaces skip, e.g. ' a b a b ' -> ' ab a b ' ->
' ab ab '), which is what lets the registry oracle
(queries/text.py txt_bpe_train) replay training as unrolled CTEs.
(Classic BPE re-scans until no occurrence remains; the two-pass form
differs only on 5+ repeats of one symbol inside a word — documented,
deterministic.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) whitespace-token frequency table — BPE's input; at
    corpus scale this is the one heavy aggregation (map-side combined,
    output ~vocabulary-sized)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _rep0(word) -> F.Column:
    """Padded space-separated character representation: 'cat' →
    ' c a t ' (the pad makes every symbol boundary a space, so a merge
    is one literal replace of ' l r ' with ' lr ')."""
    return F.concat(F.lit(" "), F.array_join(F.split(word, ""), " "), F.lit(" "))


def bpe_fit(
    words: DataFrame, n_merges: int = 4
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a (word, cnt) table.

    Per round: explode adjacent symbol pairs of every word's current
    representation weighted by word count, pick the most frequent pair
    (lexicographic tie-break), apply it with the two-pass replace
    (module docstring). The distinct-word table is vocabulary-sized,
    so rounds are cheap at any corpus scale. Returns
    [(left, right), ...] in merge order."""
    if n_merges < 0:
        raise ValueError("bpe_fit needs n_merges >= 0")
    reps = words.select("cnt", _rep0(F.col("word")).alias("rep"))
    reps = reps.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        syms = F.split(F.trim(F.col("rep")), " ")
        # guard 1-symbol words: Spark's sequence(1, 0) DESCENDS to
        # [1, 0] rather than emitting empty, and element_at(_, 0) throws
        pairs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat(
                    F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            reps.select("cnt", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0].pair.split(" ", 1)
        merges.append((left, right))
        reps = reps.select(
            "cnt", _apply_merge(F.col("rep"), left, right).alias("rep")
        ).localCheckpoint()
        # NOTE: superseded localCheckpoint blocks are RDD-level cache
        # the Dataset CacheManager does not track, so unpersist() is a
        # no-op on them; they are released by the ContextCleaner once
        # the superseded DataFrames are garbage-collected (rebinding
        # `reps` drops the only reference each round)
    return merges


def _apply_merge(rep, left: str, right: str):
    pat = F.lit(f" {left} {right} ")
    new = F.lit(f" {left}{right} ")
    return F.replace(F.replace(rep, pat, new), pat, new)


def bpe_segment(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list to a (word, cnt) table and return the
    corpus symbol-frequency table (symbol, freq) — the vocabulary the
    tokenizer would emit. Pure column expressions (chained replaces
    ship as plan literals)."""
    rep = _rep0(F.col("word"))
    for left, right in merges:
        rep = _apply_merge(rep, left, right)
    return (
        words.select("cnt", F.explode(F.split(F.trim(rep), " ")).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )
