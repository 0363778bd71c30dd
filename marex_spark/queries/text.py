"""Text-analysis suite over `documents` (training-data pipeline
operators): token counting, quality scoring, language-ID heuristic,
document fingerprinting. All pure built-in string/array functions —
JVM-side, no UDFs."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.functions.decimals import dec_sql, dsum
from marex_spark.queries.registry import register, round6, round6_sql
from marex_spark.sources.parquet import load_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "txt_token_count",
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_actual
       FROM documents""",
)
def txt_token_count(spark, sf_dir):
    """Whitespace token count + char count per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "txt_quality_score",
    f"""WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws, CAST(length(text) AS DOUBLE) AS nc
          FROM documents)
        SELECT doc_id,
               {round6_sql('nc / len(ws)')} AS avg_token_len,
               {round6_sql(f'CAST(len(list_filter(ws, w -> w IN ({_STOP_SQL}))) AS DOUBLE) / len(ws)')} AS stopword_ratio,
               {round6_sql('CAST(len(list_filter(ws, w -> length(w) >= 6)) AS DOUBLE) / len(ws)')} AS long_token_ratio
        FROM t""",
)
def txt_quality_score(spark, sf_dir):
    """Quality heuristics: mean token length, stopword ratio, long-token
    ratio (length/punct/stopword-ratio scoring family)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    stop = F.size(F.filter(ws, lambda w: w.isin(*_STOPWORDS)))
    longt = F.size(F.filter(ws, lambda w: F.length(w) >= 6))
    return docs.select(
        "doc_id",
        round6(F.length("text").cast("double") / n).alias("avg_token_len"),
        round6(stop.cast("double") / n).alias("stopword_ratio"),
        round6(longt.cast("double") / n).alias("long_token_ratio"),
    )


# Marker-word table for the n-gram language heuristic. The synthetic corpus
# is English-ish regardless of its `lang` label; the operator's *shape*
# (score per language, deterministic argmax) is what the gate checks.
_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
    "zh": ("zh0", "zh1", "zh2"),
}


def _langid_sql() -> str:
    scores = ", ".join(
        "CAST(len(list_filter(ws, w -> w IN (%s))) AS BIGINT) AS score_%s"
        % (", ".join(f"'{m}'" for m in ms), lang)
        for lang, ms in _MARKERS.items()
    )
    langs = list(_MARKERS)
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        s AS (SELECT doc_id, lang, {scores} FROM t)
        SELECT doc_id, {pick} AS lang_pred,
               CASE WHEN {pick} = lang THEN 1 ELSE 0 END AS correct
        FROM s"""


@register("txt_langid", _langid_sql())
def txt_langid(spark, sf_dir):
    """Language-ID heuristic: marker-word counts per language,
    deterministic argmax (first language in fixed order wins ties)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    d = docs.select("doc_id", "lang", ws.alias("ws"))
    for lang, ms in _MARKERS.items():
        d = d.withColumn(
            f"score_{lang}", F.size(F.filter(F.col("ws"), lambda w: w.isin(*ms))).cast("long")
        )
    best = F.greatest(*[F.col(f"score_{l}") for l in _MARKERS])
    expr = None
    for lang in _MARKERS:
        cond = F.col(f"score_{lang}") == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return d.select(
        "doc_id",
        expr.alias("lang_pred"),
        F.when(expr == F.col("lang"), 1).otherwise(0).alias("correct"),
    )


@register(
    "txt_fingerprint",
    """SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
       FROM documents""",
)
def txt_fingerprint(spark, sf_dir):
    """Document fingerprint: hash of the sorted distinct token set
    (order-insensitive content signature)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))).alias(
            "fingerprint"
        ),
    )


@register(
    "txt_source_stats",
    f"""SELECT source, lang, COUNT(*) AS n_docs,
               {round6_sql('CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)')} AS avg_chars
        FROM documents GROUP BY source, lang""",
)
def txt_source_stats(spark, sf_dir):
    """Corpus composition stats per (source, lang)."""
    from marex_spark.functions.decimals import davg

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"), round6(davg("n_chars")).alias("avg_chars")
    )


@register(
    "txt_unigram_logprob",
    f"""WITH tok AS (
          SELECT doc_id, t.w AS word
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               UNNEST(ws) AS t(w)),
        freq AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM freq)
        SELECT doc_id,
               {round6_sql('AVG(ln(c / CAST(n AS DOUBLE)))')} AS avg_logprob
        FROM tok JOIN freq USING (word) CROSS JOIN tot
        GROUP BY 1""",
)
def txt_unigram_logprob(spark, sf_dir):
    """Unigram language-model quality proxy: per doc, the mean log
    corpus-probability of its tokens — the classic cheap filter for
    garbage/outlier text (low = unusual vocabulary). The frequency
    table is vocabulary-sized → broadcast; the corpus pays one token
    explode + one map-side-combinable agg, no shuffle by word of the
    full corpus rows."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = tok.groupBy("word").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            round6(F.avg(F.log(F.col("c") / F.col("n").cast("double")))).alias(
                "avg_logprob"
            )
        )
    )


@register(
    "txt_repetition_ratio",
    f"""WITH tok AS (
          SELECT doc_id, t.i AS pos, ws[t.i] AS w
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               UNNEST(generate_series(1, len(ws))) AS t(i)),
        tri AS (
          SELECT doc_id,
                 w || ' ' || LEAD(w, 1) OVER win || ' ' || LEAD(w, 2) OVER win AS g
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (SELECT doc_id, g FROM tri WHERE g IS NOT NULL)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               {round6_sql('1.0 - COUNT(DISTINCT g) / CAST(COUNT(*) AS DOUBLE)')}
                 AS dup_trigram_ratio
        FROM g GROUP BY 1""",
)
def txt_repetition_ratio(spark, sf_dir):
    """Repetition quality signal (the Gopher-rule family: heavily
    repeated n-grams mark boilerplate/spam): per doc, the fraction of
    duplicate word 3-grams. Trigrams are built by INDEXING the split
    array in the projection (no window): the token order is already in
    the row, so a doc-partitioned LEAD window — which costs a full
    corpus shuffle+sort before any aggregation — is pure overhead.
    The only exchange left is the per-doc aggregate itself. (The
    oracle keeps the LEAD form; the trigram multiset is identical.)"""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    idx = F.when(
        F.size(words) >= 3, F.sequence(F.lit(1), F.size(words) - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri = docs.select(
        "doc_id", words.alias("ws"), F.explode(idx).alias("i")
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("ws", F.col("i")),
            F.element_at("ws", F.col("i") + 1),
            F.element_at("ws", F.col("i") + 2),
        ).alias("g"),
    )
    return tri.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        round6(
            F.lit(1.0) - F.countDistinct("g") / F.count("*").cast("double")
        ).alias("dup_trigram_ratio"),
    )


@register(
    "txt_chunk_windows",
    """WITH tok AS (
         SELECT doc_id, t.i - 1 AS pos, ws[t.i] AS w
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              UNNEST(generate_series(1, len(ws))) AS t(i)),
       win AS (
         SELECT doc_id, CAST(FLOOR(pos / 32) AS BIGINT) AS win_id,
                COUNT(*) AS n_tokens,
                MIN(pos) AS start_pos
         FROM tok GROUP BY 1, 2)
       SELECT doc_id, win_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(start_pos AS BIGINT) AS start_pos
       FROM win""",
)
def txt_chunk_windows(spark, sf_dir):
    """Training-window chunking: split every document into fixed-size
    token windows (stride = size = 32 here; the sequence-packing
    precursor every LLM data pipeline runs before tokenizer batching).
    Pure built-ins: one explode + one map-side-combinable agg keyed
    (doc, window) — no shuffle of raw text, scales linearly in tokens."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    return (
        tok.withColumn("win_id", F.floor(F.col("pos") / 32).cast("long"))
        .groupBy("doc_id", "win_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.min("pos").cast("long").alias("start_pos"),
        )
    )


@register(
    "pipe_stratified_sample",
    """WITH quota AS (
         SELECT * FROM (VALUES ('src0', 80), ('src1', 50), ('src2', 20)) q(source, pct)),
       h AS (
         SELECT d.doc_id, d.source,
                CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
         FROM documents d)
       SELECT h.doc_id, h.source
       FROM h JOIN quota USING (source)
       WHERE h.bucket < quota.pct""",
)
def pipe_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — the training-mix operator:
    per-source keep-percentages applied via a content-stable hash
    bucket (md5 of doc_id, NOT rand(): re-runs and retries must select
    the same rows). Quota table broadcasts; the corpus pays one scan,
    no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    quota = spark.createDataFrame(
        [("src0", 80), ("src1", 50), ("src2", 20)], "source string, pct int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return (
        docs.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(quota), "source")
        .filter(F.col("bucket") < F.col("pct"))
        .select("doc_id", "source")
    )


@register(
    "txt_token_count_bpe",
    r"""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                AS n_pretokens,
              CAST(CEIL(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
       FROM documents""",
)
def txt_token_count_bpe(spark, sf_dir):
    """BPE-ish token counting: a GPT-2-style pretokenizer approximation
    (letter runs | digit runs | single punctuation) via
    regexp_extract_all, plus the chars/4 BPE-count rule of thumb —
    the budget estimator pipelines run before tokenizing 100 TB for
    real. Same regex on both engines; pure codegen, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                "text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0
            )
        ).cast("long").alias("n_pretokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("approx_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# PII scan / redaction — the privacy pass every training-data pipeline
# runs before release. The synthetic corpus carries no PII, so the
# query INJECTS a deterministic contact suffix derived from doc_id
# first (same derivation in the oracle) and then proves the scan +
# redaction machinery on it: pattern counts and a hash of the redacted
# text (row stays small; the full redacted corpus would be the real
# output). Pure regexp built-ins — JVM-side, no UDFs, embarrassingly
# parallel map over the corpus at any scale.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{4}"


@register(
    "txt_pii_redact",
    f"""WITH t AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com or 555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
        FROM t""",
)
def txt_pii_redact(spark, sf_dir):
    """PII detection + redaction: email/phone regex scan counts and the
    redacted text (hashed for compactness)."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = docs.select("doc_id", txt.alias("txt"))
    redacted = F.regexp_replace(
        F.regexp_replace("txt", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("txt", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("txt", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1): the
# published document-filter thresholds as one map-only pass.
# ---------------------------------------------------------------------------


@register(
    "txt_gopher_rules",
    f"""WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               {round6_sql('list_sum(list_transform(ws, w -> CAST(length(w) AS DOUBLE))) / len(ws)')}
                   AS mean_word_len,
               {round6_sql(f'CAST(len(list_filter(ws, w -> regexp_matches(w, {chr(39)}[A-Za-z]{chr(39)}))) AS DOUBLE) / len(ws)')}
                   AS alpha_word_ratio,
               CAST(len(list_filter(ws, w -> w IN ({_STOP_SQL}))) >= 2 AS BOOLEAN)
                   AS has_min_stopwords,
               CAST(len(ws) BETWEEN 50 AND 100000
                    AND (list_sum(list_transform(ws, w -> CAST(length(w) AS DOUBLE))) / len(ws)) BETWEEN 3 AND 10
                    AND (CAST(len(list_filter(ws, w -> regexp_matches(w, {chr(39)}[A-Za-z]{chr(39)}))) AS DOUBLE) / len(ws)) >= 0.8
                    AND len(list_filter(ws, w -> w IN ({_STOP_SQL}))) >= 2
                    AS BOOLEAN) AS passes
        FROM t""",
)
def txt_gopher_rules(spark, sf_dir):
    """Gopher document-quality rules: word count in [50, 100k], mean
    word length in [3, 10], ≥80% words with an alphabetic char, ≥2
    stopwords. One JVM-side pass; each rule also emitted for audit."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    mean_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n
    alpha_ratio = (
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("double") / n
    )
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*_STOPWORDS)))
    passes = (
        n.between(50, 100000)
        & mean_len.between(3.0, 10.0)
        & (alpha_ratio >= 0.8)
        & (n_stop >= 2)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        round6(mean_len).alias("mean_word_len"),
        round6(alpha_ratio).alias("alpha_word_ratio"),
        (n_stop >= 2).alias("has_min_stopwords"),
        passes.alias("passes"),
    )


# ---------------------------------------------------------------------------
# Temperature-weighted source mixing — the data-mix operator behind
# multi-source training corpora: sample source s with probability
# proportional to n_s^alpha (alpha<1 upweights small sources), scaled
# so the total target is a fraction of the corpus. Selection is by
# content-stable hash (re-runs pick the same rows); the per-source
# fraction table is a broadcast join, the corpus pays one scan.
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5
_MIX_TARGET = 0.6  # sample 60% of the corpus overall


@register(
    "pipe_source_mix_temperature",
    f"""WITH n AS (
          SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_s FROM documents GROUP BY source),
        w AS (
          SELECT source, n_s, POW(n_s, {_MIX_ALPHA}) / SUM(POW(n_s, {_MIX_ALPHA})) OVER () AS w_s,
                 (SELECT SUM(n_s) FROM n) AS total FROM n),
        f AS (
          SELECT source, LEAST(1.0, total * {_MIX_TARGET} * w_s / n_s) AS keep_frac FROM w),
        h AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
          FROM documents)
        SELECT h.doc_id, h.source
        FROM h JOIN f USING (source)
        WHERE h.u < f.keep_frac""",
)
def pipe_source_mix_temperature(spark, sf_dir):
    """Temperature-weighted source sampling (w_s proportional to n_s^alpha,
    alpha=0.5, 60%% overall target), deterministic via md5 hash buckets."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count("*").cast("double").alias("n_s"))
    w_all = Window.partitionBy()
    w = n.select(
        "source",
        "n_s",
        (F.pow("n_s", F.lit(_MIX_ALPHA)) / F.sum(F.pow("n_s", F.lit(_MIX_ALPHA))).over(w_all)).alias("w_s"),
        F.sum("n_s").over(w_all).alias("total"),
    )
    f_tab = w.select(
        "source",
        F.least(
            F.lit(1.0), F.col("total") * _MIX_TARGET * F.col("w_s") / F.col("n_s")
        ).alias("keep_frac"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    return (
        docs.select("doc_id", "source", u.alias("u"))
        .join(F.broadcast(f_tab), "source")
        .filter(F.col("u") < F.col("keep_frac"))
        .select("doc_id", "source")
    )


# --------------------------------------------------- TF-IDF keyword search

_TFIDF_TERMS = ("spark", "join", "window")
_TFIDF_K = 25


@register(
    "txt_tfidf_search",
    f"""WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM w WHERE term IN {_TFIDF_TERMS!r}
      GROUP BY 1, 2),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT term,
             {round6_sql('ln((SELECT n_docs FROM n) / COUNT(DISTINCT doc_id))')} AS idf
      FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             {dec_sql('tf.tf * idf.idf')} AS score
      FROM tf JOIN idf USING (term)
      GROUP BY 1),
    ranked AS (
      SELECT doc_id, {round6_sql('score')} AS score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT doc_id, score, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {_TFIDF_K}""",
)
def txt_tfidf_search(spark, sf_dir):
    """TF-IDF keyword search over the corpus: score = sum over query
    terms of term-frequency x ln(N/df), top-{_TFIDF_K} docs.

    Scale shape: the word explode filters to the query terms BEFORE
    the shuffle (the predicate sits inside the generator's projection),
    so the aggregation touches only query-term occurrences; idf is a
    terms-sized broadcast. One corpus scan at 100 TB, no global state.
    Determinism: tf x idf products sum in DECIMAL; idf itself is
    round6'd so both engines feed identical doubles in."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*_TFIDF_TERMS))
    tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(
        round6(
            F.log(F.lit(float(n_docs)) / F.countDistinct("doc_id"))
        ).alias("idf")
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(dsum(F.col("tf") * F.col("idf"), "score"))
    )
    return _global_topk(scored, _TFIDF_K)


def _global_topk(scored, k: int):
    """Global top-k with ranks, scale-shaped: a row_number window with
    NO partitionBy would shuffle the whole scored table to one task
    (and InferWindowGroupLimit does not fire on an empty partition
    spec) — so take the top k via orderBy+limit, which Spark executes
    as TakeOrderedAndProject (each task keeps a k-row heap; only
    k·tasks rows ever move), then rank the k survivors with the tiny
    window. Value-identical: rank over the global order, first k."""
    from pyspark.sql import Window as W

    top = (
        scored.select("doc_id", round6(F.col("score")).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
    rn = F.row_number().over(W.orderBy(F.desc("score"), "doc_id"))
    return top.withColumn("rn", rn.cast("int"))


# ------------------------------------- logistic-regression quality model

_LR_DIM = 16
_LR_ITER = 2
_LR_RATE = 0.5


def _logreg_oracle(dim: int, n_iter: int, lr: float) -> str:
    """Unrolled SQL replay of logreg_fit + logreg_predict
    (operators/classify.py): fixed-iteration batch gradient descent as
    chained CTEs. DECIMAL folds for z and the gradient; the sigmoid is
    round6'd so libm exp's last ulp cannot diverge the engines."""
    sig = round6_sql("1.0 / (1.0 + exp(-z.z))")
    ctes = [f"""WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    feat0 AS (
      SELECT doc_id,
             CAST(CAST(CONCAT('0x', SUBSTRING(md5(w), 1, 15)) AS BIGINT)
                  % {dim} AS INT) AS j,
             COUNT(*) AS c
      FROM tok GROUP BY 1, 2),
    lens AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
    feats AS (
      SELECT f.doc_id, f.j, CAST(f.c AS DOUBLE) / l.n AS x
      FROM feat0 f JOIN lens l USING (doc_id)
      UNION ALL
      SELECT doc_id, {dim} AS j, 1.0 AS x FROM documents),
    lab AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents),
    nn AS (SELECT COUNT(*) AS n_docs FROM documents),
    w0 AS (SELECT t.j, 0.0 AS wt
           FROM UNNEST(generate_series(0, {dim})) AS t(j))"""]
    for i in range(n_iter):
        ctes.append(f""",
    z{i} AS (
      SELECT f.doc_id, {dec_sql('f.x * w.wt')} AS z
      FROM feats f JOIN w{i} w USING (j) GROUP BY 1),
    p{i} AS (
      SELECT z.doc_id, {sig} AS p, lab.y
      FROM z{i} z JOIN lab USING (doc_id)),
    g{i} AS (
      SELECT f.j,
             {dec_sql('(p.p - p.y) * f.x')} / (SELECT n_docs FROM nn) AS g
      FROM feats f JOIN p{i} p USING (doc_id) GROUP BY 1),
    w{i + 1} AS (
      SELECT w.j, w.wt - {lr} * COALESCE(g.g, 0.0) AS wt
      FROM w{i} w LEFT JOIN g{i} g USING (j))""")
    ctes.append(f""",
    zf AS (
      SELECT f.doc_id, {dec_sql('f.x * w.wt')} AS z
      FROM feats f JOIN w{n_iter} w USING (j) GROUP BY 1)
    SELECT z.doc_id, {round6_sql('1.0 / (1.0 + exp(-z.z))')} AS p,
           {round6_sql('1.0 / (1.0 + exp(-z.z))')} >= 0.5 AS label
    FROM zf z""")
    return "".join(ctes)


@register("txt_quality_lr", _logreg_oracle(_LR_DIM, _LR_ITER, _LR_RATE))
def txt_quality_lr(spark, sf_dir):
    """Train a hashed-bag-of-words logistic-regression classifier
    (English-vs-rest stand-in for a fasttext-style quality model) with
    distributed batch gradient descent, then score the corpus — the
    full in-engine train+apply cycle (operators/classify.py).

    Scale shape: each iteration is one scoring aggregation (shuffle of
    doc-count rows) and one gradient aggregation (map-side-combined to
    dim+1 rows); weights ship as plan literals. The oracle replays
    BOTH iterations and the final scoring as one SQL chain."""
    from marex_spark.operators.classify import (
        hashed_bow_features,
        logreg_fit,
        logreg_predict,
    )

    docs = load_table(spark, sf_dir, "documents")
    # one materialisation serves both training and the final scoring
    feats = hashed_bow_features(docs, dim=_LR_DIM).localCheckpoint()
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    w = logreg_fit(
        feats, labels, dim=_LR_DIM, n_iter=_LR_ITER, lr=_LR_RATE,
        features_materialized=True,
    )
    return logreg_predict(feats, w)


@register(
    "pipe_corpus_curation",
    """WITH scored AS (
         SELECT doc_id, source, text, string_split(text, ' ') AS ws
         FROM documents),
       gated AS (
         SELECT doc_id, source, text FROM scored
         WHERE len(ws) >= 30
           AND length(text) / len(ws) BETWEEN 2 AND 12),
       exact AS (
         SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
       prefix AS (
         SELECT MIN(g.doc_id) AS doc_id
         FROM gated g JOIN exact e USING (doc_id)
         GROUP BY md5(array_to_string(list_slice(string_split(g.text, ' '), 1, 8), ' '))),
       sampled AS (
         SELECT g.doc_id, g.source, g.text
         FROM gated g JOIN prefix p USING (doc_id)
         WHERE CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 < 80)
       SELECT source,
              COUNT(*) AS n_docs,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
       FROM sampled GROUP BY source""",
)
def pipe_corpus_curation(spark, sf_dir):
    """The curation gauntlet as ONE composed plan: quality gate (word
    count + mean word length) → exact dedup (min doc per content hash)
    → prefix near-dup collapse (min doc per leading-8-token
    fingerprint) → deterministic 80% hash sample → per-source corpus
    accounting. Every stage is a Catalyst-planned filter/groupBy on
    the same scan lineage — the point is that the pipeline suite
    COMPOSES without materialisation barriers, and the optimizer sees
    the whole DAG (the oracle replays the identical chain).

    Scale: two map-side-combinable shuffles (content hash, prefix
    hash); the gates and the sample are per-row expressions."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    gated = docs.filter(
        (F.size(ws) >= 30)
        & ((F.length("text") / F.size(ws)).between(2, 12))
    ).select("doc_id", "source", "text")
    exact = gated.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    prefix = (
        gated.join(exact, "doc_id", "semi")
        .groupBy(
            F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)))
        )
        .agg(F.min("doc_id").alias("doc_id"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    sampled = gated.join(prefix, "doc_id", "semi").filter(bucket < 80)
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
    )


# ----------------------------------------------------- BPE tokenizer train

_BPE_MERGES = 4


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled SQL replay of bpe_fit + bpe_segment
    (operators/bpe.py): fixed merge count makes the training loop
    expressible as chained CTEs; the tie-break (max count, then
    lexicographic pair) and the two-pass replace application is
    identical in both engines (see operators/bpe.py)."""
    head = """WITH wf AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0 GROUP BY 1),
    r0 AS (
      SELECT cnt,
             ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS rep
      FROM wf)"""
    steps = []
    for i in range(n_merges):
        steps.append(f""",
    p{i} AS (
      SELECT s.syms[t.i] || ' ' || s.syms[t.i + 1] AS pair, SUM(s.cnt) AS n
      FROM (SELECT cnt, string_split(trim(rep), ' ') AS syms FROM r{i}) s,
           UNNEST(generate_series(1, greatest(len(s.syms) - 1, 0))) AS t(i)
      GROUP BY 1),
    b{i} AS (SELECT pair FROM p{i} ORDER BY n DESC, pair LIMIT 1),
    r{i + 1} AS (
      -- CASE guards the degenerate corpus that runs out of mergeable
      -- pairs before the round budget: an empty b{i} makes the scalar
      -- subquery NULL and replace(rep, NULL, ..) would null every rep
      -- (Spark's bpe_fit simply stops early)
      SELECT cnt,
             CASE WHEN (SELECT pair FROM b{i}) IS NULL THEN rep
                  ELSE replace(replace(rep,
                       ' ' || (SELECT pair FROM b{i}) || ' ',
                       ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' '),
                       ' ' || (SELECT pair FROM b{i}) || ' ',
                       ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' ')
             END AS rep
      FROM r{i})""")
    tail = f"""
    SELECT symbol, CAST(SUM(cnt) AS BIGINT) AS freq
    FROM (SELECT cnt, unnest(string_split(trim(rep), ' ')) AS symbol
          FROM r{n_merges})
    GROUP BY 1"""
    return head + "".join(steps) + tail


@register("txt_bpe_train", _bpe_oracle(_BPE_MERGES))
def txt_bpe_train(spark, sf_dir):
    """Train a 4-merge (_BPE_MERGES) BPE tokenizer on the corpus
    word-frequency table and emit the resulting symbol vocabulary with
    frequencies — tokenizer training as an in-engine operator
    (operators/bpe.py).

    Scale shape: ONE corpus-scale aggregation (the word-frequency
    table, map-side combined to vocabulary size); every merge round
    then works on the tiny distinct-word table, and the learned rules
    apply as chained literal replaces. The oracle replays training
    round-for-round as CTEs."""
    from marex_spark.operators.bpe import bpe_fit, bpe_segment, word_frequency

    docs = load_table(spark, sf_dir, "documents")
    words = word_frequency(docs).localCheckpoint()
    merges = bpe_fit(words, n_merges=_BPE_MERGES)
    return bpe_segment(words, merges)


@register(
    "pipe_token_budget_mix",
    """WITH quota AS (
         SELECT * FROM (VALUES ('src0', 4000), ('src1', 2500), ('src2', 1000))
                q(source, budget)),
       t AS (
         SELECT doc_id, source,
                len(string_split(text, ' ')) AS n_tokens,
                md5(CAST(doc_id AS VARCHAR)) AS h
         FROM documents),
       ranked AS (
         SELECT t.*, quota.budget,
                SUM(n_tokens) OVER (PARTITION BY t.source
                                    ORDER BY h, doc_id) AS cum_tokens
         FROM t JOIN quota USING (source))
       SELECT doc_id, source,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(cum_tokens AS BIGINT) AS cum_tokens
       FROM ranked WHERE cum_tokens <= budget""",
)
def pipe_token_budget_mix(spark, sf_dir):
    """Token-budget source mixing: fill each source's token budget by
    admitting documents in content-stable hash order until the
    cumulative token count reaches the quota — how a training mix hits
    "N tokens of source X" targets deterministically (re-runs admit
    the same documents; no rand()).

    Scale shape: one running-sum window PARTITIONED by source (never a
    global order), quota broadcast; the corpus pays one scan plus the
    per-source window shuffle."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    quota = spark.createDataFrame(
        [("src0", 4000), ("src1", 2500), ("src2", 1000)],
        "source string, budget int",
    )
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    ranked = t.join(F.broadcast(quota), "source").withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    return ranked.filter(F.col("cum_tokens") <= F.col("budget")).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


@register(
    "txt_bigram_logprob",
    f"""WITH tok AS (
          SELECT doc_id, t.i AS pos, ws[t.i] AS w
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               UNNEST(generate_series(1, len(ws))) AS t(i)),
        bi AS (
          SELECT doc_id, w AS w1, LEAD(w) OVER win AS w2
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        b AS (SELECT doc_id, w1, w1 || ' ' || w2 AS bg FROM bi
              WHERE w2 IS NOT NULL),
        bfreq AS (SELECT bg, COUNT(*) AS c2 FROM b GROUP BY 1),
        ufreq AS (SELECT w AS w1, COUNT(*) AS c1 FROM tok GROUP BY 1)
        SELECT doc_id,
               {round6_sql('AVG(ln(c2 / CAST(c1 AS DOUBLE)))')}
                 AS avg_bigram_logprob
        FROM b JOIN bfreq USING (bg) JOIN ufreq USING (w1)
        GROUP BY 1""",
)
def txt_bigram_logprob(spark, sf_dir):
    """Bigram language-model quality proxy: per doc, the mean log
    conditional corpus-probability ln(count(w1 w2)/count(w1)) of its
    adjacent token pairs — a sharper fluency signal than the unigram
    form (txt_unigram_logprob): shuffled-word salad keeps its unigram
    score but collapses here.

    Scale shape: bigrams are built by indexing the split array in the
    projection — NO doc-partitioned window, so the corpus never
    shuffles before the vocabulary aggregations; the bigram/unigram
    frequency tables are vocabulary-sized broadcasts, so the corpus
    pays the token explode plus map-side-combinable aggregations
    only."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    tok = docs.select("doc_id", F.explode(words).alias("w"))
    idx = F.when(
        F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1)
    ).otherwise(F.array().cast("array<int>"))
    b = docs.select(
        "doc_id", words.alias("ws"), F.explode(idx).alias("i")
    ).select(
        "doc_id",
        F.element_at("ws", F.col("i")).alias("w1"),
        F.concat_ws(
            " ",
            F.element_at("ws", F.col("i")),
            F.element_at("ws", F.col("i") + 1),
        ).alias("bg"),
    )
    bfreq = b.groupBy("bg").agg(F.count("*").alias("c2"))
    ufreq = tok.groupBy(F.col("w").alias("w1")).agg(F.count("*").alias("c1"))
    return (
        b.join(F.broadcast(bfreq), "bg")
        .join(F.broadcast(ufreq), "w1")
        .groupBy("doc_id")
        .agg(
            round6(
                F.avg(F.log(F.col("c2") / F.col("c1").cast("double")))
            ).alias("avg_bigram_logprob")
        )
    )


# ------------------------------------------- classifier evaluation (AUC)

def _auc_oracle() -> str:
    base = _logreg_oracle(_LR_DIM, _LR_ITER, _LR_RATE)
    return f"""WITH scored AS (SELECT * FROM ({base}) t),
lab2 AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
jj AS (SELECT s.p AS s, l.y FROM scored s JOIN lab2 l USING (doc_id)),
rk AS (
  SELECT s, y,
         RANK() OVER (ORDER BY s) AS mr,
         COUNT(*) OVER (PARTITION BY s) AS ties
  FROM jj),
agg AS (
  SELECT SUM(CASE WHEN y = 1.0 THEN mr + (ties - 1) / 2.0 END) AS rsum,
         SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
         COUNT(*) AS n
  FROM rk)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(n - np AS BIGINT) AS n_neg,
       ROUND((rsum - CAST(np AS DOUBLE) * (np + 1) / 2.0)
             / (CAST(np AS DOUBLE) * (n - np)), 6) AS auc
FROM agg"""


@register("txt_lr_auc", _auc_oracle())
def txt_lr_auc(spark, sf_dir):
    """Exact ROC-AUC of the in-engine logistic-regression quality
    model via the Mann-Whitney rank statistic with average ranks for
    ties — the evaluation half of a train/eval quality-filter loop.
    Ranks are taken over the round6'd scores (which hash-match the
    oracle's), so tie groups are identical on both engines and the
    half-integer rank sums are exact in float64. One corpus-sized
    window + one aggregate; at 100 TB the rank computes with the same
    two-level (partition rank + broadcast offsets) pattern as W6."""
    from pyspark.sql import Window as W

    from marex_spark.operators.classify import (
        hashed_bow_features,
        logreg_fit,
        logreg_predict,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_bow_features(docs, dim=_LR_DIM).localCheckpoint()
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    wts = logreg_fit(
        feats, labels, dim=_LR_DIM, n_iter=_LR_ITER, lr=_LR_RATE,
        features_materialized=True,
    )
    scored = logreg_predict(feats, wts).select(
        "doc_id", round6(F.col("p")).alias("s")
    )
    j = scored.join(labels, "doc_id")
    ranked = j.withColumn("mr", F.rank().over(W.orderBy("s"))).withColumn(
        "ties", F.count("*").over(W.partitionBy("s"))
    )
    agg = ranked.agg(
        F.sum(
            F.when(F.col("y") == 1.0, F.col("mr") + (F.col("ties") - 1) / 2.0)
        ).alias("rsum"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("np"),
        F.count("*").alias("n"),
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        (F.col("n") - F.col("np")).cast("long").alias("n_neg"),
        round6(
            (F.col("rsum") - F.col("np").cast("double") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * (F.col("n") - F.col("np")))
        ).alias("auc"),
    )


# ------------------------------------------- sequence packing for training

_PACK_BUDGET = 2048


@register(
    "pipe_sequence_packing",
    f"""WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    cum AS (
      SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM toks),
    binned AS (
      SELECT CAST(before // {_PACK_BUDGET} AS BIGINT) AS bin, doc_id, n
      FROM cum)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS tok_sum,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM binned GROUP BY bin""",
)
def pipe_sequence_packing(spark, sf_dir):
    """Concatenation-style sequence packing — the standard LM
    training-data layout: documents concatenate in deterministic
    (doc_id) order and split at context-window boundaries
    ({budget} tokens); each document is attributed to the bin its
    FIRST token lands in. Output: per-bin document count, token sum
    and first doc. The exclusive prefix sum is the W6 pattern — at
    100 TB it runs as per-partition sums + broadcast offsets instead
    of the single-partition window used at this fixture size."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    cum = toks.withColumn("before", F.coalesce(F.sum("n").over(w), F.lit(0)))
    binned = cum.withColumn(
        "bin", (F.col("before") / _PACK_BUDGET).cast("long")
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("tok_sum"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# ------------------------------------- DSIR importance resampling

_DSIR_B = 64  # hashed-bigram feature buckets
_DSIR_LANG = "en"  # the target distribution: English docs
_DSIR_TAU = 50.0  # acceptance temperature on the per-doc log-ratio


@register(
    "pipe_dsir_resample",
    f"""WITH tok AS MATERIALIZED (
      SELECT doc_id, lang, t.i AS pos, ws[t.i] AS w
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
           UNNEST(generate_series(1, len(ws))) AS t(i)),
    bg AS MATERIALIZED (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(w || ' ' || w2), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS b
      FROM (SELECT doc_id, lang, w,
                   LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM tok)
      WHERE w2 IS NOT NULL),
    raw AS MATERIALIZED (SELECT b, COUNT(*) AS c_r FROM bg GROUP BY 1),
    tgt AS MATERIALIZED (
      SELECT b, COUNT(*) AS c_t FROM bg WHERE lang = '{_DSIR_LANG}' GROUP BY 1),
    tots AS MATERIALIZED (
      SELECT (SELECT SUM(c_r) FROM raw) AS n_r,
             (SELECT COALESCE(SUM(c_t), 0) FROM tgt) AS n_t),
    ltab AS MATERIALIZED (
      SELECT raw.b,
             CAST({round6_sql(
                 f"ln((COALESCE(tgt.c_t, 0) + 1) / (tots.n_t + {_DSIR_B}.0))"
                 f" - ln((raw.c_r + 1) / (tots.n_r + {_DSIR_B}.0))")}
               AS DECIMAL(38,6)) AS l
      FROM raw LEFT JOIN tgt USING (b), tots),
    docb AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    wts AS (
      SELECT doc_id,
             CAST(SUM(c * l) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS avg_lr
      FROM docb JOIN ltab USING (b) GROUP BY 1)
    SELECT doc_id, {round6_sql('avg_lr')} AS dsir_logratio
    FROM wts
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0
          < LEAST(1.0, exp({_DSIR_TAU} * avg_lr))""",
)
def pipe_dsir_resample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed word-bigram
    features into B=64 buckets, add-1-smoothed bucket unigram models
    for the target distribution (English docs) vs the raw corpus,
    per-doc importance = length-normalised log-likelihood ratio, then
    deterministic acceptance u < min(1, exp(tau*ratio)) with the
    corpus's md5-uniform u (re-runs select the same docs; tau sharpens
    the length-normalised ratio back to a selective acceptance rate).

    Scale shape: the bucket model tables are B-sized broadcasts and
    every aggregation is map-side combinable over the token explode —
    no all-pairs stage, no driver materialisation; the per-doc weight
    is an exact DECIMAL sum (order-independent), so the selection is
    reproducible across partitionings. This is the standard
    cheap-featurised alternative to classifier-based quality filtering
    (txt_quality_lr) for steering a 100 TB raw crawl toward a target
    domain."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    idx = F.when(
        F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1)
    ).otherwise(F.array().cast("array<int>"))
    # bigrams by array indexing in the projection — no doc-partitioned
    # LEAD window, so the corpus never shuffles before the bucket agg
    bg = docs.select(
        "doc_id", "lang", words.alias("ws"), F.explode(idx).alias("i")
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at("ws", F.col("i")),
                            F.element_at("ws", F.col("i") + 1),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _DSIR_B
        ).alias("b"),
    )
    # ONE corpus pass: everything downstream (raw/target bucket models,
    # totals, per-doc weights) aggregates the per-(doc, bucket) count
    # table. The three consumers prune DIFFERENT column sets out of it
    # (wts drops lang, models drops doc_id from the output, tots keeps
    # only the sums), so Catalyst's ReuseExchange never sees identical
    # subtrees and the bigram explode + md5 ran three times (the r9
    # before-plan shows 3 parquet scans). localCheckpoint materialises
    # the count table once — corpus-linear but explode-free — and every
    # model reads the checkpointed blocks instead of re-hashing bigrams.
    docb = bg.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("c"))
    docb = docb.localCheckpoint()
    # both bucket models in ONE conditional aggregation over docb
    models = docb.groupBy("b").agg(
        F.sum("c").alias("c_r"),
        F.sum(
            F.when(F.col("lang") == _DSIR_LANG, F.col("c")).otherwise(F.lit(0))
        ).alias("c_t"),
    )
    tots = models.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    ltab = (
        models.crossJoin(F.broadcast(tots))
        .select(
            "b",
            round6(
                F.log(
                    (F.col("c_t") + 1) / (F.col("n_t") + F.lit(float(_DSIR_B)))
                )
                - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.lit(float(_DSIR_B))))
            )
            .cast("decimal(38,6)")
            .alias("l"),
        )
    )
    wts = (
        docb.join(F.broadcast(ltab), "b")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("c") * F.col("l")).cast("double")
                / F.sum("c").cast("double")
            ).alias("avg_lr")
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        wts.withColumn("u", u)
        .filter(
            F.col("u")
            < F.least(F.lit(1.0), F.exp(F.lit(_DSIR_TAU) * F.col("avg_lr")))
        )
        .select("doc_id", round6(F.col("avg_lr")).alias("dsir_logratio"))
    )


# --------------------------------- CCNet perplexity buckets

_CCNET_SQL = f"""WITH tok AS (
      SELECT doc_id, t.i AS pos, ws[t.i] AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           UNNEST(generate_series(1, len(ws))) AS t(i)),
    bi AS (
      SELECT doc_id, w AS w1, LEAD(w) OVER win AS w2
      FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
    b AS MATERIALIZED (SELECT doc_id, w1, w1 || ' ' || w2 AS bg FROM bi
          WHERE w2 IS NOT NULL),
    bfreq AS (SELECT bg, COUNT(*) AS c2 FROM b GROUP BY 1),
    ufreq AS (SELECT w AS w1, COUNT(*) AS c1 FROM tok GROUP BY 1),
    lp AS (
      SELECT doc_id,
             {round6_sql('AVG(ln(c2 / CAST(c1 AS DOUBLE)))')} AS logprob
      FROM b JOIN bfreq USING (bg) JOIN ufreq USING (w1)
      GROUP BY 1),
    tiled AS (
      SELECT d.doc_id, d.lang, lp.logprob,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY lp.logprob DESC, d.doc_id) AS t3
      FROM lp JOIN documents d USING (doc_id))
    SELECT doc_id, lang, logprob,
           CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
    FROM tiled"""


@register("pipe_ccnet_buckets", _CCNET_SQL)
def pipe_ccnet_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every doc with the corpus bigram LM (txt_bigram_logprob's model),
    then split each language into head/middle/tail terciles by score —
    the standard curation signal for keeping the fluent third of a
    crawl per language. NTILE over (lang, rounded score, doc_id) is
    deterministic across engines.

    Scale shape: the LM tables are vocabulary-sized broadcast joins;
    the tercile window partitions by language, so no global sort —
    per-language ordering is the same work CCNet's per-shard
    perplexity sort does, expressed as one window."""
    from pyspark.sql import Window as W

    lp = txt_bigram_logprob(spark, sf_dir).withColumnRenamed(
        "avg_bigram_logprob", "logprob"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(F.desc("logprob"), F.asc("doc_id"))
    t3 = F.ntile(3).over(w)
    return (
        lp.join(docs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "logprob",
            F.when(t3 == 1, "head")
            .when(t3 == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# --------------------------------------------------------- BM25 search

_BM25_TERMS = ("spark", "merge", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 25
# Precomputed constants so both engines evaluate the identical literal
# arithmetic: tf*(k1+1) and (1-b) + b*(dl/avgdl).
_BM25_K1P1 = 2.2
_BM25_1MB = 0.25


@register(
    "txt_bm25_search",
    f"""WITH base AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents),
    avgdl AS (
      SELECT {round6_sql('CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) / COUNT(dl)')} AS v
      FROM base),
    w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT w.doc_id, w.term, CAST(COUNT(*) AS DOUBLE) AS tf, MAX(base.dl) AS dl
      FROM w JOIN base ON base.doc_id = w.doc_id
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY 1, 2),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    idf AS (
      SELECT term,
             {round6_sql('ln(((SELECT n FROM nd) - CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5) / (CAST(COUNT(DISTINCT doc_id) AS DOUBLE) + 0.5) + 1.0)')} AS idf
      FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             {dec_sql(f'idf.idf * ((tf.tf * {_BM25_K1P1}) / (tf.tf + {_BM25_K1} * ({_BM25_1MB} + {_BM25_B} * (tf.dl / (SELECT v FROM avgdl)))))')} AS score
      FROM tf JOIN idf USING (term)
      GROUP BY 1),
    ranked AS (
      SELECT doc_id, {round6_sql('score')} AS score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT doc_id, score, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {_BM25_K}""",
)
def txt_bm25_search(spark, sf_dir):
    """Okapi BM25 keyword search (Lucene idf form): per query term,
    idf(t) = ln((N - df + .5)/(df + .5) + 1), weight = idf * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl)), summed per doc, top-{_BM25_K}.

    Scale shape (same skeleton as txt_tfidf_search): the explode
    filters to the query terms BEFORE any shuffle, so the aggregation
    touches only query-term postings; idf is a terms-sized broadcast;
    avgdl / N are index-level stats a real engine precomputes once —
    here one decimal-exact agg job each. One corpus scan for postings.
    Determinism: idf and avgdl are round6'd so libm's ln and the
    division feed identical doubles; the per-posting weight is a fixed
    double op sequence (identical literals both engines); per-doc sums
    fold in DECIMAL."""
    from marex_spark.functions.decimals import davg

    docs = load_table(spark, sf_dir, "documents")
    dl = F.size(F.split("text", " ")).cast("double")
    base = docs.select("doc_id", dl.alias("dl"))
    # both index stats (N, avgdl) in ONE scan
    stats = base.agg(
        F.count("*").alias("n"), round6(davg("dl")).alias("v")
    ).first()
    n_docs, avgdl = float(stats["n"]), float(stats["v"])
    w = docs.select(
        "doc_id", dl.alias("dl"), F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = w.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl")
    )
    df_d = F.count_distinct(F.col("doc_id")).cast("double")
    idf = tf.groupBy("term").agg(
        round6(
            F.log(
                (F.lit(n_docs) - df_d + F.lit(0.5))
                / (df_d + F.lit(0.5))
                + F.lit(1.0)
            )
        ).alias("idf")
    )
    weight = F.col("idf") * (
        (F.col("tf") * F.lit(_BM25_K1P1))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(_BM25_1MB) + F.lit(_BM25_B) * (F.col("dl") / F.lit(avgdl)))
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(dsum(weight, "score"))
    )
    return _global_topk(scored, _BM25_K)


# ------------------------------------------------- per-domain quality cap

_DOMAIN_CAP_N = 15


@register(
    "pipe_domain_cap",
    f"""WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents)
    SELECT source, doc_id, n_chars, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_DOMAIN_CAP_N}""",
)
def pipe_domain_cap(spark, sf_dir):
    """Per-domain document cap (the FineWeb / RefinedWeb curation rule:
    at most N docs per registered domain, preferring higher-quality
    ones — here the exact integer key n_chars DESC, doc_id tiebreak).

    Scale shape: the filter-on-row_number pattern triggers Catalyst's
    InferWindowGroupLimit, which prunes to ≤N rows per domain MAP-SIDE
    (WindowGroupLimit Partial below the exchange, plan-pinned) — so the
    shuffle carries O(domains · N · tasks) rows and the hottest domain
    never sorts its full row set on one task. Measured at 5M docs with
    a 90%-hot domain this beats the hand-rolled salted two-phase guard
    8× (operators/curation.py has the full story; the salted form is
    kept there as the fallback arm for engines without the rule)."""
    from marex_spark.operators.curation import domain_top_n

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return domain_top_n(
        docs, "source", [F.desc("n_chars"), F.col("doc_id")], _DOMAIN_CAP_N
    ).select("source", "doc_id", "n_chars", "rank")


# -------------------------------------------- deterministic eval sampling

_BOTTOMK_N = 10


@register(
    "pipe_bottomk_sample",
    f"""WITH h AS (
      SELECT source, doc_id,
             CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM documents),
    ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY hv, doc_id) AS rank
      FROM h)
    SELECT source, doc_id, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_BOTTOMK_N}""",
)
def pipe_bottomk_sample(spark, sf_dir):
    """Bottom-k uniform sample per source (the deterministic eval-set
    sampler: order docs by a content-independent md5 of their id, keep
    the k smallest per stratum). Unlike fraction-based sampling
    (pipe_stratified_sample) the output size is EXACTLY k per source,
    and unlike rand() it is reproducible across runs, engines, and
    partitionings — which is what makes held-out sets auditable.

    Scale shape: rides the same group-limit path as pipe_domain_cap
    (operators/curation.domain_top_n) — Catalyst prunes to ≤k rows per
    source map-side, below the exchange."""
    from marex_spark.operators.curation import domain_top_n

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        "doc_id",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("hv"),
    )
    return domain_top_n(
        h, "source", [F.asc("hv"), F.col("doc_id")], _BOTTOMK_N
    ).select("source", "doc_id", "rank")
