"""Streaming training-data pipeline: the document-side operators
(dedup, quality filtering, decontamination) as Structured-Streaming
stages, for corpora that ARRIVE continuously instead of sitting in a
batch store.

Design per stage (all three are the streaming forms of the batch
queries in :mod:`marex_spark.queries.dedup` / ``queries.text``):

- exact dedup: ``dropDuplicatesWithinWatermark`` on a content hash —
  state holds one hash per distinct doc inside the watermark horizon
  and is PRUNED as event time advances (an unbounded
  ``dropDuplicates`` would grow state forever at 100 TB/day rates);
- quality + language scoring: pure column expressions, map-only — no
  stream-side state at all, each micro-batch is a scoring pass;
- decontamination: stream-static broadcast semi-join of exploded
  stream shingles against the DISTINCT benchmark shingle set (the
  benchmark is tiny next to the corpus; the stream pays no shuffle by
  shingle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "at", "by", "it", "be",
)


def dedup_exact_stream(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each content hash within
    the watermark horizon wins; later copies are dropped. State is one
    row per distinct hash and expires with the watermark — the bounded
    streaming analogue of the batch hash-groupBy (queries/dedup.py
    dedup_exact)."""
    hashed = stream.withColumn("content_hash", F.xxhash64(text_col))
    return hashed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def score_documents_stream(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Map-only quality + language scoring (streaming form of
    txt_quality_score + txt_langid + txt_token_count): stateless, so it
    composes with any output mode and adds no watermark requirement."""
    ws = F.split(text_col, " ")
    n = F.size(ws)
    stop = F.size(F.filter(ws, lambda w: w.isin(*_STOPWORDS)))
    longt = F.size(F.filter(ws, lambda w: F.length(w) >= 6))
    return (
        stream.withColumn("n_tokens", n.cast("long"))
        .withColumn(
            "avg_token_len", F.length(text_col).cast("double") / F.greatest(n, F.lit(1))
        )
        .withColumn(
            "stopword_ratio", stop.cast("double") / F.greatest(n, F.lit(1))
        )
        .withColumn(
            "long_token_ratio", longt.cast("double") / F.greatest(n, F.lit(1))
        )
    )


def quality_filter_stream(
    stream: DataFrame,
    text_col: str = "text",
    min_tokens: int = 8,
    min_stopword_ratio: float = 0.01,
    max_avg_token_len: float = 20.0,
) -> DataFrame:
    """Score + threshold-filter in one stage — the gate a training
    ingestion pipeline applies before a document is ever persisted."""
    scored = score_documents_stream(stream, text_col)
    return scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("avg_token_len") <= max_avg_token_len)
    )


def decontaminate_stream(
    stream: DataFrame,
    benchmark_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Contamination flags for a document stream.

    ``benchmark_shingles`` is a STATIC DataFrame with one ``shingle``
    column (distinct n-gram strings of the held-out eval set — build it
    in batch, exactly as queries/dedup.py decontam_ngram does). Returns
    the stream of ``(id_col, shingle)`` hits: stream-static joins
    broadcast the static side, so this is map-only per micro-batch.
    A streaming per-doc contamination *fraction* would need a stateful
    aggregation; the hit stream is the append-mode-safe primitive —
    ``dropDuplicatesWithinWatermark([id_col])`` downstream yields the
    contaminated-doc-id stream."""
    ws = F.split(text_col, " ")
    sh = stream.select(
        id_col,
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
                    lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
                ),
                lambda s: F.size(F.split(s, " ")) >= n,
            )
        ).alias("shingle"),
    )
    return sh.join(F.broadcast(benchmark_shingles.select("shingle")), "shingle").select(
        id_col, "shingle"
    )


def doc_band_keys(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document MinHash-LSH band keys as a MAP-ONLY expression —
    no groupBy, so it runs on a stream without stateful aggregation.

    Same maths as the batch banding (queries/dedup.py _lsh_bands: md5
    shingle → int64, universal-hash permutations, _BAND_ROWS rows per
    band), but folded into nested higher-order functions over the
    per-row shingle array instead of an explode + groupBy — pinned
    equal to the batch table in tests/test_streaming.py. Documents
    too short to shingle produce no rows."""
    from marex_spark.queries.dedup import _BAND_ROWS, _MH_A, _MH_B, _MH_P, _N_HASH

    n = 3
    ws = F.split(F.col(text_col), " ")
    shingles = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            ),
            lambda s: F.size(F.split(s, " ")) >= n,
        )
    )
    s_arr = F.transform(
        shingles,
        lambda sh: F.conv(F.substring(F.md5(sh), 1, 15), 16, 10).cast("long")
        % _MH_P,
    )
    def _perm(h):
        # closure, NOT a default arg: a 2-parameter lambda would make
        # F.transform pass the array index as the second argument
        return F.array_min(
            F.transform(s_arr, lambda s: (s * _MH_A[h] + _MH_B[h]) % _MH_P)
        )

    minhashes = [_perm(h) for h in range(_N_HASH)]
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            mh.cast("string")
                            for mh in minhashes[
                                b * _BAND_ROWS : (b + 1) * _BAND_ROWS
                            ]
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(_N_HASH // _BAND_ROWS)
        ]
    )
    return (
        df.filter(F.size(shingles) > 0)
        .select("*", F.explode(bands).alias("_b"))
        .select(
            *df.columns,
            F.col("_b.band").alias("band"),
            F.col("_b.band_key").alias("band_key"),
        )
    )


def near_dup_stream(
    stream: DataFrame,
    corpus_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_index: bool = False,
) -> DataFrame:
    """Streaming near-dup detection against an EXISTING corpus: the
    "is this incoming document a near-duplicate of our training set"
    gate.

    ``corpus_bands`` is the static LSH band index built in batch
    (queries/dedup.py _lsh_bands over the archived corpus — at 100 TB
    it lives as a parquet table keyed by (band, band_key)). The stream
    side computes its band keys map-only (:func:`doc_band_keys`) and
    stream-static joins. Set ``broadcast_index=True`` only when the
    index genuinely fits in executor memory (small/sampled corpus);
    the default lets Spark pick the join strategy, since force-
    broadcasting a 100 TB corpus's index would OOM every executor.
    Returns (stream doc id, matched corpus doc_id, band) hits; dedupe
    downstream per doc id for a boolean flag."""
    sb = doc_band_keys(stream, text_col, id_col)
    idx = corpus_bands.select(
        F.col("doc_id").alias("corpus_doc_id"), "band", "band_key"
    )
    if broadcast_index:
        idx = F.broadcast(idx)
    return sb.join(idx, ["band", "band_key"]).select(
        id_col, "corpus_doc_id", "band"
    )


def sessionize_stream(
    stream: DataFrame,
    key_col: str = "doc_id",
    time_col: str = "ts",
    gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with the built-in ``session_window``:
    per-key sessions close after ``gap`` of inactivity and EMIT once
    the watermark passes their end — the streaming form of the batch
    lag-gap + running-sum sessionizer (queries/windows.py
    sess_sessionize). State per open session only, pruned by the
    watermark; output (key, session_start, session_end, n_events)."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def bloom_decontaminate_stream(
    stream: DataFrame,
    bloom_bits: "bytes | list",
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_literal_bits: int | None = None,
) -> DataFrame:
    """Bloom-filter contamination gate for a document stream — the
    ZERO-state, zero-join form of :func:`decontaminate_stream`.

    ``bloom_bits`` is the m-length bitset built in batch from the
    benchmark's shingles — pass operators/dedup.bloom_fit's ``bytes``
    (b"0"/b"1" per bit) directly, or any boolean sequence (normalised
    to the same bytes form here) — and ``k`` the probe count that
    built it; both sides of the geometry
    operators/dedup.bloom_geometry derives from the benchmark size
    (pass the same k; a mismatched k changes the flag set). The probe
    family (Kirsch–Mitzenmacher double hashing: one md5 per shingle,
    positions ``(h1 + i·h2) mod m``), the shingle construction, AND
    the flag expression are IMPORTED from that module — one
    definition, so a doc flagged here is flagged there by
    construction; the hash halves materialise per shingle via one
    ``transform`` pass so the HOF lambda never recomputes the md5 per
    probe. The bitset rides the plan as ONE binary literal probed by
    byte-indexed O(1) substring — a Python list literal crosses py4j
    element by element (minutes at 2^20 bits) and array element_at on
    a 2^20-slot literal was the same trap the batch tier already
    documents — so every micro-batch is a pure map pass: no
    stream-static join, no broadcast exchange, no watermark
    requirement — the cheapest possible first gate in front of the
    exact decontamination join. Emits the per-document shingle counts
    ``(id_col, n_shingles, n_flagged)`` per micro-batch row (one row
    per input doc; append-safe).

    Above ``max_literal_bits`` (default: the batch tier's
    ``_BLOOM_MAX_LITERAL_BITS``; real decontamination benchmarks reach
    m=2^24, a 16 MB literal re-embedded in every micro-batch plan) the
    bitset instead ships PACKED 8:1 ONCE as a broadcast variable and a
    per-row ``mapInArrow`` kernel gathers the k JVM-computed positions
    per shingle — same flag semantics (equality-pinned in the tests),
    same one-row-per-doc append-safe shape, still zero joins and zero
    state at any m."""
    from marex_spark.operators.dedup import (
        _BLOOM_MAX_LITERAL_BITS,
        bloom_flag_from_hashes,
        bloom_hash_cols,
        bloom_pos_from_hashes,
        shingle_array,
    )

    if isinstance(bloom_bits, (bytes, bytearray)):
        bits = bytes(bloom_bits)
    else:
        bits = bytes(bytearray(49 if v else 48 for v in bloom_bits))
    if max_literal_bits is None:
        max_literal_bits = _BLOOM_MAX_LITERAL_BITS
    m = len(bits)
    shingles = shingle_array(text_col, n)

    def _hashes(s):
        h1, h2 = bloom_hash_cols(s, m)
        return F.struct(h1.alias("h1"), h2.alias("h2"))

    hashed = F.transform(shingles, _hashes)

    if m <= max_literal_bits:

        def _hit(hs):
            return bloom_flag_from_hashes(bits, k, hs["h1"], hs["h2"])

        return stream.select(
            id_col,
            F.size(shingles).cast("long").alias("n_shingles"),
            F.size(F.filter(hashed, _hit)).cast("long").alias("n_flagged"),
        )

    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    packed = np.packbits(
        np.frombuffer(bits, dtype=np.uint8) == 0x31, bitorder="little"
    )
    bc = stream.sparkSession.sparkContext.broadcast(packed.tobytes())
    id_type = stream.schema[id_col].dataType.simpleString()
    # k positions per shingle, computed JVM-side from the materialised
    # hash halves → array<array<long>> per doc; the kernel only gathers
    poss = F.transform(
        hashed,
        lambda hs: F.array(
            *[
                bloom_pos_from_hashes(hs["h1"], hs["h2"], i, m)
                for i in range(k)
            ]
        ),
    )
    mid = stream.select(id_col, poss.alias("_ps"))

    def _probe(batches) -> Iterator:
        pb = np.frombuffer(bc.value, dtype=np.uint8)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            outer = tbl["_ps"].chunk(0)
            offs = np.asarray(outer.offsets)  # per-doc shingle counts
            counts = np.diff(offs).astype(np.int64)
            # inner lists are fixed k, never null → flat reshape
            # (list_flatten respects offsets/slices, unlike .values)
            flat = (
                pc.list_flatten(pc.list_flatten(outer))
                .to_numpy()
                .astype(np.int64)
            )
            if flat.size:
                ps = flat.reshape(-1, k)
                hit = (
                    (pb[ps >> 3] >> (ps & 7).astype(np.uint8)) & 1
                ).all(axis=1)
            else:
                hit = np.zeros(0, dtype=bool)
            cum = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
            o = offs - offs[0]
            flagged = cum[o[1:]] - cum[o[:-1]]
            yield pa.RecordBatch.from_arrays(
                [
                    tbl[id_col].chunk(0),
                    pa.array(counts),
                    pa.array(flagged.astype(np.int64)),
                ],
                names=[id_col, "n_shingles", "n_flagged"],
            )

    return mid.mapInArrow(
        _probe, schema=f"{id_col} {id_type}, n_shingles long, n_flagged long"
    )


def theta_profile_stream(
    stream_docs: DataFrame,
    scale: int = 16,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Streaming theta-sketch vocabulary profile: per micro-batch,
    emit the (group, h) SURVIVOR rows of the fixed-threshold distinct
    sketch over the batch's n-gram shingles (operators/sketch.py —
    the streaming form of the batch query ``sketch_theta_distinct``).

    The sketch's mergeability is exactly what makes it streaming-
    correct with ZERO stream state: survivor sets union, so appending
    each micro-batch's survivors to a sink and running
    ``theta_estimate`` over the accumulated table yields the SAME
    estimate as one batch pass over everything seen. Duplicate
    survivors (a shingle recurring within or across batches) collapse
    in the merge's distinct, so the stream side needs NO
    dropDuplicates — which on a stream would be an unbounded state
    store, the exact anti-pattern this module exists to avoid. The
    per-batch plan is a pure map pass: per-row array_distinct
    shingling, hash, threshold filter. Sink growth is bounded by the
    batch's survivor multiplicity (~1/scale of its shingle mass)."""
    from marex_spark.operators.dedup import shingle_array
    from marex_spark.operators.sketch import theta_hash, theta_threshold

    t = theta_threshold(scale)
    sh = stream_docs.select(
        group_col,
        F.explode(shingle_array(F.col(text_col), n)).alias("shingle"),
    )
    h = theta_hash(F.col("shingle"))
    return sh.select(group_col, h.alias("h")).filter(F.col("h") < t)


def simhash_near_dup_stream(
    stream: DataFrame,
    corpus_fps: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    band_bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_index: bool = False,
) -> DataFrame:
    """Streaming SimHash near-dup gate against an archived corpus:
    "is this incoming document within hamming ``max_hamming`` of
    anything we already hold?" — the fuzzy sibling of
    :func:`near_dup_stream` (LSH gates shingle-set Jaccard; this gates
    bit-level fingerprint distance, Manku 2007's crawler setting).

    The stream side computes its 64-bit fingerprint MAP-ONLY
    (operators/simhash.py ``simhash_column`` — the one context where
    its measured 19× CPU premium over the groupBy form is the price of
    admission: a per-doc aggregation on a stream is unbounded state),
    derives its band keys sign-safely, and stream-static joins the
    static band index (``simhash_bands`` over the corpus fingerprints;
    at 100 TB a parquet table keyed by (band, key)). Candidates are
    verified with one xor+bit_count. Zero stream state; every
    micro-batch is append-safe.

    Returns (stream id, corpus_doc_id, hamming, band) hits — a pair
    matching in several bands emits one row per matching band (a
    stream-side distinct would be a state store; dedupe downstream)."""
    from marex_spark.operators.simhash import (
        _check_banding,
        simhash_bands,
        simhash_column,
    )

    _check_banding(bands, band_bits, max_hamming)
    mask = (1 << band_bits) - 1
    fp = simhash_column(text_col)
    # NULL text folds to a NULL fingerprint in the map-only form; the
    # batch groupBy form (and the oracle) drops such docs — match that.
    sb = stream.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), fp.alias("_fp")
    ).select(
        id_col,
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("_fp"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(id_col, "_fp", F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))
    idx = simhash_bands(corpus_fps, bands, band_bits).select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("fp").alias("_cfp"),
        "band",
        "key",
    )
    if broadcast_index:
        idx = F.broadcast(idx)
    hamming = F.bit_count(F.col("_fp").bitwiseXOR(F.col("_cfp")))
    return (
        sb.join(idx, ["band", "key"])
        .filter(F.col(id_col) != F.col("corpus_doc_id"))
        .select(
            id_col,
            "corpus_doc_id",
            hamming.cast("long").alias("hamming"),
            "band",
        )
        .filter(F.col("hamming") <= max_hamming)
    )
