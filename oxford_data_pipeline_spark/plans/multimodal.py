"""Multimodal-column queries.

`mm_byte_features` (rows-only) exercises the real Arrow/mapInPandas
decode plumbing — the numpy kernel is not SQL-expressible.
`mm_metadata_profile` is the oracle-checked half: the typed-metadata
layer (modality tagging, payload byte accounting) computed as plain
relational expressions identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.functions.compat import round6
from oxford_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table


_PROFILE_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           octet_length(encode(text)) AS n_bytes,
           ascii(text) AS first_byte
    FROM documents
)
SELECT modality,
       count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_bytes) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_bytes,
       min(n_bytes) AS min_bytes,
       max(n_bytes) AS max_bytes,
       round(avg(first_byte) * 1000000 + 0.01, 0) / 1000000 + 0 AS avg_first_byte
FROM m GROUP BY 1
"""


@register("mm_metadata_profile", _PROFILE_ORACLE)
def mm_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata profile — the typed-metadata layer of the
    binary-column convention as a hash-checked relational query: per
    modality, payload byte accounting (octet lengths of the encoded
    payload) and the first-byte mean (corpus is ASCII, so codepoint ==
    byte on both engines).  One map-side-combinable aggregation; the
    opaque-payload byte features stay in `mm_byte_features`."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii("text").alias("first_byte"),
    )
    return m.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        round6(F.avg("n_bytes")).alias("avg_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        round6(F.avg("first_byte")).alias("avg_first_byte"),
    )


@register("mm_byte_features")
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction → per-modality
    rollup. The per-doc feature pass is partition-parallel with Arrow
    batches; the rollup is one small aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(docs))
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round6(F.avg("byte_entropy")).alias("avg_entropy"),
            round6(F.avg("n_bytes")).alias("avg_bytes"),
            round6(F.avg(F.element_at("hist", 1))).alias("avg_hist_bin0"),
        )
    )


# --------------------------------------------------------------------------
# Frame sampling (oracle-checked) + resize strips (rows-only)
# --------------------------------------------------------------------------
# The video-modality frame-sample plumbing promoted to the query
# contract.  The deterministic stand-in samples 4 equal byte chunks
# ("frames") per payload; because the corpus is ASCII, byte == code
# point, so the per-frame byte means are reproducible in DuckDB via
# ascii(substr(...)) over exploded positions — the mapInPandas kernel
# (batch shape, prefix-sum indexing) gets a full value-level oracle,
# not just a schema check.  A real ffmpeg decode drops into the same
# mapInPandas seam with this exact output schema.
_FRAME_ORACLE = """
WITH vids AS (
    SELECT doc_id, text, length(text) AS len,
           greatest(length(text) // 4, 1) AS fsz
    FROM documents WHERE doc_id % 3 = 2
),
bytes AS (
    SELECT v.doc_id, v.fsz, CAST(p AS INTEGER) AS pos,
           ascii(substr(v.text, CAST(p AS INTEGER), 1)) AS b
    FROM vids v, unnest(generate_series(1, v.len)) AS u(p)
),
framed AS (
    SELECT doc_id, CAST((pos - 1) // fsz AS INTEGER) AS frame_idx, b
    FROM bytes WHERE (pos - 1) // fsz < 4
)
SELECT doc_id, frame_idx,
       CAST(count(*) AS INTEGER) AS n_bytes,
       sum(CAST(b AS DOUBLE)) / count(*) AS mean_byte
FROM framed GROUP BY 1, 2
"""


@register("mm_frame_sample", _FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 4 equal byte chunks per payload via the
    Arrow-batched kernel (`operators.multimodal.fake_frame_sample`),
    one row per non-empty frame with its byte count and mean."""
    from oxford_data_pipeline_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs))


# --------------------------------------------------------------------------
# Real-codec round-trip queries (oracle-checked)
# --------------------------------------------------------------------------
# The decode stub is gone: `operators.codecs` implements PNG/BMP/PPM/
# WAV in pure stdlib.  These queries drive the REAL encode→decode path
# per document inside Arrow-batched mapInPandas and hash-check the
# decoded pixel/sample stats against DuckDB computing the same numbers
# straight from the text bytes (corpus is ASCII: codepoint == byte) —
# a value-level gate on the codec, since any filter/chunk/zlib bug in
# either direction shifts the sums.
def _ascii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents whose text is pure ASCII (byte count == char count).
    The codec round-trip queries are DEFINED over this subset: their
    kernels operate on utf-8 bytes while the oracle's ascii() yields
    codepoints, and the audio sample map (byte-96)*256 only fits int16
    for bytes <= 127 — the same predicate pins the contract on both
    engines, so the queries stay correct on any corpus."""
    from oxford_data_pipeline_spark.sources.catalog import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # widen the scan BEFORE the per-payload codec kernels: a small
    # single-row-group corpus scans as ONE task, and the Huffman/DCT
    # work is the dominant cost — fan_out is a no-op on a production
    # corpus with many row groups
    return fan_out(
        docs.filter(
            F.octet_length(F.encode("text", "UTF-8")) == F.length("text")
        )
    )


_IMG_DECODE_ORACLE = """
WITH ascii_docs AS (
    -- byte == codepoint only for pure-ASCII text; the kernel operates
    -- on utf-8 BYTES while ascii() yields CODEPOINTS, so the decode
    -- contract is defined over the ASCII subset on both engines
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
),
m AS (
    SELECT doc_id, length(text) AS len,
           greatest(CAST(ceil(length(text) / 16.0) AS INTEGER), 1) AS h
    FROM ascii_docs
),
b AS (
    SELECT d.doc_id, ascii(substr(d.text, CAST(p AS INTEGER), 1)) AS byte
    FROM ascii_docs d, unnest(generate_series(1, length(d.text))) AS u(p)
)
SELECT m.doc_id,
       m.h AS height,
       16 AS width,
       CAST(m.h * 16 AS BIGINT) AS n_px,
       CAST(coalesce(sum(b.byte), 0) AS BIGINT) AS sum_px,
       CAST(coalesce(max(b.byte), 0) AS INTEGER) AS max_px,
       1 AS gif_eq
FROM m LEFT JOIN b ON m.doc_id = b.doc_id
GROUP BY 1, 2
"""


@register("mm_image_decode", _IMG_DECODE_ORACLE)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG round-trip decode stats: each document's payload bytes
    become a 16-wide grayscale image (zero-padded tail), PNG-encoded
    cycling all five scanline filters, decoded back with the stdlib
    codec, and reduced to decoded-pixel stats.  Padding bytes are 0,
    so sum/max over the decoded array equal sum/max over the raw text
    bytes — exactly what the oracle computes without any codec.
    Round 11 adds the GIF leg: the same image round-trips through the
    LZW codec via an identity gray palette and `gif_eq` gates
    bit-exactness per document (oracle predicts 1 everywhere)."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        image_roundtrip_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        image_roundtrip_stats,
        schema="doc_id long, height int, width int, n_px long,"
               " sum_px long, max_px int, gif_eq int",
    )


_AUDIO_DECODE_ORACLE = """
WITH ascii_docs AS (
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
),
b AS (
    SELECT d.doc_id,
           (ascii(substr(d.text, CAST(p AS INTEGER), 1)) - 96) * 256 AS s
    FROM ascii_docs d, unnest(generate_series(1, length(d.text))) AS u(p)
)
SELECT d.doc_id,
       CAST(coalesce(count(b.s), 0) AS BIGINT) AS n_samples,
       CAST(coalesce(sum(b.s), 0) AS BIGINT) AS sum_sample,
       CAST(coalesce(min(b.s), 0) AS INTEGER) AS min_sample,
       CAST(coalesce(max(b.s), 0) AS INTEGER) AS max_sample
FROM ascii_docs d LEFT JOIN b ON d.doc_id = b.doc_id
GROUP BY 1
"""


@register("mm_audio_decode", _AUDIO_DECODE_ORACLE)
def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV round-trip decode stats: each document's bytes become PCM16
    samples ((byte − 96)·256), RIFF/WAVE-encoded, sniffed + decoded
    back with the stdlib codec, and reduced to decoded-sample stats
    the oracle recomputes from the text directly."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        audio_roundtrip_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        audio_roundtrip_stats,
        schema="doc_id long, n_samples long, sum_sample long,"
               " min_sample int, max_sample int",
    )


@register("mm_resize_strip")
def mm_resize_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: every payload mean-pooled to a fixed 8-'pixel'
    strip (edge-padded), the image-resize batch shape.  Rows-only (the
    array column does not hash-compare); the kernel is value-tested
    against a per-row reference in tests/test_mlops.py."""
    from oxford_data_pipeline_spark.operators.multimodal import resize_strips

    docs = load_table(spark, sf_dir, "documents")
    return resize_strips(attach_binary_payload(docs))


_JPEG_DECODE_ORACLE = """
WITH ascii_docs AS (
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
)
SELECT doc_id,
       greatest(CAST(ceil(length(text) / 16.0) AS INTEGER), 1) AS height,
       16 AS width,
       CAST(greatest(CAST(ceil(length(text) / 16.0) AS INTEGER), 1) * 16
            AS BIGINT) AS n_px,
       TRUE AS max_err_le_1,
       TRUE AS prog_eq_seq,
       TRUE AS p12_err_le_32,
       TRUE AS lossless_exact,
       TRUE AS hier_exact,
       TRUE AS arith_eq_seq,
       TRUE AS hier420_exact
FROM ascii_docs
"""


@register("mm_jpeg_decode", _JPEG_DECODE_ORACLE)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG round-trip decode, BOTH scan styles: each document's bytes
    become the canonical 16-wide grayscale image, encoded sequential
    (SOF0) AND progressive (SOF2) at quality 100 and decoded back
    through the full marker/Huffman/IDCT (and Annex-G spectral/
    successive-approximation) paths inside mapInPandas.  Header
    geometry hash-checks against the oracle; JPEG's lossiness means
    pixel sums cannot (by design), so the value gates are the per-row
    ±1 reconstruction verdict and the progressive-decode ==
    sequential-decode byte-identity verdict — any Annex-G bookkeeping
    slip flips `prog_eq_seq` on some document.  A third leg runs the
    SAME image at 12-bit scale through the extended-sequential process
    (SOF1, 16-bit quantization tables) — the q100 ±1 contract scales
    to ±16 at the 12-bit grain, gated per row as `p12_err_le_32` (the
    same ×2 tail the 8-bit property tests pin).  A fourth leg encodes
    the image through the LOSSLESS process (SOF3, predictor 4) and
    gates exact equality per row (`lossless_exact`).  A fifth leg runs
    the HIERARCHICAL process (Annex J: DHP, half-resolution DCT base,
    EXP expansion, SOF7 differential lossless) over the image's first
    ≤4 rows and gates the pyramid's defining bit-exactness per row
    (`hier_exact`) — cropped so the per-sample differential coding
    stays a bounded fraction of the kernel.  A sixth leg (round 11)
    encodes the same cropped image through the ARITHMETIC process
    (SOF9, Annex D QM-coder — libjpeg-conformance-tested in
    tests/test_properties.py::test_jpeg_arithmetic_*) and gates
    byte-identity with the Huffman sequential decode per row
    (`arith_eq_seq`): same quantized coefficients, independent
    entropy coder."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        jpeg_roundtrip_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        jpeg_roundtrip_stats,
        schema="doc_id long, height int, width int, n_px long,"
               " max_err_le_1 boolean, prog_eq_seq boolean,"
               " p12_err_le_32 boolean, lossless_exact boolean,"
               " hier_exact boolean, arith_eq_seq boolean,"
               " hier420_exact boolean",
    )


# --------------------------------------------------------------------------
# Audio feature extraction through the real codec
# --------------------------------------------------------------------------
# mm_audio_decode gates decode VALUES; this gates decode -> FEATURE:
# zero-crossing count, exact integer energy, and peak amplitude of the
# decoded signal, recomputed by the oracle from the source bytes (the
# (byte-96)*256 synthesis is sign-spanning, so zero crossings are
# non-trivial).  The consecutive-pair join in the oracle is per-doc
# positional (p, p+1) — the Spark side never materializes pairs at
# all (the kernel scans each decoded array once inside the Arrow
# batch).
_AUDIO_FEAT_ORACLE = """
WITH ascii_docs AS (
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
),
s AS (
    SELECT d.doc_id, CAST(p AS INTEGER) AS p,
           (ascii(substr(d.text, CAST(p AS INTEGER), 1)) - 96) * 256 AS v
    FROM ascii_docs d, unnest(generate_series(1, length(d.text))) AS u(p)
),
pairs AS (
    SELECT a.doc_id,
           CASE WHEN a.v * b.v < 0 THEN 1 ELSE 0 END AS zc
    FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.p = a.p + 1
),
feat AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(max(abs(v)) AS INTEGER) AS peak
    FROM s GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(f.n_samples, 0) AS BIGINT) AS n_samples,
       CAST(coalesce(z.zc, 0) AS BIGINT) AS zero_crossings,
       CAST(coalesce(f.energy, 0) AS BIGINT) AS energy,
       CAST(coalesce(f.peak, 0) AS INTEGER) AS peak
FROM ascii_docs d
LEFT JOIN feat f ON d.doc_id = f.doc_id
LEFT JOIN (SELECT doc_id, CAST(sum(zc) AS BIGINT) AS zc FROM pairs GROUP BY 1) z
  ON d.doc_id = z.doc_id
"""


@register("mm_audio_features", _AUDIO_FEAT_ORACLE)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> feature-extract gate: WAV round-trip through the real
    codec, then zero-crossing / energy / peak features of the decoded
    signal, every value recomputed exactly by the oracle from the
    source bytes."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        audio_feature_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        audio_feature_stats,
        schema="doc_id long, n_samples long, zero_crossings long,"
               " energy long, peak int",
    )


# --------------------------------------------------------------------------
# Image feature extraction through the real codec
# --------------------------------------------------------------------------
# The image twin of mm_audio_features: decode -> 4-band brightness
# histogram + dominant band of the DECODED pixels, recomputed exactly
# by the oracle from the source bytes (the zero tail-padding counts
# in band 0 on both sides — part of the contract).
_IMG_FEAT_ORACLE = """
WITH ascii_docs AS (
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
),
m AS (
    SELECT doc_id, length(text) AS len,
           greatest(CAST(ceil(length(text) / 16.0) AS INTEGER), 1) AS h
    FROM ascii_docs
),
px AS (
    SELECT d.doc_id,
           ascii(substr(d.text, CAST(p AS INTEGER), 1)) // 64 AS band
    FROM ascii_docs d, unnest(generate_series(1, length(d.text))) AS u(p)
),
counts AS (
    SELECT m.doc_id,
           CAST(coalesce(sum(CASE WHEN px.band = 0 THEN 1 END), 0)
                + m.h * 16 - m.len AS BIGINT) AS b0,
           CAST(coalesce(sum(CASE WHEN px.band = 1 THEN 1 END), 0) AS BIGINT) AS b1,
           CAST(coalesce(sum(CASE WHEN px.band = 2 THEN 1 END), 0) AS BIGINT) AS b2,
           CAST(coalesce(sum(CASE WHEN px.band = 3 THEN 1 END), 0) AS BIGINT) AS b3
    FROM m LEFT JOIN px ON m.doc_id = px.doc_id
    GROUP BY m.doc_id, m.h, m.len
)
SELECT doc_id, b0, b1, b2, b3,
       CAST(CASE greatest(b0, b1, b2, b3)
            WHEN b0 THEN 0 WHEN b1 THEN 1 WHEN b2 THEN 2 ELSE 3
            END AS INTEGER) AS dominant_band
FROM counts
"""


@register("mm_image_features", _IMG_FEAT_ORACLE)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> feature gate for images: 4-band brightness histogram
    + dominant band of the decoded pixels, every count recomputed
    exactly by the oracle from the source bytes."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        image_feature_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        image_feature_stats,
        schema="doc_id long, b0 long, b1 long, b2 long, b3 long,"
               " dominant_band int",
    )


# --------------------------------------------------------------------------
# Perceptual-hash image near-dup (the LAION-style multimodal dedup op)
# --------------------------------------------------------------------------
# dHash through the REAL codec: 4 row-bands x 16 column integer means
# of the decoded pixels, one bit per adjacent-column comparison done as
# an integer cross-product (no floats anywhere), 60 bits total.  The
# oracle recomputes the hash from the source bytes, so a single decoder
# pixel error flips bits and fails the hash gate.  Near-dup pairs come
# from pigeonhole blocking: Hamming <= 3 over 4 blocks guarantees an
# equal 15-bit block, so an equi-join on any block finds every pair; a
# block-occupancy cap bounds join fan-out on degenerate corpora (the
# same hot-key guard as the simhash/shingle pair generators).
_PH_HAM_T = 3
_PH_BLOCK_CAP = 200

_PHASH_CELL_CTES = """
ascii_docs AS (
    SELECT * FROM documents WHERE octet_length(encode(text)) = length(text)
),
px AS (
    SELECT d.doc_id,
           greatest(CAST(ceil(length(d.text) / 16.0) AS INTEGER), 1) AS h,
           CAST(p AS INTEGER) - 1 AS pos,
           ascii(substr(d.text, CAST(p AS INTEGER), 1)) AS v
    FROM ascii_docs d, unnest(generate_series(1, length(d.text))) AS u(p)
),
cells AS (
    SELECT doc_id,
           least(3, ((pos // 16) * 4) // h) AS band,
           pos % 16 AS col,
           CAST(sum(v) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM px GROUP BY 1, 2, 3
),
bits AS (
    SELECT a.doc_id, a.band, a.col,
           CASE WHEN a.s * b.n > b.s * a.n THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS bit
    FROM cells a
    JOIN cells b ON a.doc_id = b.doc_id AND a.band = b.band
               AND b.col = a.col + 1
),
ph AS (
    SELECT doc_id,
           CAST(coalesce(sum(bit * (CAST(1 AS BIGINT) << (band * 15 + col))), 0)
                AS BIGINT) AS phash
    FROM ascii_docs LEFT JOIN bits USING (doc_id)
    GROUP BY doc_id
)
"""

_PHASH_ORACLE = f"""
WITH {_PHASH_CELL_CTES}
SELECT doc_id, phash,
       CAST((phash >> 0) & 32767 AS BIGINT) AS blk0,
       CAST((phash >> 15) & 32767 AS BIGINT) AS blk1,
       CAST((phash >> 30) & 32767 AS BIGINT) AS blk2,
       CAST((phash >> 45) & 32767 AS BIGINT) AS blk3
FROM ph
"""


@register("mm_phash", _PHASH_ORACLE)
def mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perceptual hash of the synthesized image, computed
    from the REAL decoded pixels inside an Arrow kernel (see section
    comment) — the multimodal near-dup fingerprint, hash-checked
    bit-for-bit against the oracle's from-source recomputation."""
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        image_phash,
    )

    docs = _ascii_docs(spark, sf_dir)
    mm = attach_binary_payload(docs).select("doc_id", "payload")
    return mm.mapInPandas(
        image_phash,
        schema="doc_id long, phash long, blk0 long, blk1 long,"
        " blk2 long, blk3 long",
    )


_PHASH_NEARDUP_ORACLE = f"""
WITH {_PHASH_CELL_CTES},
blocks AS (
    SELECT doc_id, phash, k,
           (phash >> (k * 15)) & 32767 AS blk
    FROM ph, unnest([0, 1, 2, 3]) AS t(k)
),
capped AS (
    SELECT b.* FROM blocks b
    JOIN (
        SELECT k, blk FROM blocks GROUP BY 1, 2
        HAVING count(*) <= {_PH_BLOCK_CAP}
    ) ok USING (k, blk)
),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM capped a
    JOIN capped b ON a.k = b.k AND a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {_PH_HAM_T}
"""


@register("mm_phash_neardup", _PHASH_NEARDUP_ORACLE)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: Hamming(phash) <= {_PH_HAM_T} via
    pigeonhole 4x15-bit block equi-join over the {_PH_BLOCK_CAP}-capped
    block relation — the simhash pair-generation shape applied to the
    multimodal fingerprint; candidate fan-out is bounded at cap² per
    hot block and every emitted pair is exact-verified by bit_count."""
    # materialize the fingerprint relation ONCE (one 6-long row per
    # doc): the block/occ/capped/a/b subtrees below reference it 4x,
    # and each reference would otherwise re-run the whole Arrow
    # decode+phash kernel over every image payload.  LAZY checkpoint
    # (r15): same single-kernel-run guarantee, no separate eager job.
    from oxford_data_pipeline_spark.plans.memo import bounded_once

    ph = bounded_once(mm_phash(spark, sf_dir))
    blocks = ph.select(
        "doc_id", "phash",
        F.posexplode(
            F.array(*[F.col(f"blk{k}") for k in range(4)])
        ).alias("k", "blk"),
    )
    occ = blocks.groupBy("k", "blk").agg(F.count(F.lit(1)).alias("occ"))
    capped = blocks.join(
        occ.filter(F.col("occ") <= _PH_BLOCK_CAP).select("k", "blk"),
        ["k", "blk"],
    )
    a = capped.select(
        "k", "blk", F.col("doc_id").alias("doc_a"), F.col("phash").alias("ph_a")
    )
    b = capped.select(
        "k", "blk", F.col("doc_id").alias("doc_b"), F.col("phash").alias("ph_b")
    )
    return (
        a.join(b, ["k", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.expr("cast(bit_count(ph_a ^ ph_b) as int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PH_HAM_T)
        .distinct()
    )
