"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

`decode_media` is REAL: `operators.codecs` implements PNG/BMP/PPM/WAV
in pure stdlib (the runtime ships no PIL/ffmpeg), and the round-trip
kernels below (`image_roundtrip_stats`, `audio_roundtrip_stats`) drive
encode→decode per document with value-level DuckDB oracles.  The
`fake_*` kernels remain as the deterministic byte-level feature path
(histogram/entropy/resize/frame-sample) — whole-batch numpy, the shape
a heavier codec (ffmpeg video) would drop into at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, byte_entropy double,"
    " hist array<double>"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal rows: payload = opaque bytes (here
    the utf-8 text; in production the image/audio blob), plus a typed
    metadata struct — the engine's convention for non-text modalities."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, modality: str | None = None):
    """Decode a media payload to (numpy array, metadata dict) with the
    pure-stdlib codecs in `operators.codecs` — PNG (8-bit gray/RGB/
    RGBA, every scanline filter), BMP 24-bit, binary PPM, RIFF/WAVE
    PCM.  Format is sniffed from magic bytes; ``modality`` is advisory
    only.  Raises ValueError on unknown/unsupported payloads — callers
    inside `mapInPandas` kernels map that to a quarantine row, never a
    job failure.  Video containers remain out of scope (no stdlib
    codec exists); frame-sampling over already-decoded byte streams is
    `fake_frame_sample`."""
    from oxford_data_pipeline_spark.operators.codecs import decode

    return decode(payload)


def _concat_payloads(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of variable-length byte payloads into one uint8
    array plus per-row (offset, length) — the layout every vectorized
    kernel below indexes into.  One allocation per Arrow batch; no
    per-row Python objects beyond the join."""
    data = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    offs = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(payloads) else np.zeros(0, np.int64)
    return data, offs, lens


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in for `mapInPandas`: 16-bin byte
    histogram + entropy per payload.  Whole-batch numpy: one flattened
    bincount over (row_index·16 + nibble) builds every row's histogram
    at once — no per-row Python loop, the shape a real vectorized
    decoder should copy."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        row_idx = np.repeat(np.arange(n), lens)
        hist2d = np.bincount(
            row_idx * N_HIST_BINS + (data >> 4), minlength=n * N_HIST_BINS
        ).astype(np.float64).reshape(n, N_HIST_BINS)
        totals = hist2d.sum(axis=1, keepdims=True)
        p = np.divide(hist2d, totals, out=np.zeros_like(hist2d), where=totals > 0)
        plogp = np.zeros_like(p)
        np.log2(p, out=plogp, where=p > 0)
        entropy = -(p * plogp).sum(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "modality": [m["modality"] for m in pdf["meta"]],
                "n_bytes": np.array([int(m["n_bytes"]) for m in pdf["meta"]], dtype=np.int32),
                "byte_entropy": entropy,
                "hist": list(p),
            }
        )


def extract_features(mm: DataFrame) -> DataFrame:
    """Multimodal feature extraction over binary payloads."""
    return mm.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)


def fake_resize_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic resize stand-in: downsample the payload byte
    sequence to a fixed 8-'pixel' strip by mean-pooling with edge
    padding (what an image resize does per channel).  Whole-batch
    numpy: segment sums come from one global prefix-sum indexed by an
    (n_rows × 8) boundary matrix; edge padding is added analytically as
    (missing_count × last_byte) — identical values to the former
    per-row reshape/mean, no per-row loop."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        csum = np.concatenate(([0.0], np.cumsum(data, dtype=np.float64)))
        pad = (-lens) % 8
        chunk = np.maximum((lens + pad) // 8, 1)  # padded length / 8
        j = np.arange(9)
        # padded-space boundaries, clamped to the real data extent
        bounds = np.minimum(chunk[:, None] * j[None, :], lens[:, None])
        seg_real = csum[offs[:, None] + bounds[:, 1:]] - csum[offs[:, None] + bounds[:, :-1]]
        # padding contribution: segment part beyond the real extent,
        # filled with the row's last byte (np.pad mode="edge")
        over = np.maximum(chunk[:, None] * j[None, :] - lens[:, None], 0)
        pad_cnt = over[:, 1:] - over[:, :-1]
        if data.size:
            last_byte = np.where(lens > 0, data[(offs + lens - 1).clip(min=0)], 0).astype(np.float64)
        else:  # every payload in the batch is empty: no bytes to index
            last_byte = np.zeros(n, dtype=np.float64)
        strips = (seg_real + pad_cnt * last_byte[:, None]) / chunk[:, None]
        strips = np.where((lens > 0)[:, None], strips, 0.0).round(6)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "modality": [m["modality"] for m in pdf["meta"]],
                "strip": list(strips),
            }
        )


def fake_frame_sample(
    batches: Iterator[pd.DataFrame], n_frames: int = 4
) -> Iterator[pd.DataFrame]:
    """Deterministic frame-sample stand-in: split the payload into
    equal chunks ('frames') and keep every (len/n)-th — the ffmpeg
    keyframe-sampling shape, one output row per sampled frame.
    Whole-batch numpy: all (row, frame) chunk sums come from one global
    prefix-sum; empty trailing chunks are mask-dropped (same rows as
    the former per-row break)."""
    for pdf in batches:
        n = len(pdf)
        data, offs, lens = _concat_payloads(pdf["payload"])
        csum = np.concatenate(([0.0], np.cumsum(data, dtype=np.float64)))
        size = np.maximum(lens // n_frames, 1)
        i = np.arange(n_frames + 1)
        bounds = np.minimum(size[:, None] * i[None, :], lens[:, None])
        cnt = bounds[:, 1:] - bounds[:, :-1]
        sums = csum[offs[:, None] + bounds[:, 1:]] - csum[offs[:, None] + bounds[:, :-1]]
        keep = cnt > 0
        row_idx = np.repeat(np.arange(n), keep.sum(axis=1))
        frame_idx = np.nonzero(keep)[1]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy()[row_idx],
                "frame_idx": frame_idx.astype(np.int32),
                "n_bytes": cnt[keep].astype(np.int32),
                "mean_byte": sums[keep] / cnt[keep],
            }
        )


_IMG_W = 16  # synthetic-image width (pixels); height = ceil(len/16)


def image_roundtrip_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec image kernel: per payload, synthesize the canonical
    grayscale image (bytes → `_IMG_W`-wide rows, zero-padded tail),
    PNG-encode it cycling through ALL five scanline filters, decode it
    back with `operators.codecs`, and emit pixel stats of the DECODED
    array.  Any encoder/decoder disagreement (filter math, chunk
    framing, zlib handling) shifts sum_px/max_px and fails the DuckDB
    oracle, which computes the same stats straight from the text bytes
    — a value-level gate on the codec itself, not just the plumbing.
    Per-payload Python is inherent to codecs (zlib is per-blob); the
    kernel stays Arrow-batched and partition-parallel."""
    from oxford_data_pipeline_spark.operators.codecs import (
        decode,
        gif_decode,
        gif_encode,
        png_encode,
    )

    gray_pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    for pdf in batches:
        ids, hs, n_px, s_px, mx_px, gif_eq = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            h = max(-(-len(b) // _IMG_W), 1)
            img = np.zeros(h * _IMG_W, dtype=np.uint8)
            img[: len(b)] = b
            plane = img.reshape(h, _IMG_W)
            dec, meta = decode(png_encode(plane))
            if meta["format"] != "png" or meta["width"] != _IMG_W:
                raise ValueError(f"png codec mismatch for doc {doc_id}: {meta}")
            # GIF leg: the same plane through the LZW codec via an
            # identity gray palette must decode bit-exactly
            grgb, gmeta = gif_decode(
                gif_encode(plane, gray_pal, interlace=bool(doc_id & 1))
            )
            ok = (
                gmeta["format"] == "gif"
                and bool((grgb == plane[:, :, None]).all())
            )
            ids.append(doc_id)
            hs.append(meta["height"])
            n_px.append(int(dec.size))
            s_px.append(int(dec.sum()))
            mx_px.append(int(dec.max()))
            gif_eq.append(1 if ok else 0)
        yield pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "height": np.array(hs, dtype=np.int32),
                "width": np.full(len(ids), _IMG_W, dtype=np.int32),
                "n_px": np.array(n_px, dtype=np.int64),
                "sum_px": np.array(s_px, dtype=np.int64),
                "max_px": np.array(mx_px, dtype=np.int32),
                "gif_eq": np.array(gif_eq, dtype=np.int32),
            }
        )


def audio_roundtrip_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec audio kernel: per payload, synthesize PCM16 samples
    ((byte − 96) · 256 — spans negative and positive over ASCII),
    WAV-encode, decode back via the sniffing dispatcher, emit sample
    stats of the DECODED signal (count, sum, min, max).  The DuckDB
    oracle recomputes from the text bytes — value-level codec gate."""
    from oxford_data_pipeline_spark.operators.codecs import decode, wav_encode

    for pdf in batches:
        ids, cnt, ssum, smin, smax = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            pcm = ((b.astype(np.int32) - 96) * 256).astype(np.int16)
            dec, meta = decode(wav_encode(pcm, rate=8000))
            if meta["format"] != "wav" or meta["rate"] != 8000:
                raise ValueError(f"wav codec mismatch for doc {doc_id}: {meta}")
            mono = dec[:, 0]
            ids.append(doc_id)
            cnt.append(int(meta["n_samples"]))
            ssum.append(int(mono.sum()) if mono.size else 0)
            smin.append(int(mono.min()) if mono.size else 0)
            smax.append(int(mono.max()) if mono.size else 0)
        yield pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "n_samples": np.array(cnt, dtype=np.int64),
                "sum_sample": np.array(ssum, dtype=np.int64),
                "min_sample": np.array(smin, dtype=np.int32),
                "max_sample": np.array(smax, dtype=np.int32),
            }
        )


def resize_strips(mm: DataFrame) -> DataFrame:
    return mm.mapInPandas(
        fake_resize_features, schema="doc_id long, modality string, strip array<double>"
    )


def sample_frames(mm: DataFrame) -> DataFrame:
    return mm.filter(F.col("meta.modality") == "video").mapInPandas(
        fake_frame_sample,
        schema="doc_id long, frame_idx int, n_bytes int, mean_byte double",
    )


def jpeg_roundtrip_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec JPEG kernel: per payload, synthesize the canonical
    `_IMG_W`-wide grayscale image (same construction as the PNG
    kernel), encode it as baseline JPEG at quality 100 (all-ones
    quantization tables — the DCT round trip is then exact to ±1 per
    pixel), decode back through the sniffing dispatcher (full
    marker-parse + Huffman + IDCT path), and emit the deterministic
    header fields plus the ±1 tolerance verdict.  JPEG is lossy, so
    unlike the PNG kernel the oracle cannot recompute pixel sums; the
    decoded-vs-source bound IS the codec gate (any Huffman/DCT/zigzag
    bug blows far past ±1), and looser color/4:2:0 tolerances are
    property-tested in tests/test_codecs.py."""
    from oxford_data_pipeline_spark.operators.codecs import decode
    from oxford_data_pipeline_spark.operators.jpeg import (
        _downsample2,
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_hierarchical,
        jpeg_encode_lossless,
    )

    for pdf in batches:
        (ids, hs, n_px, ok, prog_ok, p12_ok, ll_ok, hier_ok,
         arith_ok, h420_ok) = ([] for _ in range(10))
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            h = max(-(-len(b) // _IMG_W), 1)
            img = np.zeros(h * _IMG_W, dtype=np.uint8)
            img[: len(b)] = b
            img = img.reshape(h, _IMG_W)
            dec, meta = decode(jpeg_encode(img, quality=100))
            if meta["format"] != "jpeg" or meta["width"] != _IMG_W:
                raise ValueError(f"jpeg codec mismatch for doc {doc_id}: {meta}")
            err = int(np.abs(dec.astype(np.int32) - img.astype(np.int32)).max())
            # progressive leg: the SOF2 scan script carries the same
            # quantized coefficients, so its decode must be
            # BYTE-identical to the sequential decode
            pdec, pmeta = decode(jpeg_encode(img, quality=100, progressive=True))
            if pmeta["format"] != "jpeg" or pmeta["width"] != _IMG_W:
                raise ValueError(
                    f"progressive jpeg mismatch for doc {doc_id}: {pmeta}"
                )
            # 12-bit leg: the same image at 12-bit scale (x16) through
            # the extended-sequential process (SOF1, 16-bit quant
            # tables).  q100 tables are all-16 at 12-bit, so the exact
            # 8-bit +-1 contract scales to +-16; the verdict allows the
            # same x2 tail the 8-bit property tests pin (+-2 -> 32)
            img12 = (img.astype(np.uint16) << 4)
            d12, m12 = decode(jpeg_encode(img12, quality=100, precision=12))
            if m12.get("precision") != 12 or m12["width"] != _IMG_W:
                raise ValueError(f"12-bit jpeg mismatch for doc {doc_id}: {m12}")
            err12 = int(np.abs(d12.astype(np.int32) - img12.astype(np.int32)).max())
            # lossless leg (SOF3, predictor 4): decode must be EXACT —
            # the defining property, and a per-document gate on the
            # whole DPCM/predictor/category-16 path
            dll, mll = decode(jpeg_encode_lossless(img, predictor=4))
            if not mll.get("lossless") or mll["width"] != _IMG_W:
                raise ValueError(f"lossless jpeg mismatch for doc {doc_id}: {mll}")
            # hierarchical leg (Annex J): lossy DCT base + EXP + SOF7
            # differential lossless over the first <=4 rows of the same
            # image — the pyramid's defining bit-exactness gate, cropped
            # to bound the per-sample differential coding cost per row
            sub = img[: min(4, img.shape[0])]
            dhier, mhier = decode(jpeg_encode_hierarchical(sub, quality=75))
            if not mhier.get("hierarchical") or mhier["width"] != _IMG_W:
                raise ValueError(
                    f"hierarchical jpeg mismatch for doc {doc_id}: {mhier}"
                )
            # arithmetic leg (SOF9, Annex D QM-coder): same cropped
            # image, same q100 coefficients through the OTHER entropy
            # coder — its decode must be BYTE-identical to the Huffman
            # sequential decode (the libjpeg-conformance-tested
            # contract, gated per document here)
            darith, marith = decode(jpeg_encode(sub, quality=100,
                                                arithmetic=True))
            dseq_sub, _mseq_sub = decode(jpeg_encode(sub, quality=100))
            if marith["format"] != "jpeg" or marith["width"] != _IMG_W:
                raise ValueError(
                    f"arithmetic jpeg mismatch for doc {doc_id}: {marith}"
                )
            # subsampled-pyramid leg (round 11): a 4:2:0 hierarchical
            # stream with the SOF7 differential-lossless final stage
            # over a color stack of the same crop — every COMPONENT
            # sample must restore bit-exactly (verified through the
            # output color transform, the strongest per-doc gate the
            # subsampled Annex-J driver admits)
            rgbc = np.stack([sub, np.roll(sub, 1, axis=1),
                             np.roll(sub, 2, axis=1)], axis=-1)
            d420, m420 = jpeg_decode(jpeg_encode_hierarchical(
                rgbc, quality=75, final_lossless=True,
                chroma_subsample=True,
            ))
            if m420.get("sampling") != [[2, 2], [1, 1], [1, 1]]:
                raise ValueError(
                    f"subsampled pyramid mismatch for doc {doc_id}: {m420}"
                )
            rr = rgbc[..., 0].astype(np.float64)
            gg = rgbc[..., 1].astype(np.float64)
            bb = rgbc[..., 2].astype(np.float64)
            yy = 0.299 * rr + 0.587 * gg + 0.114 * bb
            ycb = -0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0
            ycr = 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0
            cps = [np.clip(np.round(v), 0, 255).astype(np.int64)
                   for v in (yy, ycb, ycr)]
            cps = [cps[0], _downsample2(cps[1]), _downsample2(cps[2])]
            sh_, sw_ = rgbc.shape[:2]
            cbu = np.repeat(np.repeat(cps[1], 2, axis=0), 2,
                            axis=1)[:sh_, :sw_].astype(np.float64)
            cru = np.repeat(np.repeat(cps[2], 2, axis=0), 2,
                            axis=1)[:sh_, :sw_].astype(np.float64)
            yf = cps[0].astype(np.float64)
            want420 = np.clip(np.round(np.stack([
                yf + 1.402 * (cru - 128.0),
                yf - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0),
                yf + 1.772 * (cbu - 128.0),
            ], axis=-1)), 0, 255).astype(np.uint8)
            ids.append(doc_id)
            hs.append(meta["height"])
            n_px.append(int(dec.size))
            ok.append(err <= 1)
            prog_ok.append(bool(np.array_equal(pdec, dec)))
            p12_ok.append(err12 <= 32)
            ll_ok.append(bool(np.array_equal(dll, img)))
            hier_ok.append(bool(np.array_equal(dhier, sub)))
            arith_ok.append(bool(np.array_equal(darith, dseq_sub)))
            h420_ok.append(bool(np.array_equal(d420, want420)))
        yield pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "height": np.array(hs, dtype=np.int32),
                "width": np.full(len(ids), _IMG_W, dtype=np.int32),
                "n_px": np.array(n_px, dtype=np.int64),
                "max_err_le_1": np.array(ok, dtype=bool),
                "prog_eq_seq": np.array(prog_ok, dtype=bool),
                "p12_err_le_32": np.array(p12_ok, dtype=bool),
                "lossless_exact": np.array(ll_ok, dtype=bool),
                "hier_exact": np.array(hier_ok, dtype=bool),
                "arith_eq_seq": np.array(arith_ok, dtype=bool),
                "hier420_exact": np.array(h420_ok, dtype=bool),
            }
        )


def audio_feature_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec audio FEATURE kernel (decode -> feature-extract):
    per payload, synthesize PCM16 ((byte - 96) * 256), WAV-encode,
    decode back through the sniffing dispatcher, then extract the
    classic frame features from the DECODED signal — zero-crossing
    count (strict sign products < 0), total energy (exact integer sum
    of squares), and peak amplitude.  All integer arithmetic, so the
    DuckDB oracle recomputes every value from the text bytes exactly —
    the end-to-end proof that features derived THROUGH the codec match
    features derived from the source."""
    from oxford_data_pipeline_spark.operators.codecs import decode, wav_encode

    for pdf in batches:
        ids, cnt, zcr, energy, peak = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            pcm = ((b.astype(np.int32) - 96) * 256).astype(np.int16)
            dec, meta = decode(wav_encode(pcm, rate=8000))
            if meta["format"] != "wav":
                raise ValueError(f"wav codec mismatch for doc {doc_id}: {meta}")
            mono = dec[:, 0].astype(np.int64)
            ids.append(doc_id)
            cnt.append(int(mono.size))
            zcr.append(int(np.sum(mono[:-1] * mono[1:] < 0)) if mono.size > 1 else 0)
            energy.append(int(np.sum(mono * mono)) if mono.size else 0)
            peak.append(int(np.max(np.abs(mono))) if mono.size else 0)
        yield pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "n_samples": np.array(cnt, dtype=np.int64),
                "zero_crossings": np.array(zcr, dtype=np.int64),
                "energy": np.array(energy, dtype=np.int64),
                "peak": np.array(peak, dtype=np.int32),
            }
        )


def image_feature_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec image FEATURE kernel (decode -> feature-extract):
    PNG round-trip like `image_roundtrip_stats`, then a 4-band
    brightness histogram of the DECODED pixels (bands of 64) plus the
    dominant band (ties to the darker band).  All integer counts, so
    the DuckDB oracle recomputes every value from the text bytes
    exactly.  Padding pixels are zero and are counted in band 0 on
    both sides — part of the contract, not an accident."""
    from oxford_data_pipeline_spark.operators.codecs import decode, png_encode

    for pdf in batches:
        out = {k: [] for k in ("doc_id", "b0", "b1", "b2", "b3", "dominant_band")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            h = max(-(-len(b) // _IMG_W), 1)
            img = np.zeros(h * _IMG_W, dtype=np.uint8)
            img[: len(b)] = b
            dec, meta = decode(png_encode(img.reshape(h, _IMG_W)))
            if meta["format"] != "png":
                raise ValueError(f"png codec mismatch for doc {doc_id}: {meta}")
            bands = np.bincount(dec.ravel() // 64, minlength=4)
            out["doc_id"].append(doc_id)
            for i in range(4):
                out[f"b{i}"].append(int(bands[i]))
            out["dominant_band"].append(int(np.argmax(bands)))
        yield pd.DataFrame(
            {
                "doc_id": np.array(out["doc_id"], dtype=np.int64),
                "b0": np.array(out["b0"], dtype=np.int64),
                "b1": np.array(out["b1"], dtype=np.int64),
                "b2": np.array(out["b2"], dtype=np.int64),
                "b3": np.array(out["b3"], dtype=np.int64),
                "dominant_band": np.array(out["dominant_band"], dtype=np.int32),
            }
        )


_PH_BANDS = 4       # horizontal row-bands of the image
_PH_COLS = 16       # == _IMG_W; one cell mean per (band, column)
_PH_BITS_PER_BAND = _PH_COLS - 1  # adjacent-column comparisons


def image_phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Perceptual dHash over the REAL codec path (the LAION-style image
    near-dup primitive): synthesize the byte image, PNG encode+decode,
    then hash the DECODED pixels — 4 row-bands × 16 column means, one
    bit per adjacent-column comparison (60 bits).  All comparisons are
    integer cross-products (s_a·n_b > s_b·n_a), so the DuckDB oracle
    reproduces the hash bit-for-bit from the source bytes: any decoder
    pixel error flips hash bits and fails the hash check.  Padding
    bytes are EXCLUDED (only the first n real pixels hash), so the
    hash is a pure content fingerprint."""
    from oxford_data_pipeline_spark.operators.codecs import decode, png_encode

    for pdf in batches:
        ids, hashes, blks = [], [], [[] for _ in range(_PH_BANDS)]
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            h = max(-(-len(b) // _IMG_W), 1)
            img = np.zeros(h * _IMG_W, dtype=np.uint8)
            img[: len(b)] = b
            dec, meta = decode(png_encode(img.reshape(h, _IMG_W)))
            if meta["format"] != "png":
                raise ValueError(f"png codec mismatch for doc {doc_id}: {meta}")
            px = dec.ravel()[: len(b)].astype(np.int64)  # real pixels only
            pos = np.arange(len(px))
            band = np.minimum(_PH_BANDS - 1, (pos // _IMG_W) * _PH_BANDS // h)
            col = pos % _IMG_W
            s = np.zeros((_PH_BANDS, _PH_COLS), dtype=np.int64)
            n = np.zeros((_PH_BANDS, _PH_COLS), dtype=np.int64)
            np.add.at(s, (band, col), px)
            np.add.at(n, (band, col), 1)
            bits = (
                s[:, :-1] * n[:, 1:] > s[:, 1:] * n[:, :-1]
            )  # integer-exact adjacent-column comparison
            weights = 1 << (
                np.arange(_PH_BANDS)[:, None] * _PH_BITS_PER_BAND
                + np.arange(_PH_BITS_PER_BAND)[None, :]
            ).astype(np.int64)
            phash = int((bits * weights).sum())
            ids.append(doc_id)
            hashes.append(phash)
            for k in range(_PH_BANDS):
                blks[k].append((phash >> (k * _PH_BITS_PER_BAND)) & 0x7FFF)
        yield pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "phash": np.array(hashes, dtype=np.int64),
                **{
                    f"blk{k}": np.array(blks[k], dtype=np.int64)
                    for k in range(_PH_BANDS)
                },
            }
        )
