"""Multimodal query registrations: binary payload pipelines over
mapInPandas (documents stand in for media objects — payload bytes are the
UTF-8 encoding of text, so the DuckDB oracle can recompute byte features
from the text itself)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binary_ops import (
    attach_bmp_payload,
    attach_fake_payload,
    decode_bmp,
    extract_byte_features,
    frame_sample_stub,
)
from ..registry import register
from ..sources.tables import table


@register(
    "xmm_binary_byte_features",
    """
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           CAST(CASE WHEN strlen(text) > 0 THEN ascii(substr(text, 1, 1))
                     ELSE -1 END AS INTEGER) AS first_byte
    FROM documents
    """,
)
def q_xmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas:
    attach payload → per-batch byte features.  Oracle recomputes from the
    source text (ASCII corpus ⇒ ascii()==first byte)."""
    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    return extract_byte_features(d).select("doc_id", "n_bytes", "first_byte")


@register(
    "xmm_decode_bmp",
    """
    SELECT doc_id,
           CAST(strlen(text) % 16 + 1 AS INTEGER) AS width,
           CAST(strlen(text) % 8 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels,
           CAST(strlen(text) % 256 AS DOUBLE) AS mean_pixel
    FROM documents
    """,
)
def q_xmm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: each doc carries a valid 24-bit BMP (pure-Python
    struct encoder, dims/gray derived from text length); ``decode_bmp``
    parses the container byte-for-byte (header, padded bottom-up rows) and
    computes the pixel mean.  The oracle predicts the decoded metadata
    from the same strlen formula — decode correctness is checked exactly,
    no codec library required."""
    d = attach_bmp_payload(table(spark, sf_dir, "documents"))
    return decode_bmp(d)


@register(
    "xmm_frame_sample",
    """
    SELECT doc_id, CAST(unnest(range(0, CAST(ceil(strlen(text)/64.0) AS BIGINT)))
                        AS INTEGER) AS frame_idx
    FROM documents
    """,
)
def q_xmm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one payload row → many frame rows via
    mapInPandas (one frame per 64-byte chunk).  Oracle reproduces the
    (doc_id, frame_idx) explosion with a lateral range over
    ceil(strlen/64) — exact row-level check of the exploding shape."""
    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    return frame_sample_stub(d).drop("frame")


@register(
    "xmm_resize_half",
    """
    SELECT doc_id,
           CAST(w AS INTEGER) AS src_width,
           CAST(h AS INTEGER) AS src_height,
           CAST((w + 1) // 2 AS INTEGER) AS out_width,
           CAST((h + 1) // 2 AS INTEGER) AS out_height,
           CAST(54 + (((w + 1) // 2) * 3
                      + (4 - (((w + 1) // 2) * 3) % 4) % 4)
                    * ((h + 1) // 2) AS BIGINT) AS out_bytes,
           CAST(strlen(text) % 256 AS DOUBLE) AS mean_pixel
    FROM (SELECT doc_id, text,
                 strlen(text) % 16 + 1 AS w,
                 strlen(text) % 8 + 1 AS h
          FROM documents)
    """,
)
def q_xmm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode the BMP pixel grid, nearest-neighbor
    downsample by 2, re-encode, re-decode — reported dims/size/mean come
    from the re-encoded bytes.  The oracle predicts all of it from the
    synthesis formulas: out dims are ceil halves, out_bytes is the exact
    BMP container arithmetic (54-byte headers + padded rows), and the
    mean survives because a uniform image stays uniform under
    subsampling.  A codec bug anywhere in decode->resize->encode breaks
    the byte count or the mean."""
    from ..multimodal.binary_ops import attach_bmp_payload, resize_bmp_half

    d = attach_bmp_payload(table(spark, sf_dir, "documents"))
    return resize_bmp_half(d)


@register(
    "xmm_decode_wav",
    """
    SELECT doc_id,
           CAST(n % 400 + 1 AS BIGINT) AS n_samples,
           CAST(CASE WHEN n % 2 = 1 THEN 16000 ELSE 8000 END AS INTEGER)
               AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           (n % 400 + 1) * 1000.0
               / CASE WHEN n % 2 = 1 THEN 16000 ELSE 8000 END AS duration_ms
    FROM (SELECT doc_id, strlen(text) AS n FROM documents)
    """,
)
def q_xmm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: each doc carries a valid 16-bit mono PCM WAV
    (pure-struct RIFF encoder, params derived from text byte length);
    ``decode_wav`` parses the container and reports sample count, rate,
    channels, and exact duration.  The oracle predicts the metadata from
    the same strlen formulas — container correctness checked exactly, no
    audio library required (the audio half of the multimodal surface
    next to xmm_decode_bmp)."""
    from ..multimodal.binary_ops import attach_wav_payload, decode_wav

    d = attach_wav_payload(table(spark, sf_dir, "documents"))
    return decode_wav(d)


@register(
    "xmm_audio_energy",
    """
    SELECT doc_id,
           CAST((n % 400 + 1 + 99) // 100 AS BIGINT) AS n_windows,
           CAST(n % 1000 AS DOUBLE) AS rms_min,
           CAST(n % 1000 AS DOUBLE) AS rms_max,
           (n % 1000) < 100 AS all_silent
    FROM (SELECT doc_id, strlen(text) AS n FROM documents)
    """,
)
def q_xmm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-RMS energy / silence detection over REAL PCM payloads: the
    synthetic WAVs carry constant-amplitude samples (amp = strlen % 1000),
    so every 100-sample window's RMS is EXACTLY |amp| — IEEE sqrt of a
    perfect square is exact — and the oracle predicts the whole output
    from strlen arithmetic while the Spark side genuinely decodes bytes,
    frames samples, and reduces per window in numpy (the VAD-prefilter
    kernel shape; a real energy model slots into the same stage)."""
    from ..multimodal.binary_ops import attach_wav_payload, audio_frame_energy

    d = attach_wav_payload(table(spark, sf_dir, "documents"))
    return audio_frame_energy(d)


@register(
    "xmm_patch_tokens",
    """
    SELECT doc_id,
           CAST(pr.x AS INTEGER) AS patch_row,
           CAST(pc.x AS INTEGER) AS patch_col,
           CAST(n % 256 AS DOUBLE) AS mean_pixel
    FROM (SELECT doc_id, strlen(text) AS n,
                 strlen(text) % 16 + 1 AS w,
                 strlen(text) % 8 + 1 AS h
          FROM documents),
         unnest(range(0, CAST(ceil(h / 4.0) AS BIGINT))) pr(x),
         unnest(range(0, CAST(ceil(w / 4.0) AS BIGINT))) pc(x)
    """,
)
def q_xmm_patch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch tokenization plumbing: every document's BMP payload is
    decoded to its real pixel grid and tiled into 4×4 patches (edge
    patches partial) with per-patch channel means — one token row per
    patch.  The oracle predicts the full (doc, row, col, mean) explosion
    from the synthesis formulas: the grid is ceil(h/4)×ceil(w/4) and a
    uniform image's every patch mean IS the gray level (strlen%256) —
    so a bug in the decoder, the tiling bounds, or the partial-edge
    handling breaks either the row set or the means."""
    from ..multimodal.binary_ops import attach_bmp_payload, bmp_patch_tokens

    d = attach_bmp_payload(table(spark, sf_dir, "documents"))
    return bmp_patch_tokens(d)
