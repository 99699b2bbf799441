"""Multimodal query registrations: binary payload pipelines over
mapInPandas (documents stand in for media objects — payload bytes are the
UTF-8 encoding of text, so the DuckDB oracle can recompute byte features
from the text itself)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binary_ops import (
    attach_fake_payload,
    decode_image_stub,
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


@register("xmm_decode_stub")  # rows-only: decode is a deterministic fake
def q_xmm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode plumbing (stubbed decode — no image libs in container):
    real schema/partitioning/batch shape, fake pixels."""
    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    return decode_image_stub(d)


@register("xmm_frame_sample")  # rows-only: row-exploding mapInPandas shape
def q_xmm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one payload row → many frame rows via
    mapInPandas (count checkable: sum of ceil(n_bytes/64))."""
    d = attach_fake_payload(table(spark, sf_dir, "documents"))
    return frame_sample_stub(d).drop("frame")
