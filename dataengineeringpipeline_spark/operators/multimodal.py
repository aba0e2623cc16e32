"""Multimodal (image/audio/video) column handling.

The pattern for binary media at 100 TB: payloads ride through the lake as
opaque ``binary`` columns next to a **typed metadata struct** (modality,
mime, byte size, checksum); decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task streams record batches through
Python once — never a row-at-a-time UDF, never a driver-side collect.

The container has no image/audio codecs, so the actual decode kernel is
STUBBED (:func:`decode_media` raises ``NotImplementedError``; tests and
queries use :func:`extract_features`'s deterministic byte-level features
instead). Everything around the stub — schema, batch iteration, UDF
signature, partitioning — is the real production plumbing: swapping in
PIL/ffmpeg changes only the body of one generator.

Payloads here are synthesized from ``documents.text`` (utf-8 bytes) so
the operators run against driver testdata without inventing new inputs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of the feature extractor — fixed width, Arrow-friendly.
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_size bigint, sha256 string, "
    "mean_byte double, byte_entropy double, n_chunks int"
)

CHUNK_BYTES = 4096


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Documents → multimodal rows: binary payload + typed metadata struct.

    ``modality`` is assigned deterministically from the doc id so every
    modality path gets exercised; real pipelines carry it from ingest.
    """
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            F.length(payload).alias("byte_size"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, modality: str):
    """Decode stub — the container ships no codecs.

    Production: ``PIL.Image.open(io.BytesIO(payload))`` /
    ``soundfile.read`` / frame-sampling via ffmpeg. Everything calling
    this is already batch-shaped, so only this body changes.
    """
    raise NotImplementedError(
        f"no codec for modality={modality!r} in this environment; "
        "swap in PIL/soundfile/ffmpeg here"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched byte-level feature extraction over ``mapInPandas``.

    Deterministic stand-in for a real decoder: byte-size, sha256,
    mean byte value, byte entropy, chunk count. Shapes match production
    exactly — per-batch numpy kernels, fixed output schema, no state.
    """
    import math

    import numpy as np
    import pandas as pd

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "byte_size": [], "sha256": [], "mean_byte": [],
                "byte_entropy": [], "n_chunks": [],
            }
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                out["byte_size"].append(len(buf))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                if len(buf):
                    counts = np.bincount(buf, minlength=256)
                    p = counts[counts > 0] / len(buf)
                    out["mean_byte"].append(float(buf.mean()))
                    out["byte_entropy"].append(float(-(p * np.log2(p)).sum()))
                else:
                    out["mean_byte"].append(None)
                    out["byte_entropy"].append(None)
                out["n_chunks"].append(math.ceil(len(buf) / CHUNK_BYTES))
            yield pd.DataFrame(out)

    flat = media.select(
        "doc_id", F.col("media_meta.modality").alias("modality"), "payload"
    )
    return flat.mapInPandas(feats, schema=FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame) -> DataFrame:
    """Driver-contract query: payload attach → Arrow-batched extraction.

    Every output column is reproduced independently by the DuckDB oracle
    — including ``mean_byte``, where numpy's uint8 mean is exact (integer
    partial sums stay below 2^53, so sum/n is one correctly-rounded
    divide in both engines). ``byte_entropy`` is excluded: log2 is
    transcendental and libm-dependent; it is covered by unit tests.
    """
    return (
        extract_features(attach_payloads(docs))
        .select("doc_id", "modality", "byte_size", "sha256", "mean_byte", "n_chunks")
        .orderBy("doc_id")
    )


def frame_sample_plan(media: DataFrame, every_n_chunks: int = 4) -> DataFrame:
    """Frame/segment sampling *plan*: one row per (doc, chunk offset) to
    decode — the explode that fans a 100 TB decode job into uniform tasks.
    The decode itself would map :func:`decode_media` over this plan."""
    n_chunks = F.ceil(F.col("media_meta.byte_size") / CHUNK_BYTES).cast("int")
    return (
        media.select("doc_id", F.col("media_meta.modality").alias("modality"), n_chunks.alias("n_chunks"))
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_chunks") - 1, F.lit(0)), F.lit(every_n_chunks))),
        )
        .select("doc_id", "modality", "chunk_idx")
    )
