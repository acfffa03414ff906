"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` kernels so bytes
move zero-copy and the Python work is per-batch, not per-row. The
actual codecs (PIL/ffmpeg/soundfile) are NOT available in this
environment, so the decode step is pluggable: ``decoder="fake"`` (the
default) produces a deterministic synthetic decode keyed by the content
hash — schema, partitioning, UDF signatures, and batch shapes are all
real and tested; a real deployment injects its codec as a callable
(``decode_fn`` / ``resize_fn`` / ``frame_fn``) without touching engine
code, and ``decoder="real"`` with no callable raises
NotImplementedError at the point where the codec call belongs.

Schema conventions:
    media(doc_id string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      n_frames:int, codec:string>)

Scale notes: payloads are large — the operators below never shuffle
the binary column except where the operation requires it; projections
prune it as early as possible (feature extraction emits fixed-size
vectors, dropping the payload before any wide stage).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, "
    "n_frames:int, codec:string>"
)

_FEATURE_DIM = 16


def synth_media(spark: SparkSession, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (fixture): payload bytes are
    keyed by doc_id, metadata follows the kind. Stands in for the real
    Iceberg media table."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                seed = hashlib.md5(f"media-{i}".encode()).digest()
                rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
                payload = rng.integers(0, 256, size=256 + i % 128,
                                       dtype=np.uint8).tobytes()
                meta = {
                    "width": 64 + (i % 4) * 32 if kind != "audio" else None,
                    "height": 64 + (i % 3) * 32 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 30 + i % 60 if kind == "video" else None,
                    "codec": {"image": "png", "audio": "wav",
                              "video": "h264"}[kind],
                }
                rows.append((f"m-{i:06d}", kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "payload", "meta"])

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: hash the bytes into a fixed-
    size float vector. Replaced by the real decoder in production."""
    h = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim)


def extract_features(
    media: DataFrame,
    decoder: str = "fake",
    dim: int = _FEATURE_DIM,
    decode_fn=None,
) -> DataFrame:
    """payload -> fixed-size feature vector (the embed step).

    Output (doc_id, kind, feature array<double>) drops the payload
    immediately — downstream stages (dedup, ANN, clustering) only ever
    shuffle the small vectors.

    ``decode_fn(payload: bytes, meta: dict | None) -> array-like`` lets
    a real deployment inject its codec (PIL/ffmpeg/soundfile) without
    touching engine code; the Spark-side plumbing (Arrow batching,
    payload pruning, schema) is identical for fake and real decoders.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")
    if decoder == "real" and decode_fn is None:
        raise NotImplementedError(
            "real media decode requires a codec; pass "
            "decode_fn=(payload, meta) -> feature vector "
            "(PIL/ffmpeg/soundfile are absent in this environment)")
    fn = decode_fn if decode_fn is not None else (
        lambda payload, meta: _fake_decode(payload, dim))

    def run(batches):
        for pdf in batches:
            feats = [np.asarray(fn(p, m), dtype=np.float64)
                     for p, m in zip(pdf["payload"], pdf["meta"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return media.select("doc_id", "kind", "payload", "meta").mapInPandas(
        run, schema="doc_id string, kind string, feature array<double>")


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
    resize_fn=None,
) -> DataFrame:
    """Image resize: binary in -> binary out + updated metadata.

    The fake decoder emits a deterministic payload of the target size
    (hash-stretched); inject a real codec via
    ``resize_fn(payload, width, height) -> bytes``.
    """
    if decoder == "real" and resize_fn is None:
        raise NotImplementedError(
            "real resize requires an image codec; pass "
            "resize_fn=(payload, width, height) -> bytes")

    def _fake_resize(p: bytes, w: int, h: int) -> bytes:
        digest = hashlib.md5(p).digest()
        reps = (w * h * 3) // len(digest) + 1
        return (digest * reps)[: w * h * 3]

    fn = resize_fn if resize_fn is not None else _fake_resize

    def run(batches):
        for pdf in batches:
            out = pdf[["doc_id", "kind"]].copy()
            out["payload"] = [fn(p, width, height) for p in pdf["payload"]]
            out["width"] = width
            out["height"] = height
            yield out

    imgs = media.filter(F.col("kind") == "image")
    return imgs.select("doc_id", "kind", "payload").mapInPandas(
        run,
        schema="doc_id string, kind string, payload binary, "
               "width int, height int")


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    decoder: str = "fake",
    frame_fn=None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (doc_id, frame_no, frame binary) — a UDTF-shaped mapInPandas that
    fans rows OUT, so downstream per-frame ops parallelize across the
    fan-out, not across videos (the skew-aware shape for long videos).

    Inject a real extractor via ``frame_fn(payload, frame_no) -> bytes``.
    """
    if decoder == "real" and frame_fn is None:
        raise NotImplementedError(
            "real frame extraction requires ffmpeg; pass "
            "frame_fn=(payload, frame_no) -> bytes")

    def _fake_frame(payload: bytes, f_no: int) -> bytes:
        return hashlib.md5(payload + f_no.to_bytes(4, "little")).digest()

    fn = frame_fn if frame_fn is not None else _fake_frame

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                n_frames = (meta["n_frames"] if meta is not None
                            and meta.get("n_frames") else 30)
                for f_no in range(0, int(n_frames), every_n):
                    rows.append((doc_id, f_no, fn(payload, f_no)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame"])

    vids = media.filter(F.col("kind") == "video")
    return vids.select("doc_id", "payload", "meta").mapInPandas(
        run, schema="doc_id string, frame_no int, frame binary")


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — pure relational over the struct
    column (payload pruned at scan: only meta/kind/length are read)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("meta.width").alias("avg_width"),
            F.avg("meta.n_frames").alias("avg_frames"),
        )
    )
