"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` kernels so bytes
move zero-copy and the Python work is per-batch, not per-row. The
decode step is a registry: ``decoder="real"`` (see
:mod:`.codecs`) decodes PNG / BMP / WAV / Y4M payloads with real,
dependency-free codecs (stdlib zlib/struct/wave + numpy); codecs that
genuinely need a native library (JPEG, H.264, MP3) raise
NotImplementedError inside the registry with injection instructions —
a deployment passes its own ``decode_fn`` / ``resize_fn`` /
``frame_fn`` without touching engine code. ``decoder="fake"`` (the
default, kept for synthetic-payload benchmarks) produces a
deterministic hash-seeded decode; schema, partitioning, UDF
signatures, and batch shapes are identical on both paths.

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

from . import codecs

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


def synth_encoded_media(spark: SparkSession, n_rows: int,
                        partitions: int = 8) -> DataFrame:
    """Deterministic media table whose payloads are GENUINELY encoded
    (PNG images, PCM16 WAV audio, C444 Y4M video) so the real-codec
    path decodes actual container bytes. Pixel/sample content is
    seeded by the row id, so the single-node oracle regenerates it
    bit-for-bit (tools/local_oracle.py)."""

    def gen(batches):
        for pdf in batches:
            rows = [synth_encoded_row(int(i)) for i in pdf["id"].to_numpy()]
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "payload", "meta"])

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def synth_encoded_row(i: int) -> tuple:
    """One deterministic genuinely-encoded media row (shared by the
    Spark fixture above and the local oracle)."""
    kind = ("image", "audio", "video")[i % 3]
    seed = hashlib.md5(f"media-enc-{i}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
    if kind == "image":
        w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = codecs.png_encode(arr, filter_type=i % 5)
        meta = {"width": w, "height": h, "sample_rate": None,
                "n_frames": None, "codec": "png"}
    elif kind == "audio":
        n = 400 + (i % 7) * 100
        samples = rng.integers(-20000, 20000, size=n, dtype=np.int16)
        payload = codecs.wav_encode(samples, 16000)
        meta = {"width": None, "height": None, "sample_rate": 16000,
                "n_frames": None, "codec": "wav"}
    else:
        n_frames = 3 + i % 4
        frames = rng.integers(0, 256, size=(n_frames, 12, 16, 3),
                              dtype=np.uint8)
        payload = codecs.y4m_encode(frames)
        meta = {"width": 16, "height": 12, "sample_rate": None,
                "n_frames": n_frames, "codec": "y4m"}
    return (f"m-{i:06d}", kind, payload, meta)


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
    if decode_fn is not None:
        fn = decode_fn
    elif decoder == "real":
        # built-in registry: PNG/BMP/WAV/Y4M decode + deterministic
        # per-modality feature kernels; exotic codecs raise inside
        # codecs.decode_payload with injection instructions
        fn = lambda payload, meta: codecs.media_feature_vector(  # noqa: E731
            payload, meta, dim)
    else:
        fn = lambda payload, meta: _fake_decode(payload, dim)  # noqa: E731

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
    def _fake_resize(p: bytes, w: int, h: int) -> bytes:
        digest = hashlib.md5(p).digest()
        reps = (w * h * 3) // len(digest) + 1
        return (digest * reps)[: w * h * 3]

    def run(batches):
        for pdf in batches:
            out = pdf[["doc_id", "kind"]].copy()
            if resize_fn is not None:
                out["payload"] = [resize_fn(p, width, height)
                                  for p in pdf["payload"]]
            elif decoder == "real":
                # decode -> nearest-neighbour -> re-encode in the same
                # container; non-image codecs raise in the registry
                out["payload"] = [
                    codecs.resize_payload(
                        p, (m or {}).get("codec") or "", width, height)
                    for p, m in zip(pdf["payload"], pdf["meta"])]
            else:
                out["payload"] = [_fake_resize(p, width, height)
                                  for p in pdf["payload"]]
            out["width"] = width
            out["height"] = height
            yield out

    imgs = media.filter(F.col("kind") == "image")
    return imgs.select("doc_id", "kind", "payload", "meta").mapInPandas(
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
    def _fake_frame(payload: bytes, f_no: int) -> bytes:
        return hashlib.md5(payload + f_no.to_bytes(4, "little")).digest()

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                codec = (meta or {}).get("codec") or ""
                if frame_fn is not None:
                    fn = frame_fn
                elif decoder == "real":
                    # O(1)-seek container extraction (Y4M built in),
                    # frames re-encoded as PNG at rest
                    fn = lambda p, f, _c=codec: codecs.extract_frame(  # noqa: E731,B023
                        p, _c, f)
                else:
                    fn = _fake_frame
                if decoder == "real" and frame_fn is None and codec == "y4m":
                    n_frames = codecs.y4m_n_frames(payload)
                else:
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
