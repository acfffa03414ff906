"""Multimodal plumbing tests: schema, batch shapes, determinism, and
the stubbed decode boundary (real codecs are absent by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.multimodal import (
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark, 60, partitions=4).cache()
    df.count()
    return df


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(media):
    f1 = extract_features(media).collect()
    assert len(f1) == 60
    assert all(len(r["feature"]) == 16 for r in f1)
    # deterministic: same payload -> same feature, at any partitioning
    f2 = {r["doc_id"]: r["feature"]
          for r in extract_features(media.repartition(7)).collect()}
    for r in f1:
        assert f2[r["doc_id"]] == r["feature"]


def test_extract_features_prunes_payload(media):
    feats = extract_features(media)
    # the output schema must not carry the binary column downstream...
    assert "payload" not in feats.columns
    # ...and a downstream projection that ignores the feature must not
    # leak the payload past the mapInPandas boundary: everything ABOVE
    # the Arrow eval node in the optimized plan is payload-free
    plan = (feats.select("doc_id")._jdf.queryExecution()
            .optimizedPlan().toString())
    above_eval = plan.split("MapInPandas")[0]
    assert "payload" not in above_eval


def test_real_decoder_rejects_exotic_codec(spark):
    """decoder="real" is a working path now (PNG/BMP/WAV/Y4M built
    in); the NotImplementedError seam survives only for codecs that
    genuinely need a native library."""
    row = [("d-0", "image", b"\xff\xd8\xff\xe0 not really jpeg",
            {"width": 2, "height": 2, "sample_rate": None,
             "n_frames": None, "codec": "jpeg"})]
    media = spark.createDataFrame(
        row, "doc_id string, kind string, payload binary, "
             "meta struct<width:int, height:int, sample_rate:int, "
             "n_frames:int, codec:string>")
    # the worker-side NotImplementedError surfaces as PythonException
    with pytest.raises(Exception) as ei:
        extract_features(media, decoder="real").collect()
    assert "jpeg" in str(ei.value)


def test_injected_real_decoder(media):
    """A user-supplied decode_fn runs through the same Arrow plumbing
    as the fake path — no engine edits needed for a real deployment."""
    # defined inline so cloudpickle ships it by value (the test module
    # is not importable on executor workers)
    def len_meta_decoder(payload, meta):
        return [float(len(payload)), 1.0 if meta is not None else 0.0]

    out = {r["doc_id"]: r["feature"]
           for r in extract_features(
               media, decoder="real",
               decode_fn=len_meta_decoder).collect()}
    sizes = {r["doc_id"]: r["n"]
             for r in media.select(
                 "doc_id", F.length("payload").alias("n")).collect()}
    assert len(out) == 60
    for doc_id, feat in out.items():
        assert feat == [float(sizes[doc_id]), 1.0]


def test_resize_images_only_images(media):
    out = resize_images(media, 32, 32).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(r["width"] == 32 and len(r["payload"]) == 32 * 32 * 3
               for r in out)


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_n=10)
    per_doc = frames.groupBy("doc_id").count().collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(per_doc) == n_videos
    assert all(r["count"] >= 3 for r in per_doc)  # >=30 frames / 10


def test_media_stats(media):
    rows = {r["kind"]: r for r in media_stats(media).collect()}
    assert rows["image"]["avg_width"] is not None
    assert rows["video"]["avg_frames"] is not None
    assert rows["audio"]["total_bytes"] > 0
