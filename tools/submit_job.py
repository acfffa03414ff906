#!/usr/bin/env python
"""Cluster entry point for the continuous event-detection job.

Launch (multi-executor cluster; N and 4N executors per the scaling
criterion):

    cd /root/repo && zip -r /tmp/besd.zip bigdata_event_stream_detection_spark
    spark-submit \
      --master yarn --deploy-mode client \
      --num-executors 200 --executor-cores 4 --executor-memory 16g \
      --conf spark.sql.shuffle.partitions=800 \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.executorEnv.OMP_NUM_THREADS=1 \
      --py-files /tmp/besd.zip \
      tools/submit_job.py \
        --input  s3://bucket/sequences/        \
        --output s3://bucket/events/           \
        --checkpoint s3://bucket/checkpoints/detect \
        --background s3://bucket/models/background.parquet \
        --window "7 days" --watermark "3 days"

The job is resumable: offsets, state, and watermark live in
--checkpoint; re-submitting with the same checkpoint resumes exactly
where it stopped and the file-manifest sink stays exactly-once.
`--mode batch` runs the same pipeline as a batch backfill.
"""

from __future__ import annotations

import argparse
from dataclasses import replace

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--background", required=True,
                    help="precomputed background-model parquet (word_id, p); "
                         "refresh offline, the stream broadcasts it")
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--window", default="7 days")
    ap.add_argument("--slide", default=None)
    ap.add_argument("--watermark", default="3 days")
    ap.add_argument("--themes", type=int, default=5)
    ap.add_argument("--preset", choices=["default", "small"],
                    default="default",
                    help="'small' applies the sf-test parameter preset "
                         "(plans.pipeline.small_params) — for smoke "
                         "runs and CI backfills on toy inputs")
    ap.add_argument("--trigger", default="1 minute")
    ap.add_argument("--max-files-per-trigger", type=int, default=None,
                    help="file-source rate limit (files per micro-batch); "
                         "also what lets an --available-now backfill "
                         "advance the watermark across batches")
    ap.add_argument("--available-now", action="store_true",
                    help="process everything already in --input, then "
                         "stop: bounded backfill/catch-up run (the "
                         "checkpoint still makes the next submission "
                         "resume incrementally)")
    ap.add_argument("--metrics-jsonl", default=None)
    args = ap.parse_args()

    # spark-submit owns master/executor config; only job-level conf here
    spark = (SparkSession.builder.appName("besd-detect")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from bigdata_event_stream_detection_spark.params import DEFAULTS
    from bigdata_event_stream_detection_spark.plans.pipeline import (
        detect_event_stream,
    )
    from bigdata_event_stream_detection_spark.streaming.engine import (
        read_sequence_stream, start_event_sink, streaming_detect_events,
    )
    from bigdata_event_stream_detection_spark.streaming.metrics import (
        MetricsListener,
    )

    if args.preset == "small":
        from bigdata_event_stream_detection_spark.plans.pipeline import (
            small_params,
        )

        base = small_params()
    else:
        base = DEFAULTS
    params = replace(base, window_length=args.window,
                     window_slide=args.slide, num_themes=args.themes,
                     watermark_delay=args.watermark)
    background = spark.read.parquet(args.background).toPandas()

    if args.mode == "batch":
        seqs = spark.read.parquet(args.input)
        detect_event_stream(seqs, params).write.mode("append").parquet(
            args.output)
        return 0

    listener = MetricsListener(args.metrics_jsonl)
    spark.streams.addListener(listener)
    stream = read_sequence_stream(
        spark, args.input,
        max_files_per_trigger=args.max_files_per_trigger)
    events = streaming_detect_events(stream, background, params)
    if args.available_now:
        q = start_event_sink(events, args.output, args.checkpoint,
                             available_now=True)
    else:
        q = start_event_sink(events, args.output, args.checkpoint,
                             processing_time=args.trigger)
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
