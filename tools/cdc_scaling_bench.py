#!/usr/bin/env python
"""Scaling evidence for the CDC family: batch latest_snapshot and the
streaming APPLY CHANGES bucket store.

Same protocol as tools/cep_scaling_bench.py: identical job +
deterministic synthetic changelog at local[N] vs local[4N], fresh
taskset-pinned JVM per run, fixed shuffle partitions, min wall over
interleaved repeats, efficiency = (throughput_4N / throughput_N) / 4.

The digest (live-key count + sum over keys of last_id * key-hash) must
be identical at every core count and repeat, AND between the batch
read-side query and the streaming store — the merge loop's
exactly-once invariant measured at scale.

Usage: python tools/cdc_scaling_bench.py [--n 4] [--rows 8000000]
           [--keys 400000] [--files 8] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import glob, os, sys, time
rows, keys, files, in_dir, layout = (int(sys.argv[1]), int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4],
                                     sys.argv[5])
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("gen-cdc", cores=32)
span_us = 24 * 3600 * 1000000
# deterministic changelog: op and payload are pure hashes of the row
# id; ts increases with id so chronological files = arrival order.
# layout=uniform: every trigger touches every key band (the store-
# rewrite worst case). layout=local: user_id is monotone in ts, so
# each trigger's keys occupy a disjoint band (the pruning best case).
if layout == "local":
    key_expr = (F.col("id") * keys / rows).cast("long").cast("string")
else:
    key_expr = (F.col("id") % keys).cast("string")
df = (spark.range(rows)
      .select(F.col("id").alias("event_id"),
              key_expr.alias("user_id"),
              F.timestamp_micros(
                  (F.col("id") * (span_us // rows)).cast("long"))
              .alias("ts"),
              F.element_at(
                  F.array(F.lit("I"), F.lit("U"), F.lit("U"),
                          F.lit("U"), F.lit("D")),
                  ((F.xxhash64("id", F.lit(7)) % 5 + 5) % 5 + 1)
                  .cast("int")).alias("op"),
              F.element_at(
                  F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                  ((F.xxhash64("id", F.lit(8)) % 3 + 3) % 3 + 1)
                  .cast("int")).alias("event_type"),
              (F.xxhash64("id", F.lit(9)) % 1000 / 10.0)
              .alias("value")))
(df.repartitionByRange(files, "ts").sortWithinPartitions("ts")
   .write.mode("overwrite").parquet(in_dir))
t = time.time()
for i, f in enumerate(sorted(glob.glob(in_dir + "/part-*.parquet"))):
    os.utime(f, (t + i, t + i))
print("GENERATED", df.count())
"""

WORKER = r"""
import json, shutil, sys, time
mode, cores, in_dir, out_root, partitions, buckets, tag = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]), int(sys.argv[6]), sys.argv[7])
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("cdc-%s-%d" % (mode, cores), cores=cores,
                  shuffle_partitions=partitions,
                  extra_conf={
                      "spark.sql.adaptive.coalescePartitions.enabled":
                      "false"})
n_rows = spark.read.parquet(in_dir).count()
dig_expr = [F.count("*").alias("n"),
            F.sum(F.col("last_id")
                  * (F.xxhash64("user_id") % 1000003)).alias("dig")]
if mode == "batch":
    from bigdata_event_stream_detection_spark.operators.cdc import (
        latest_snapshot)
    cl = spark.read.parquet(in_dir)
    t0 = time.perf_counter()
    snap = latest_snapshot(cl, attrs=["event_type", "value"])
    res = snap.agg(*dig_expr).collect()[0]
    wall = time.perf_counter() - t0
elif mode == "icelite":
    from bigdata_event_stream_detection_spark.streaming.icelite_sink \
        import read_cdc_snapshot, start_apply_changes_icelite
    store = out_root + "/itbl_%d_%s" % (cores, tag)
    ckpt = out_root + "/ickpt_%d_%s" % (cores, tag)
    stream = (spark.readStream
              .schema("event_id long, user_id string, ts timestamp,"
                      " op string, event_type string, value double")
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    t0 = time.perf_counter()
    q = start_apply_changes_icelite(
        stream, store, ckpt, key_col="user_id",
        attrs=("event_type", "value"), available_now=True)
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0
    res = read_cdc_snapshot(spark, store).agg(*dig_expr).collect()[0]
    shutil.rmtree(store, ignore_errors=True)
else:
    from bigdata_event_stream_detection_spark.streaming.cdc import (
        read_snapshot, start_apply_changes_sink)
    store = out_root + "/store_%s_%d_%s" % (mode, cores, tag)
    ckpt = out_root + "/ckpt_%s_%d_%s" % (mode, cores, tag)
    stream = (spark.readStream
              .schema("event_id long, user_id string, ts timestamp,"
                      " op string, event_type string, value double")
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    t0 = time.perf_counter()
    q = start_apply_changes_sink(
        stream, store, ckpt, key_col="user_id",
        attrs=("event_type", "value"), n_buckets=buckets,
        available_now=True,
        mode="delta" if mode == "delta" else "merge",
        compact_every=4)
    q.awaitTermination(3600)
    wall = time.perf_counter() - t0
    res = read_snapshot(spark, store).agg(*dig_expr).collect()[0]
    shutil.rmtree(store, ignore_errors=True)
print("RESULT " + json.dumps({
    "mode": mode, "cores": cores, "wall_sec": round(wall, 2),
    "n_rows": n_rows, "live_keys": int(res["n"]),
    "digest": int(res["dig"]),
    "rows_per_sec": round(n_rows / wall, 2)}))
"""


def run_worker(mode, cores, in_dir, out_root, partitions, buckets, tag):
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    env["SPARK_LOCAL_DIRS"] = out_root
    cmd = [sys.executable, "-c", WORKER, mode, str(cores), in_dir,
           out_root, str(partitions), str(buckets), tag]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {mode}@{cores} no RESULT:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--keys", type=int, default=400_000)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--modes", default="stream,batch")
    ap.add_argument("--layout", default="uniform",
                    choices=("uniform", "local"),
                    help="uniform: every trigger touches every key "
                         "band (store-rewrite worst case); local: "
                         "keys monotone in ts, each trigger a "
                         "disjoint band (pruning best case)")
    ap.add_argument("--local-dir", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    args = ap.parse_args()

    partitions = 6 * 4 * args.n
    work = tempfile.mkdtemp(prefix="cdc_bench_", dir=args.local_dir)
    in_dir = os.path.join(tempfile.gettempdir(),
                          f"cdc_input_{args.rows}_{args.keys}_"
                          f"{args.layout}",
                          "changelog")
    env = dict(os.environ, PYTHONPATH=REPO)
    if not os.path.exists(os.path.join(in_dir, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", GEN, str(args.rows),
                        str(args.keys), str(args.files), in_dir,
                        args.layout],
                       check=True, env=env, cwd=REPO,
                       capture_output=True, timeout=3600)

    raw: dict[tuple, list] = {}
    for rep in range(args.repeats):
        for mode in args.modes.split(","):
            for cores in (args.n, 4 * args.n):
                r = run_worker(mode, cores, in_dir, work, partitions,
                               args.buckets, f"r{rep}")
                raw.setdefault((mode, cores), []).append(r)
                print(json.dumps(r), flush=True)

    lines = ["", f"## CDC family scaling (N={args.n} vs 4N="
             f"{4 * args.n} cores, min of {args.repeats} interleaved "
             "sweeps)", "",
             f"Input: {args.rows} changelog rows / {args.keys} keys "
             f"(hash-deterministic I/U/D mix, {args.layout} key "
             f"layout), {args.files} "
             f"chronological files = {args.files} micro-batches for "
             f"the stream, {args.buckets}-bucket store, {partitions} "
             "fixed shuffle partitions. batch = latest_snapshot "
             "read-side query; stream = continuous APPLY CHANGES into "
             "the bucket store (includes all store writes), snapshot "
             "digest must equal batch.", "",
             "| job | cores | best wall (s) | rows/s | live keys | "
             "digest | all walls (s) |", "|---|---|---|---|---|---|---|"]
    summaries = []
    for mode in args.modes.split(","):
        eff_tp = {}
        for cores in (args.n, 4 * args.n):
            rs = raw[(mode, cores)]
            best = min(rs, key=lambda r: r["wall_sec"])
            eff_tp[cores] = best["rows_per_sec"]
            walls = ", ".join(str(r["wall_sec"]) for r in rs)
            digs = {(r["live_keys"], r["digest"]) for r in rs}
            lines.append(
                f"| {mode} | {cores} | {best['wall_sec']} | "
                f"{best['rows_per_sec']} | "
                f"{sorted(d[0] for d in digs)} | "
                f"{sorted(d[1] for d in digs)} | {walls} |")
        eff = eff_tp[4 * args.n] / eff_tp[args.n] / 4
        summaries.append(
            f"- **{mode}**: {eff_tp[args.n]:.0f} rows/s @ "
            f"local[{args.n}] -> {eff_tp[4 * args.n]:.0f} rows/s @ "
            f"local[{4 * args.n}]; scaling efficiency **{eff:.2f}**")
    lines.append("")
    lines.extend(summaries)
    report = "\n".join(lines) + "\n"
    print(report)
    with open(args.out, "a") as f:
        f.write(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
