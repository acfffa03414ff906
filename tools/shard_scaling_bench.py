#!/usr/bin/env python
"""Scaling evidence for the shard-export family
(``sharding.shard_assignments`` -> repartition(shard_id) ->
sortWithinPartitions -> partitioned parquet write +
``shard_manifest``).

This is the WRITE-SHUFFLE family: one codegen hash per row, one
exchange on shard_id, a within-partition sort, then parquet
encode/compress — the job every epoch of a 10^12-sequence corpus pays
to land trainer shards. No Python workers at all; the bench measures
whether shuffle + columnar encode scale with cores once the kernels
and Arrow boundaries are out of the picture.

Method identical to the other scaling benches: identical job +
deterministic synthetic input at local[N] vs local[4N], fresh JVM per
run, taskset-pinned, FIXED shuffle partitions, min wall over
interleaved repeats,

    efficiency = (throughput_4N / throughput_N) / 4

The manifest (per-shard doc/token totals + order-key extremes) must be
IDENTICAL at every core count — that is the membership/order
fingerprint of the written shards.

Usage: python tools/shard_scaling_bench.py [--n 4] [--docs 2000000]
           [--shards 64] [--repeats 2] [--local-dir /dev/shm]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
n, in_dir = int(sys.argv[1]), sys.argv[2]
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("gen-shard", cores=32)
# input-hint shape: (doc_id string, tokens array<int>, n_tok, source);
# 20-80 tokens/doc, token ids hashed from (doc, position)
df = (spark.range(n)
      .withColumn("n_tok", (F.pmod(F.xxhash64("id"), 61) + 20)
                  .cast("int"))
      .select(
          F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
          F.expr("transform(sequence(1, n_tok), i -> "
                 "cast(pmod(xxhash64(id, i), 50000) as int))")
          .alias("tokens"),
          F.col("n_tok"),
          F.concat(F.lit("s"), F.pmod(F.xxhash64("id", F.lit(7)),
                                      F.lit(12))).alias("source")))
df.repartition(96).write.mode("overwrite").parquet(in_dir)
print("GENERATED", spark.read.parquet(in_dir).count())
"""

WORKER = r"""
import hashlib, json, shutil, sys, time
cores, in_dir, out_dir, partitions, n_shards, exchange = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]), sys.argv[6])
from bigdata_event_stream_detection_spark.session import get_spark
spark = get_spark("shard-%d" % cores, cores=cores,
                  shuffle_partitions=partitions,
                  extra_conf={
                      "spark.sql.adaptive.coalescePartitions.enabled":
                      "false"})
from bigdata_event_stream_detection_spark.operators.sharding import (
    shard_assignments, shard_manifest, write_training_shards)
seqs = spark.read.parquet(in_dir)
n_docs = seqs.count()   # warm scan metadata; outside t0
# JIT warm-up: run the identical job once on a slice so codegen /
# parquet encoder paths are compiled before the timed run (same
# convention as bench.py's cheap-first query ordering)
warm_dir = out_dir + "_warm"
shutil.rmtree(warm_dir, ignore_errors=True)
from pyspark.sql import functions as F
warm_slice = seqs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(8)) == 0)
write_training_shards(
    shard_assignments(warm_slice, n_shards, seed=11, epoch=3),
    warm_dir, n_shards, exchange=exchange)
shutil.rmtree(warm_dir, ignore_errors=True)
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.perf_counter()
assigned = shard_assignments(seqs, n_shards, seed=11, epoch=3)
write_training_shards(assigned, out_dir, n_shards, exchange=exchange)
wall = time.perf_counter() - t0
man = sorted(map(tuple, spark.read.json(out_dir + "/_manifest")
                 .select("shard_id", "n_docs", "n_tokens", "n_sources",
                         "min_key", "max_key").collect()))
n_tokens = sum(r[2] for r in man)
digest = hashlib.md5(repr(man).encode()).hexdigest()
print("RESULT " + json.dumps({
    "cores": cores, "wall_sec": round(wall, 2), "n_docs": n_docs,
    "n_tokens": int(n_tokens), "digest": digest,
    "docs_per_sec": round(n_docs / wall, 1),
    "tokens_per_sec": round(n_tokens / wall, 1)}))
"""


def run_worker(cores, in_dir, out_dir, work, partitions, n_shards,
               exchange="preimage"):
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    env["SPARK_LOCAL_DIRS"] = work
    cmd = [sys.executable, "-c", WORKER, str(cores), in_dir, out_dir,
           str(partitions), str(n_shards), exchange]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker @{cores} no RESULT:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--local-dir", default=None)
    ap.add_argument("--exchange", default="preimage",
                    choices=["preimage", "none"])
    ap.add_argument("--cores", type=int, action="append", default=None,
                    help="explicit core counts (repeatable); default N,4N")
    args = ap.parse_args()

    # fixed across core counts; >= shards so every shard's task can
    # run without queueing behind an unrelated one at 4N
    partitions = max(6 * 4 * args.n, args.shards)
    work = tempfile.mkdtemp(prefix="shard_bench_", dir=args.local_dir)
    out_dir = os.path.join(work, "shards_out")
    in_dir = os.path.join(tempfile.gettempdir(),
                          f"shard_input_{args.docs}", "seqs")
    env = dict(os.environ, PYTHONPATH=REPO)
    if not os.path.exists(in_dir):
        subprocess.run([sys.executable, "-c", GEN, str(args.docs),
                        in_dir], check=True, env=env, cwd=REPO,
                       capture_output=True, timeout=3600)

    try:
        raw: dict[int, list] = {}
        levels = tuple(args.cores) if args.cores else (args.n, 4 * args.n)
        for rep in range(args.repeats):
            for cores in levels:
                r = run_worker(cores, in_dir, out_dir, work,
                               partitions, args.shards, args.exchange)
                raw.setdefault(cores, []).append(r)
                print(json.dumps(r), flush=True)

        best = {c: min(rs, key=lambda r: r["wall_sec"])
                for c, rs in raw.items()}
        digests = {r["digest"] for rs in raw.values() for r in rs}
        lo, hi = min(best), max(best)
        eff = ((best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"])
               / (hi / lo)) if hi > lo else 1.0
        print(json.dumps({
            "docs": args.docs, "shards": args.shards,
            "exchange": args.exchange, "cores": sorted(best),
            "partitions": partitions,
            "deterministic_across_levels": len(digests) == 1,
            "best": best,
            "scaling_efficiency": round(eff, 3),
        }, indent=1))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
