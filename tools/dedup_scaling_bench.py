#!/usr/bin/env python
"""Scaling evidence for the token-bounded dedup family
(``dedup.duplicate_spans`` — gram hash + doc-freq agg + equi-join +
coverage agg; the same exchange shapes as minhash/jaccard/span-cut).

Method identical to tools/scaling_bench.py / funnel_scaling_bench.py:
identical job + deterministic synthetic input at local[N] vs local[4N],
fresh JVM per run, taskset-pinned, single-threaded BLAS, FIXED shuffle
partitions across core counts, min wall over interleaved repeats,

    efficiency = (throughput_4N / throughput_N) / 4

Input: hash-deterministic documents of 4-letter pseudo-words; 20% of
docs carry a shared 16-word boilerplate tail, so the duplicated-gram
join has real (skewed) work. Output totals must be IDENTICAL at every
core count (the determinism gate).

Usage: python tools/dedup_scaling_bench.py [--n 4] [--docs 300000]
           [--repeats 2] [--local-dir /dev/shm/...]
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
import sys
docs, in_dir = int(sys.argv[1]), sys.argv[2]
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("gen-dedup", cores=32)
word = ("concat(char(97 + pmod(xxhash64(id, i, {j}), 26)),"
        "char(97 + pmod(xxhash64(id, i, {k}), 26)),"
        "char(97 + pmod(xxhash64(id, i, {l}), 26)),"
        "char(97 + pmod(xxhash64(id, i, {m}), 26)))")
w = word.format(j=1, k=2, l=3, m=4)
BOILER = ("all rights reserved unauthorized reproduction of this "
          "material without express written permission is strictly "
          "prohibited contact support")
df = (spark.range(docs)
      .select(F.col("id").alias("doc_id"),
              F.when(F.col("id") % 5 == 0,
                     F.concat(F.expr(
                         "array_join(transform(sequence(1, 64), i -> "
                         + w + "), ' ')"), F.lit(" " + BOILER)))
               .otherwise(F.expr(
                   "array_join(transform(sequence(1, 80), i -> "
                   + w + "), ' ')")).alias("text")))
df.repartition(32).write.mode("overwrite").parquet(in_dir)
print("GENERATED", spark.read.parquet(in_dir).count())
"""

WORKER = r"""
import json, sys, time
cores, in_dir, partitions = (int(sys.argv[1]), sys.argv[2],
                             int(sys.argv[3]))
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("dedup-%d" % cores, cores=cores,
                  shuffle_partitions=partitions,
                  extra_conf={
                      "spark.sql.adaptive.coalescePartitions.enabled":
                      "false"})
from bigdata_event_stream_detection_spark.operators.dedup import (
    duplicate_spans)
docs = spark.read.parquet(in_dir)
t0 = time.perf_counter()
agg = (duplicate_spans(docs, n=8)
       .agg(F.count("*").alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("dup_tokens").alias("dup_tokens")).collect()[0])
wall = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "cores": cores, "wall_sec": round(wall, 2),
    "rows": agg["rows"], "tokens": int(agg["tokens"]),
    "dup_tokens": int(agg["dup_tokens"]),
    "tokens_per_sec": round(agg["tokens"] / wall, 1)}))
"""


def run_worker(cores, in_dir, work, partitions):
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    env["SPARK_LOCAL_DIRS"] = work
    cmd = [sys.executable, "-c", WORKER, str(cores), in_dir,
           str(partitions)]
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
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--local-dir", default=None)
    args = ap.parse_args()

    partitions = 6 * 4 * args.n
    work = tempfile.mkdtemp(prefix="dedup_bench_", dir=args.local_dir)
    in_dir = os.path.join(tempfile.gettempdir(),
                          f"dedup_input_{args.docs}", "docs")
    env = dict(os.environ, PYTHONPATH=REPO)
    if not os.path.exists(in_dir):
        subprocess.run([sys.executable, "-c", GEN, str(args.docs),
                        in_dir], check=True, env=env, cwd=REPO,
                       capture_output=True, timeout=3600)

    raw: dict[int, list] = {}
    for rep in range(args.repeats):
        for cores in (args.n, 4 * args.n):
            r = run_worker(cores, in_dir, work, partitions)
            raw.setdefault(cores, []).append(r)
            print(json.dumps(r), flush=True)

    best = {c: min(rs, key=lambda r: r["wall_sec"])
            for c, rs in raw.items()}
    checks = {(r["rows"], r["tokens"], r["dup_tokens"])
              for rs in raw.values() for r in rs}
    eff = (best[4 * args.n]["tokens_per_sec"]
           / best[args.n]["tokens_per_sec"]) / 4
    print(json.dumps({
        "docs": args.docs,
        "deterministic_across_levels": len(checks) == 1,
        "best": best,
        "scaling_efficiency": round(eff, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
