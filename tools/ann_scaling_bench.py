#!/usr/bin/env python
"""Scaling evidence for the Arrow/GEMM similarity family
(``similarity.cosine_topk`` — mapInPandas batch GEMM + map-side
partial top-k; the execution shape shared by pq_topk / ivf_topk /
embedding_kmeans / the EM E-step's dense path).

This is the PYTHON-BOUNDARY family: unlike the codegen dedup spine,
every row crosses Arrow into numpy workers, so the bench measures
whether the per-task worker model (fork + preloaded daemon imports +
Arrow batching) scales with cores — the question a 1000-executor GEMM
scan lives on.

Method identical to the other scaling benches: identical job +
deterministic synthetic input at local[N] vs local[4N], fresh JVM per
run, taskset-pinned, single-threaded BLAS (the scaling must come from
Spark tasks, not nested BLAS threads), FIXED partitions, min wall over
interleaved repeats,

    efficiency = (throughput_4N / throughput_N) / 4

Output top-k rows must be IDENTICAL at every core count.

Usage: python tools/ann_scaling_bench.py [--n 4] [--vectors 4000000]
           [--dim 128] [--queries 64] [--repeats 2] [--local-dir ...]
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
n, dim, in_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("gen-ann", cores=32)
vec = ("transform(sequence(1, %d), i -> "
       "cast(pmod(xxhash64(id, i), 2001) / 1000.0 - 1.0 as float))"
       % dim)
df = spark.range(n).select(
    F.col("id").alias("vec_id"), F.expr(vec).alias("embedding"))
df.repartition(96).write.mode("overwrite").parquet(in_dir)
print("GENERATED", spark.read.parquet(in_dir).count())
"""

WORKER = r"""
import json, sys, time
cores, in_dir, partitions, n_q, k = (int(sys.argv[1]), sys.argv[2],
                                     int(sys.argv[3]), int(sys.argv[4]),
                                     int(sys.argv[5]))
from bigdata_event_stream_detection_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("ann-%d" % cores, cores=cores,
                  shuffle_partitions=partitions,
                  extra_conf={
                      "spark.sql.adaptive.coalescePartitions.enabled":
                      "false"})
from bigdata_event_stream_detection_spark.operators.similarity import (
    cosine_topk)
emb = spark.read.parquet(in_dir)
n_vec = emb.count()   # warm the scan metadata; counted outside t0
queries = emb.filter(F.col("vec_id") < n_q)
t0 = time.perf_counter()
rows = (cosine_topk(emb, queries, k=k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos", 6).alias("cos"))
        .collect())
wall = time.perf_counter() - t0
import hashlib
digest = hashlib.md5(repr(sorted(map(tuple, rows))).encode()).hexdigest()
print("RESULT " + json.dumps({
    "cores": cores, "wall_sec": round(wall, 2), "rows": len(rows),
    "digest": digest, "n_vec": n_vec,
    "vectors_per_sec": round(n_vec / wall, 1)}))
"""


def run_worker(cores, in_dir, work, partitions, n_q, k):
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    env["SPARK_LOCAL_DIRS"] = work
    cmd = [sys.executable, "-c", WORKER, str(cores), in_dir,
           str(partitions), str(n_q), str(k)]
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
    ap.add_argument("--vectors", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--local-dir", default=None)
    args = ap.parse_args()

    partitions = 6 * 4 * args.n
    work = tempfile.mkdtemp(prefix="ann_bench_", dir=args.local_dir)
    in_dir = os.path.join(tempfile.gettempdir(),
                          f"ann_input_{args.vectors}_{args.dim}", "emb")
    env = dict(os.environ, PYTHONPATH=REPO)
    if not os.path.exists(in_dir):
        subprocess.run([sys.executable, "-c", GEN, str(args.vectors),
                        str(args.dim), in_dir], check=True, env=env,
                       cwd=REPO, capture_output=True, timeout=3600)

    raw: dict[int, list] = {}
    for rep in range(args.repeats):
        for cores in (args.n, 4 * args.n):
            r = run_worker(cores, in_dir, work, partitions,
                           args.queries, args.k)
            raw.setdefault(cores, []).append(r)
            print(json.dumps(r), flush=True)

    best = {c: min(rs, key=lambda r: r["wall_sec"])
            for c, rs in raw.items()}
    digests = {r["digest"] for rs in raw.values() for r in rs}
    eff = (best[4 * args.n]["vectors_per_sec"]
           / best[args.n]["vectors_per_sec"]) / 4
    print(json.dumps({
        "vectors": args.vectors, "dim": args.dim,
        "deterministic_across_levels": len(digests) == 1,
        "best": best,
        "scaling_efficiency": round(eff, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
