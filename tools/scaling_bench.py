#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule.

The rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so we run the SAME
job on the SAME input at two local parallelism levels (local[N] vs
local[4N], fresh JVM each) and report throughput at both plus the
efficiency ratio:

    efficiency = (throughput_4N / throughput_N) / 4

Two workloads are measured:
  * stream  — the flagship streaming job: readStream over a pre-written
    sequences dir -> stateful windowed EM/HMM detection -> parquet sink
    (events/sec and docs/sec).
  * batch   — the batch detect_event_stream on the same input.

Each worker runs in a subprocess (its own JVM/SparkSession); this
script orchestrates and writes the table appended to BENCH.md.

Usage: python tools/scaling_bench.py [--n 8] [--docs 20000] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
mode, cores, in_dir, out_root, partitions, io_codec = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]), sys.argv[6])
from bigdata_event_stream_detection_spark.session import get_spark
from bigdata_event_stream_detection_spark.plans.pipeline import (
    detect_event_stream, small_params)
from bigdata_event_stream_detection_spark.operators import background as bg
from pyspark.sql import functions as F

# Shuffle/state partitions are FIXED across core counts (orchestrator
# passes 6 x 4N): a production job's partitioning is part of the job,
# and the N -> 4N executor criterion scales the cluster under an
# unchanged job. 6x the top core count keeps the close sweep's
# per-partition task walls queue-balanceable (balls-in-bins key skew +
# per-window variance; measured: close sweep 42 -> 31 s at 16 cores on
# the 1M-doc probe vs partitions == cores).
# AQE partition coalescing merges the kernel shuffle back to
# bytes-balanced (not CPU-balanced) partitions — off for this job
_extra = {"spark.sql.adaptive.coalescePartitions.enabled": "false"}
if io_codec != "default":
    # shuffle/spill/RocksDB-changelog block codec knob.  The zstd A/B
    # on this job was REJECTED as host noise (the 8-core win did not
    # reproduce; best-vs-best at 16c tied — BENCH.md "IO codec under
    # the shared memory bus"; session default stays lz4).  Kept as a
    # sweep axis for environments that re-measure.
    _extra["spark.io.compression.codec"] = io_codec
spark = get_spark("scale-%s-%d" % (mode, cores), cores=cores,
                  shuffle_partitions=partitions, extra_conf=_extra)
# reference-strength compute (25 EM iters like Parameters.java:40) and
# fat windows (~720 docs / ~100k tokens per 24h window on the synthetic
# fixture) so the measurement is kernel-dominated, not fixed-overhead-
# dominated — the regime a 10^12-sequence corpus actually runs in
params = small_params(num_themes=3, window_length="24 hours",
                      em_iterations=25, min_doc_tokens=5,
                      min_word_corpus_count=2, bw_max_iterations=10,
                      watermark_delay="10 minutes")
seqs = spark.read.parquet(in_dir)
n_docs = seqs.count()
n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]
# the background model is a static side input in the streaming design;
# build it OUTSIDE the timed window for both modes so the two walls
# measure the same thing (windowing + EM + HMM + sink)
model = bg.background_model(
    seqs.filter(F.col("n_tok") >= params.min_doc_tokens),
    min_count=params.min_word_corpus_count).toPandas()

if mode == "batch":
    t0 = time.perf_counter()
    n_events = detect_event_stream(seqs, params, model=model).count()
    wall = time.perf_counter() - t0
else:
    from bigdata_event_stream_detection_spark.streaming.engine import (
        read_sequence_stream, streaming_detect_events, start_event_sink)
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger=None)
    events = streaming_detect_events(stream, model, params)
    out = out_root + "/out_%s_%d" % (mode, cores)
    ckpt = out_root + "/ckpt_%s_%d" % (mode, cores)
    t0 = time.perf_counter()
    q = start_event_sink(events, out, ckpt, available_now=True)
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    n_events = spark.read.parquet(out).count()

print("RESULT " + json.dumps({
    "mode": mode, "cores": cores, "wall_sec": round(wall, 2),
    "n_docs": n_docs, "n_tokens": int(n_tokens), "n_events": n_events,
    "docs_per_sec": round(n_docs / wall, 2),
    "tokens_per_sec": round(n_tokens / wall, 2),
    "events_per_sec": round(n_events / wall, 3),
}))
"""


def run_worker(mode: str, cores: int, in_dir: str, out_root: str,
               partitions: int, local_dir: str | None = None,
               io_codec: str = "default") -> dict:
    # Pin BLAS to one thread per task: otherwise the low-core run's
    # workers silently fan numpy matmuls across ALL machine cores and
    # the comparison measures nothing (also the correct per-executor
    # setting on a real cluster).
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", VECLIB_MAXIMUM_THREADS="1",
               NUMEXPR_NUM_THREADS="1")
    if local_dir:
        # shuffle spill + RocksDB working dirs on a RAM disk: on a real
        # cluster every executor brings its own local NVMe (aggregate
        # local-disk bandwidth scales with executor count); the
        # sandbox's single shared virtio disk does not, which distorts
        # the N vs 4N comparison with an artifact real clusters lack.
        env["SPARK_LOCAL_DIRS"] = local_dir
    # taskset pins the whole process tree (JVM, GC threads, python
    # workers) to `cores` CPUs — emulating an actual `cores`-CPU host
    # rather than a `cores`-thread scheduler on a 4x-larger machine.
    cmd = [sys.executable, "-c", WORKER, mode, str(cores), in_dir, out_root,
           str(partitions), io_codec]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    p = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker {mode}@{cores} produced no RESULT:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="baseline core count N")
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    ap.add_argument("--files", type=int, default=16,
                    help="number of input files (streaming micro-batches)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="sweeps per config; the table reports the MIN wall")
    ap.add_argument("--local-dir", default=None,
                    help="spark.local.dir + sink/checkpoint root override "
                         "(e.g. /dev/shm/spark-local to model per-executor "
                         "local disks)")
    ap.add_argument("--modes", default="stream,batch",
                    help="comma-separated subset of {stream,batch}")
    ap.add_argument("--io-codec", default="default",
                    help="spark.io.compression.codec override (e.g. "
                         "zstd); 'default' keeps Spark's lz4")
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle/state partition count, FIXED across core "
                         "counts (default 6 x 4N). Finer partitions shrink "
                         "the straggler tail at 4N cores now that the "
                         "fork-server daemon removed the per-task import "
                         "tax; coarser ones cut per-task Arrow overhead.")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="scale_bench_", dir=args.local_dir)
    # deterministic input cache: repeated bench invocations with the
    # same (docs, files) reuse the generated corpus — generation is
    # minutes of CPU at 10^6 docs and the data is seed-deterministic
    in_dir = os.path.join(tempfile.gettempdir(),
                          f"scale_input_{args.docs}_{args.files}",
                          "sequences")
    env = dict(os.environ, PYTHONPATH=REPO)
    gen = f"""
import sys
from bigdata_event_stream_detection_spark.session import get_spark
from bigdata_event_stream_detection_spark.sources.synthetic import generate_sequences
spark = get_spark("gen", cores=32)
df = generate_sequences(spark, {args.docs}, late_fraction=0.0, partitions={args.files})
# repartitionByRange keeps each part-file a contiguous time slice
# (orderBy().coalesce() interleaves ranges across files, which makes
# incremental-trigger streaming runs structurally late-drop data)
(df.repartitionByRange({args.files}, "event_time")
   .sortWithinPartitions("event_time")
   .write.mode("overwrite").parquet({in_dir!r}))
"""
    if not os.path.exists(os.path.join(in_dir, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", gen], check=True, env=env,
                       cwd=REPO, capture_output=True, timeout=3600)
    # chronological mtimes so the file stream processes time slices in
    # event-time order (mtime ties otherwise randomize batch order)
    import glob as _glob
    import time as _time
    t = _time.time()
    for i, f in enumerate(sorted(_glob.glob(in_dir + "/part-*.parquet"))):
        os.utime(f, (t + i, t + i))

    # Interleave whole sweeps (every config once per round) so host
    # contention drift averages across configs instead of biasing one;
    # report the MINIMUM wall per config (least-contended observation).
    raw: dict[tuple, list] = {}
    for rep in range(args.repeats):
        for mode in args.modes.split(","):
            for cores in (args.n, 4 * args.n):
                # fresh out/ckpt root per repeat: a reused streaming
                # checkpoint would "resume" a finished query and
                # measure a no-op
                r = run_worker(mode, cores, in_dir,
                               os.path.join(work, f"rep{rep}"),
                               partitions=args.partitions or 6 * 4 * args.n,
                               local_dir=args.local_dir,
                               io_codec=args.io_codec)
                raw.setdefault((mode, cores), []).append(r)
                print(json.dumps(r))
    results = [min(v, key=lambda r: r["wall_sec"]) for v in raw.values()]

    lines = [
        "",
        "## Scaling efficiency (N vs 4N parallelism, same input, same seed)",
        "",
        f"Input: {args.docs} synthetic docs "
        f"({results[0]['n_tokens']} tokens), planted-HMM fixture; "
        "24h tumbling windows (~720 docs/window); identical job + data "
        f"at both levels (fresh JVM per run; min of {args.repeats} "
        f"interleaved sweeps; io codec {args.io_codec}).",
        "",
        "| job | cores | best wall (s) | docs/s | tokens/s | all walls (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        walls = ", ".join(str(x["wall_sec"])
                          for x in raw[(r["mode"], r["cores"])])
        lines.append(
            f"| {r['mode']} | {r['cores']} | {r['wall_sec']} | "
            f"{r['docs_per_sec']} | {r['tokens_per_sec']} | {walls} |")
    lines.append("")
    for mode in args.modes.split(","):
        rs = {r["cores"]: r for r in results if r["mode"] == mode}
        lo, hi = min(rs), max(rs)
        eff = (rs[hi]["tokens_per_sec"] / rs[lo]["tokens_per_sec"]) / (hi / lo)
        evs = sorted({x["n_events"] for x in raw[(mode, lo)] +
                      raw[(mode, hi)]})
        lines.append(
            f"- **{mode}**: {rs[lo]['tokens_per_sec']:.0f} tok/s @ local[{lo}] "
            f"-> {rs[hi]['tokens_per_sec']:.0f} tok/s @ local[{hi}]; "
            f"scaling efficiency **{eff:.2f}** "
            f"({'meets' if eff >= 0.8 else 'below'} the >=0.8 criterion); "
            f"event rows across cores+repeats: {evs} "
            f"({'deterministic' if len(evs) == 1 else 'NONDETERMINISTIC'})")
    lines.append("")
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
