#!/usr/bin/env python
"""Per-stage scaling profile: where does the wall go at N vs 4N cores?

Runs ONE (mode, cores) scaling-probe config — the same job as
tools/scaling_bench.py — with the Spark event log enabled, then parses
the log into a per-stage table:

    stage id | name | wall (s) | task-time sum | GC | shuffle W/R MB | tasks

Comparing the tables at two core counts shows exactly which stages
scale and which are the Amdahl serial fraction (a stage whose wall does
not shrink with cores is the bottleneck; driver gaps between stages are
fixed overhead).

Usage:
    python tools/profile_stages.py --mode batch --cores 4 [--docs 1000000]
Prints a JSON line per stage plus a summary; also prints the total
driver "gap" time not covered by any stage.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
mode, cores, in_dir, out_root, evlog = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
from bigdata_event_stream_detection_spark.session import get_spark
from bigdata_event_stream_detection_spark.plans.pipeline import (
    detect_event_stream, small_params)
from bigdata_event_stream_detection_spark.operators import background as bg
from pyspark.sql import functions as F

spark = get_spark("profile-%s-%d" % (mode, cores), cores=cores,
                  shuffle_partitions=96,  # fixed job: 6 x 4N, like the bench
                  extra_conf={
                      "spark.sql.adaptive.coalescePartitions.enabled": "false",
                      "spark.eventLog.enabled": "true",
                      "spark.eventLog.compress": "false",
                      "spark.eventLog.dir": "file://" + evlog,
                  })
params = small_params(num_themes=3, window_length="24 hours",
                      em_iterations=25, min_doc_tokens=5,
                      min_word_corpus_count=2, bw_max_iterations=10,
                      watermark_delay="10 minutes")
seqs = spark.read.parquet(in_dir)
n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]
model = bg.background_model(
    seqs.filter(F.col("n_tok") >= params.min_doc_tokens),
    min_count=params.min_word_corpus_count).toPandas()

if mode == "batch":
    t0 = time.time()
    n_events = detect_event_stream(seqs, params, model=model).count()
    wall = time.time() - t0
else:
    from bigdata_event_stream_detection_spark.streaming.engine import (
        read_sequence_stream, streaming_detect_events, start_event_sink)
    stream = read_sequence_stream(spark, in_dir, max_files_per_trigger=None)
    events = streaming_detect_events(stream, model, params)
    out = out_root + "/out"
    ckpt = out_root + "/ckpt"
    t0 = time.time()
    q = start_event_sink(events, out, ckpt, available_now=True)
    q.awaitTermination(1800)
    wall = time.time() - t0
    n_events = spark.read.parquet(out).count()
print("RESULT " + json.dumps({
    "mode": mode, "cores": cores, "wall_sec": round(wall, 2),
    "t0_epoch_ms": int(t0 * 1000),
    "n_tokens": int(n_tokens), "n_events": n_events}))
spark.stop()
"""


def parse_event_log(evlog_dir: str, t0_ms: int):
    files = sorted(glob.glob(os.path.join(evlog_dir, "**", "*"),
                             recursive=True))
    stages: dict[int, dict] = {}
    for path in files:
        if os.path.isdir(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    st = stages.setdefault(sid, {
                        "task_time": 0, "gc": 0, "sh_w": 0, "sh_r": 0,
                        "py": 0, "tasks": 0, "deser": 0, "ser": 0,
                        "fetch_wait": 0})
                    st["name"] = si["Stage Name"]
                    st["submit"] = si.get("Submission Time", 0)
                    st["complete"] = si.get("Completion Time", 0)
                    st["n_tasks"] = si.get("Number of Tasks", 0)
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {
                        "task_time": 0, "gc": 0, "sh_w": 0, "sh_r": 0,
                        "py": 0, "tasks": 0, "deser": 0, "ser": 0,
                        "fetch_wait": 0})
                    st["tasks"] += 1
                    st["task_time"] += tm.get("Executor Run Time", 0)
                    st["gc"] += tm.get("JVM GC Time", 0)
                    st["deser"] += tm.get("Executor Deserialize Time", 0)
                    st["ser"] += tm.get("Result Serialization Time", 0)
                    sw = tm.get("Shuffle Write Metrics") or {}
                    st["sh_w"] += sw.get("Shuffle Bytes Written", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    st["sh_r"] += (sr.get("Local Bytes Read", 0)
                                   + sr.get("Remote Bytes Read", 0))
                    st["fetch_wait"] += sr.get("Fetch Wait Time", 0)
    rows = []
    for sid in sorted(stages):
        st = stages[sid]
        if "submit" not in st:
            continue
        rows.append({
            "stage": sid,
            "name": st["name"].split("\n")[0][:70],
            "start_s": round((st["submit"] - t0_ms) / 1000, 2),
            "wall_s": round((st["complete"] - st["submit"]) / 1000, 2),
            "task_time_s": round(st["task_time"] / 1000, 2),
            "gc_s": round(st["gc"] / 1000, 2),
            "deser_s": round(st["deser"] / 1000, 2),
            "fetch_wait_s": round(st["fetch_wait"] / 1000, 2),
            "sh_w_mb": round(st["sh_w"] / 1e6, 1),
            "sh_r_mb": round(st["sh_r"] / 1e6, 1),
            "tasks": st["n_tasks"],
        })
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["batch", "stream"], required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--local-dir", default=None,
                    help="spark.local.dir override (e.g. /dev/shm/spark-local)")
    args = ap.parse_args()

    in_dir = os.path.join(tempfile.gettempdir(),
                          f"scale_input_{args.docs}_{args.files}", "sequences")
    if not os.path.exists(os.path.join(in_dir, "_SUCCESS")):
        print(f"missing input {in_dir}; generate via tools/scaling_bench.py",
              file=sys.stderr)
        return 1
    work = tempfile.mkdtemp(prefix="profile_stages_")
    evlog = os.path.join(work, "evlog")
    os.makedirs(evlog, exist_ok=True)
    env = dict(os.environ, PYTHONPATH=REPO,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", VECLIB_MAXIMUM_THREADS="1",
               NUMEXPR_NUM_THREADS="1")
    if args.local_dir:
        env["SPARK_LOCAL_DIRS"] = args.local_dir
        work = tempfile.mkdtemp(prefix="profile_stages_",
                                dir=args.local_dir)
    cmd = [sys.executable, "-c", WORKER, args.mode, str(args.cores),
           in_dir, work, evlog]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{args.cores - 1}"] + cmd
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=REPO, timeout=3600)
    result = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        print(p.stdout[-3000:], p.stderr[-3000:], file=sys.stderr)
        return 1
    rows = parse_event_log(evlog, result["t0_epoch_ms"])
    # only stages inside the timed window
    rows = [r for r in rows if r["start_s"] >= -1]
    print(json.dumps(result))
    hdr = (f"{'stage':>5} {'start':>7} {'wall':>7} {'task_t':>8} {'gc':>6} "
           f"{'deser':>6} {'fwait':>6} {'shW_MB':>8} {'shR_MB':>8} "
           f"{'tasks':>5}  name")
    print(hdr)
    for r in rows:
        print(f"{r['stage']:>5} {r['start_s']:>7} {r['wall_s']:>7} "
              f"{r['task_time_s']:>8} {r['gc_s']:>6} {r['deser_s']:>6} "
              f"{r['fetch_wait_s']:>6} {r['sh_w_mb']:>8} {r['sh_r_mb']:>8} "
              f"{r['tasks']:>5}  {r['name']}")
    covered = sum(r["wall_s"] for r in rows)
    print(f"stage-wall sum {covered:.1f}s of total {result['wall_sec']}s "
          f"(driver gaps {result['wall_sec'] - covered:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
