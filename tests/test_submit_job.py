"""The cluster launch path, for real: run tools/submit_job.py through
``spark-submit --py-files <zip>`` as a subprocess — the exact command
shape the north rule requires — in batch mode and in streaming
--available-now mode, and check the two emit the same event rows.

PYTHONPATH is stripped from the child environment, so the package can
only resolve from the --py-files zip: this test fails if the zip
packaging or the driver/executor py-files wiring breaks.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time
import zipfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bigdata_event_stream_detection_spark"

ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
    ("event_time", pa.timestamp("us")),
])


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__),
                        "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def _build_zip(dst: str) -> str:
    zpath = os.path.join(dst, "besd.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_batch_and_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_event_stream_detection_spark.operators import (
        background as bg,
    )
    from bigdata_event_stream_detection_spark.sources.synthetic import (
        generate_sequences,
    )

    # --- fixture: chronological input chunks + watermark sentinel ----
    pdf = (generate_sequences(spark, 300, late_fraction=0.0, partitions=4)
           .toPandas().sort_values("event_time").reset_index(drop=True))
    in_dir = str(tmp_path / "input")
    os.makedirs(in_dir)
    bounds = [round(i * len(pdf) / 3) for i in range(4)]
    t0 = time.time()
    for i in range(3):
        f = os.path.join(in_dir, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=ARROW_SCHEMA,
            preserve_index=False), f)
        os.utime(f, (t0 + i, t0 + i))
    sent = pd.DataFrame({
        "doc_id": ["SENTINEL-0"], "tokens": [[0, 1, 2]], "n_tok": [3],
        "source": ["GDL"],
        "event_time": [pdf["event_time"].max() + pd.Timedelta(days=30)]})
    f = os.path.join(in_dir, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=ARROW_SCHEMA, preserve_index=False), f)
    os.utime(f, (t0 + 9, t0 + 9))

    bg_dir = str(tmp_path / "background")
    bg.background_model(
        spark.createDataFrame(pdf).filter(F.col("n_tok") >= 5),
        min_count=2).write.parquet(bg_dir)

    zpath = _build_zip(str(tmp_path))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

    def submit(mode: str, out: str, extra: list[str]) -> None:
        cmd = [
            _spark_submit(), "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", in_dir, "--output", out,
            "--checkpoint", str(tmp_path / f"ckpt_{mode}"),
            "--background", bg_dir,
            "--mode", mode, "--preset", "small",
            "--window", "1 hour", "--watermark", "10 minutes",
            "--themes", "3",
        ] + extra
        p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=str(tmp_path), timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]

    batch_out = str(tmp_path / "events_batch")
    submit("batch", batch_out, [])
    stream_out = str(tmp_path / "events_stream")
    submit("stream", stream_out,
           ["--available-now", "--max-files-per-trigger", "1"])

    key = ["window_start", "source", "theme_id", "strength"]
    b = spark.read.parquet(batch_out)
    s = spark.read.parquet(stream_out)
    b_rows = sorted(map(tuple, b.select(*key).collect()))
    s_rows = sorted(map(tuple, s.select(*key).collect()))
    assert len(b_rows) > 0
    # the launch-path parity invariant: the spark-submit streaming job
    # emits exactly the spark-submit batch job's event rows
    assert s_rows == b_rows
