"""Fork-server daemon that preloads the heavy Python dependencies.

Stock ``pyspark.daemon`` forks one worker per task; each fresh worker
then pays the pandas/pyarrow/numpy import before the first Arrow batch
flows (~1.5 s wall, ~5 s CPU — mostly kernel time page-faulting the
shared libraries in). Measured on the 1M-doc scaling probe this import
tax is a *fixed cost per task*: at 96 shuffle partitions it was ~35% of
ALL executor CPU at 16 cores, and because task count scales with the
partition count it anti-scales the N -> 4N efficiency measurement.

Importing the heavy modules HERE — in the daemon, before any fork —
means every forked worker inherits them copy-on-write: the per-task
import cost drops to (re-binding already-loaded sys.modules entries)
microseconds. This is the standard fork-server trick; wired in via
``spark.python.daemon.module`` (session.py). The package itself (and
its operator kernels) is preloaded too, so UDF closure unpickling
resolves modules without disk I/O.

On a real multi-executor cluster the same config ships via
``spark-submit --conf spark.python.daemon.module=... --py-files ...``
(tools/submit_job.py); the daemon runs once per executor.
"""

# Preload order: the C-extension giants first (they page-fault the
# most shared-library bytes), then the package modules workers unpickle.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # worker-side Arrow serde paths that pyspark lazily imports
    import pyarrow.compute  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # pragma: no cover - version-dependent, best-effort
    pass

try:  # our kernels: .so load (content-cached) happens once, pre-fork
    from bigdata_event_stream_detection_spark.operators import (  # noqa
        dedup, em, hmm, kernels, kernels_native, multimodal, similarity)
except Exception:  # pragma: no cover - package not on worker path
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
