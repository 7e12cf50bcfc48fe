"""PySpark worker daemon with the Arrow stack preloaded.

Python workers are forked from the daemon process on demand, and the
worker pool is culled after a hard-coded 60 s idle timeout
(``PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS``).  Every freshly forked
worker that runs a pandas/Arrow kernel then imports numpy + pandas +
pyarrow from scratch — ~1-3 s of pure interpreter work per worker,
multiplied by every concurrent worker on the machine, re-paid after
every idle cull.  On a 32-core local run that is a multi-second storm
at the start of every Arrow-kernel query that follows a >60 s gap; on a
real cluster it is the same tax on every executor whenever the workload
is bursty.

Preloading the heavy modules HERE means workers inherit them through
``fork`` (copy-on-write, zero per-worker cost).  This is the documented
``spark.python.daemon.module`` extension point; everything else
delegates to the stock ``pyspark.daemon`` manager loop.

``session.get_spark`` wires this up (and puts the repo root on
PYTHONPATH for the daemon process); non-fork platforms (Windows) never
use the daemon, so the conf is harmless there.
"""

# Workers fork from this process: modules imported here are inherited
# copy-on-write by every worker, paying the import exactly once per
# executor instead of once per worker per idle-cull.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
