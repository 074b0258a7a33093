"""Reused-worker entry point that skips the per-task zip-directory rescan.

Activated via the public ``spark.python.worker.module`` conf (set by
``session.get_spark``): the pyspark daemon runs ``python -m pyspark.daemon
pyspark_fastworker`` and forks workers whose per-task loop is this module's
``main`` — upstream ``pyspark.worker.main`` with one targeted fix.

Why: upstream ``worker_util.setup_spark_files`` ends every task with an
unconditional ``importlib.invalidate_caches()``. When pyspark is imported
from a zip (the stock ``$SPARK_HOME/python/lib/pyspark.zip`` layout, as on
this host), that call makes ``zipimport`` re-read the archive's entire
central directory — measured here at ~0.15-0.2 CPU-seconds PER TASK in
every reused worker (cProfile via this same worker-module hook: 57% of
total worker CPU; an identity ``mapInPandas`` over 32 partitions burns
~7 CPU-s/run, ~0.22 CPU-s/task, independent of row count). The
invalidation exists so that python includes shipped later (``addPyFile``
mid-session) become importable in already-running workers; invalidating
when the includes set is UNCHANGED buys nothing — the worker's sys.path
was already built from exactly these paths on a previous task.

The fix: re-read the same socket protocol upstream reads (byte-for-byte —
see ``pyspark.worker_util.setup_spark_files``, pinned Spark 4.1.2), but
call ``importlib.invalidate_caches()`` only when ``(spark_files_dir,
includes)`` differs from the previous task's. The first task in every
worker still invalidates (memo starts empty), and any ``addPyFile`` /
``--py-files`` change fires a full invalidation, preserving upstream
semantics for the one case the call serves.

Fallback safety: this module must import in the daemon with nothing but
pyspark on the path (no numpy/pandas, no package imports). If it is
missing from the daemon's PYTHONPATH entirely, Spark never sees the conf
target and jobs would fail loudly — so ``session.get_spark`` only opts in
when it can put this file's directory on the executor PYTHONPATH.
"""

from __future__ import annotations

import importlib
import os

import pyspark

# The memoized setup re-reads worker_util.setup_spark_files's socket
# protocol byte-for-byte, so it is pinned to the pyspark versions it was
# verified against. session._fastworker_conf refuses to opt in on any
# other version (graceful); this assert is the loud defense-in-depth for
# anyone wiring the conf by hand — a silent protocol desync corrupts the
# worker handshake, which is far worse than a failed import.
_PINNED_PYSPARK = ("4.1.2",)
if pyspark.__version__ not in _PINNED_PYSPARK:
    raise ImportError(
        f"pyspark_fastworker is pinned to pyspark {_PINNED_PYSPARK} "
        f"(found {pyspark.__version__}); refusing to run an unverified "
        "socket protocol — unset spark.python.worker.module to use the "
        "stock worker"
    )

import pyspark.worker as _worker
import pyspark.worker_util as _wu

# (spark_files_dir, dir_mtime, tuple(includes)) from the previous task in
# this worker. dir_mtime covers the one upstream case a pure includes key
# misses: sc.addFile() of a bare .py lands IN spark_files_dir without
# changing the includes list (ADVICE r13) — a new file bumps the
# directory mtime, so one cheap stat per task restores that invalidation.
_last_includes: tuple | None = None


def _setup_spark_files_memo(infile) -> None:
    """Drop-in for ``worker_util.setup_spark_files`` (same socket reads, in
    the same order), invalidating import caches only on includes change."""
    global _last_includes

    spark_files_dir = _wu.utf8_deserializer.loads(infile)

    if not _wu.is_remote_only():
        from pyspark.core.files import SparkFiles

        SparkFiles._root_directory = spark_files_dir
        SparkFiles._is_running_on_worker = True

    _wu.add_path(spark_files_dir)
    includes = [
        _wu.utf8_deserializer.loads(infile)
        for _ in range(_wu.read_int(infile))
    ]
    for filename in includes:
        _wu.add_path(os.path.join(spark_files_dir, filename))

    try:
        dir_mtime = os.stat(spark_files_dir).st_mtime_ns
    except OSError:
        dir_mtime = -1
    key = (spark_files_dir, dir_mtime, tuple(includes))
    if key != _last_includes:
        importlib.invalidate_caches()
        _last_includes = key


# worker.py binds the name at import (`from pyspark.worker_util import
# setup_spark_files`), so patch the binding worker.main actually calls.
_worker.setup_spark_files = _setup_spark_files_memo

main = _worker.main

if __name__ == "__main__":
    # mirror pyspark.worker's standalone entry so non-daemon mode
    # (spark.python.use.daemon=false) works identically
    conn_info = os.environ.get(
        "PYTHON_WORKER_FACTORY_SOCK_PATH",
        int(os.environ.get("PYTHON_WORKER_FACTORY_PORT", -1)),
    )
    auth_secret = os.environ.get("PYTHON_WORKER_FACTORY_SECRET")
    from pyspark.util import local_connect_and_auth

    (sock_file, _) = local_connect_and_auth(conn_info, auth_secret)
    from pyspark.serializers import write_int

    write_int(os.getpid(), sock_file)
    sock_file.flush()
    try:
        main(sock_file, sock_file)
    finally:
        sock_file.close()
