"""SparkSession builder with scale-oriented defaults.

Test/bench runs use ``local[N]``; the configuration is written for a real
multi-executor cluster (AQE + skew-join splitting + Arrow batching).  Nothing
here assumes single-node execution.
"""

import os

from pyspark.sql import SparkSession


def release_persisted(pins: list) -> int:
    """Drain a list of persisted DataFrames, unpersisting each (non-blocking)
    and swallowing failures from an already-stopped session; returns the
    number released.  Shared by every owner-scoped pin registry (curation
    ranking layouts, storeless incremental stage frames) so the release
    semantics stay in one place."""
    released = 0
    while pins:
        try:
            pins.pop().unpersist(False)
            released += 1
        except Exception:  # noqa: BLE001 — session already stopped
            pass
    return released


# process-wide registry of frames persisted by operators whose plans fan
# out into multiple branches (the enriched frame in score_timemap_measures,
# the token projection in score_collection_measures): without the persist
# the extract/tokenize UDF lineage would re-run once per branch, and
# without the registry a long-lived session would accumulate the cached
# frames with no release handle (same hazard curation's ranking-pin
# registry exists for)
_SESSION_PINS: list = []


def pin_for_session(df):
    """Persist ``df`` and register it for :func:`release_session_pins`."""
    _SESSION_PINS.append(df.persist())
    return _SESSION_PINS[-1]


def release_session_pins() -> int:
    """Unpersist every operator-pinned frame; call between batches in a
    long-lived session (or use ``spark.catalog.clearCache()``).  Safe once
    the frames built so far have been consumed."""
    return release_persisted(_SESSION_PINS)


def get_spark(
    app_name: str = "otmt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate synthesizes size(arr)>0 filters above
        # every Generate; when the array is a Python-UDF column the filter
        # is then pushed below the enrichment exchange and re-evaluates the
        # whole UDF chain on the narrow pre-shuffle side (guide §4.4
        # duplication — measured: a full single-threaded extract+tokenize+
        # minhash pass per band-table build).  Every explode in this engine
        # runs over derived/UDF arrays where the inferred filter can never
        # reach a file scan, so the rule only costs here.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Arrow transfer for every pandas UDF / applyInPandas kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else max(int(cpus) * 2, 8)),
        )
        # keep partition sizes bounded when scanning wide binary (html) columns
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill scratch on tmpfs when available: the sandbox's virtio
    # disk has bursty throughput that shows up as bimodal shuffle times;
    # a real cluster provisions local NVMe for exactly this reason
    shm = os.environ.get("SPARK_LOCAL_DIRS_OVERRIDE", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    # pre-session settings (executor memory/env for local-cluster or a real
    # cluster manager) must land before getOrCreate
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
