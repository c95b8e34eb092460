"""Stage checkpointing with per-partition lineage, ATOMIC snapshot commits,
and commit markers (resume + reader isolation).

The reference's resumability is a directory store reloaded via metadata.csv
manifests (otmt/collectionmodel.py:143-234).  Here every pipeline stage write
is a SNAPSHOT commit with Iceberg-style semantics (implemented directly,
since the sandbox has no Iceberg runtime jar):

- each commit writes parquet into a fresh ``<stage>/v{N}`` directory carrying
  lineage columns ``(run_id, stage, _partition_id)``;
- the stage's ``_COMMIT.json`` marker (row/partition counters + the committed
  data path) is swung with ``os.replace`` — POSIX-atomic, so a reader NEVER
  observes a half-written table: a kill mid-write leaves an orphan version
  directory and the previous snapshot fully intact;
- re-writing a stage is snapshot isolation for concurrent readers: the old
  version's files are never touched, only the marker moves;
- old versions remain addressable (``read(stage, version=n)`` /
  ``versions(stage)``) — time travel for debugging a resumed run.

A killed job relaunched with the same ``checkpoint_root`` skips every
committed stage (north_rule: "checkpoints signatures, candidate edges and
cluster ids ... with per-partition lineage and counters so a killed job
resumes mid-pipeline").

Format note: on a cluster with the Iceberg runtime jar, the same layer maps
onto catalog tables (``writeTo(...).createOrReplace()`` — Iceberg's own
snapshot commit); the versioned-directory implementation is the tested path
and provides the same commit atomicity / isolation / time-travel contract.
"""

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 6+ digits: the formatter zero-pads to 6 but emits wider past v999999 —
# the parser must accept every width the formatter can produce
_VDIR = re.compile(r"^v(\d{6,})$")


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run-0"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _version_dir(self, stage: str, version: int) -> str:
        return os.path.join(self._stage_dir(stage), f"v{version:06d}")

    def _marker(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._COMMIT.json")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self._marker(stage))

    def versions(self, stage: str) -> list:
        """All fully-written snapshot versions of a stage (ascending)."""
        stage_dir = self._stage_dir(stage)
        if not os.path.isdir(stage_dir):
            return []
        out = []
        for name in os.listdir(stage_dir):
            match = _VDIR.match(name)
            if match and os.path.exists(
                    os.path.join(stage_dir, name, "_info.json")):
                out.append(int(match.group(1)))
        return sorted(out)

    def _next_version(self, stage: str) -> int:
        stage_dir = self._stage_dir(stage)
        existing = [0]
        if os.path.isdir(stage_dir):
            existing += [int(m.group(1)) for m in
                         (_VDIR.match(n) for n in os.listdir(stage_dir)) if m]
        return max(existing) + 1

    def write(self, df: DataFrame, stage: str) -> DataFrame:
        """Snapshot-commit a stage: fresh version directory, per-partition
        counters, then one atomic marker swing."""
        lineage = (
            df.withColumn("_partition_id", F.spark_partition_id())
            .withColumn("_run_id", F.lit(self.run_id))
            .withColumn("_stage", F.lit(stage))
        )
        version = self._next_version(stage)
        path = self._version_dir(stage, version)
        lineage.write.mode("errorifexists").parquet(path)

        persisted = self.spark.read.parquet(path)
        per_partition = [
            {"partition_id": r._partition_id, "rows": r["count"]}
            for r in persisted.groupBy("_partition_id").count().collect()
        ]
        marker = {
            "stage": stage,
            "run_id": self.run_id,
            "version": version,
            "data_path": path,
            "rows": sum(p["rows"] for p in per_partition),
            "partitions": len(per_partition),
            "per_partition_rows": sorted(per_partition,
                                         key=lambda p: p["partition_id"]),
            "committed_at_monotonic": time.monotonic_ns(),
            "committed_at_unix": time.time(),
        }
        # version info first (declares the directory fully written), then the
        # atomic marker swing — the commit point
        with open(os.path.join(path, "_info.json"), "w") as fh:
            json.dump(marker, fh, indent=2)
        tmp = self._marker(stage) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(marker, fh, indent=2)
        os.replace(tmp, self._marker(stage))
        return persisted.drop("_partition_id", "_run_id", "_stage")

    def read(self, stage: str, version: int | None = None) -> DataFrame:
        """The committed snapshot (or an explicit older version: time
        travel). Only data the marker/_info declares complete is readable.

        The data path derives from THIS store's root + the marker's version
        — never from the write-time path string — so a relocated checkpoint
        tree (copied root, different cwd for a relative root) resumes in
        place.  Markers from the pre-versioned format (no ``version`` key)
        fall back to the legacy flat ``<root>/<stage>`` layout."""
        if version is None:
            version = self.marker(stage).get("version")
            if version is None:  # legacy flat layout
                return (
                    self.spark.read.parquet(self._stage_dir(stage))
                    .drop("_partition_id", "_run_id", "_stage")
                )
            path = self._version_dir(stage, version)
        else:
            path = self._version_dir(stage, version)
            if not os.path.exists(os.path.join(path, "_info.json")):
                raise FileNotFoundError(
                    f"stage {stage!r} has no committed version {version}")
        return (
            self.spark.read.parquet(path)
            .drop("_partition_id", "_run_id", "_stage")
        )

    def marker(self, stage: str) -> dict:
        with open(self._marker(stage)) as fh:
            return json.load(fh)

    def expire_snapshots(self, stage: str, keep: int = 1) -> list:
        """Iceberg-style maintenance: delete all but the newest ``keep``
        committed versions (never the marker's current one) plus any orphan
        version directories from torn writes.  Returns the removed paths."""
        import shutil

        keep = max(1, keep)
        committed = self.versions(stage)
        current = self.marker(stage).get("version") \
            if self.is_committed(stage) else None
        keep_set = set(committed[-keep:])
        if current is not None:
            keep_set.add(current)
        removed = []
        stage_dir = self._stage_dir(stage)
        if os.path.isdir(stage_dir):
            for name in os.listdir(stage_dir):
                match = _VDIR.match(name)
                if match and int(match.group(1)) not in keep_set:
                    path = os.path.join(stage_dir, name)
                    shutil.rmtree(path)
                    removed.append(path)
        return removed

    def run_stage(self, stage: str, build) -> DataFrame:
        """Return the committed stage table, computing it only if missing —
        the resume contract: relaunch skips completed stages."""
        if self.is_committed(stage):
            return self.read(stage)
        return self.write(build(), stage)
