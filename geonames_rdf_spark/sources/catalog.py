"""Table catalog: Iceberg when available, partitioned parquet fallback.

The production design targets Iceberg (snapshot isolation, partition
overwrite for exact resume, hidden partitioning on url-hash buckets).
This container ships no Iceberg runtime jar, so the writer degrades to
dynamic-partition-overwrite parquet with the same call shape — the
semantics the lineage/resume layer relies on (idempotent per-bucket
overwrite) hold in both backends.

The VERSIONED api below additionally emulates Iceberg's snapshot-commit
model honestly on a plain filesystem: every write lands in a new
immutable version directory and the commit is ONE atomic pointer swap
(`os.replace` of the `_CURRENT` marker), giving

- reader isolation — a reader that resolved the pointer keeps scanning
  its version even while a writer commits the next one;
- time travel — `read_table_versioned(..., snapshot=N)`;
- snapshot expiry — `expire_snapshots` retires old version dirs, the
  Iceberg maintenance operation.

Single-filesystem semantics: concurrent writers are serialized by the
atomic `mkdir` of the version directory (loser retries with the next
version number); cross-node object stores need the real Iceberg catalog.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def write_table(
    df: DataFrame,
    path_or_table: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> str:
    """Write a table; returns the backend used ('iceberg' | 'parquet')."""
    spark = df.sparkSession
    if iceberg_available(spark) and not path_or_table.startswith("/"):
        (df.writeTo(path_or_table).using("iceberg")
           .partitionedBy(*[F.col(c) for c in partition_cols])
           .createOrReplace())
        return "iceberg"
    # dynamic overwrite scoped to THIS writer — a session-conf mutation
    # would silently change every later partitioned overwrite
    w = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path_or_table)
    return "parquet"


def read_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    if path_or_table.startswith("/"):
        return spark.read.parquet(path_or_table)
    return spark.read.table(path_or_table)


# --- snapshot-committed (versioned) tables ---------------------------------

_PTR = "_CURRENT"


def current_snapshot(path: str) -> int | None:
    try:
        with open(os.path.join(path, _PTR)) as f:
            return int(json.load(f)["version"])
    except (FileNotFoundError, NotADirectoryError):
        return None


def table_snapshots(path: str) -> list[int]:
    """Version numbers present on disk (ascending)."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith("v=") and os.path.isdir(os.path.join(path, d)):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def write_table_versioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Snapshot commit: write an immutable ``v=N`` directory, then swap
    the ``_CURRENT`` pointer atomically.  Returns the committed version.

    A reader that already resolved the pointer is unaffected by the
    commit (its version dir is immutable until expiry) — the snapshot
    isolation Iceberg gives, emulated with rename atomicity.
    """
    os.makedirs(path, exist_ok=True)
    v = (current_snapshot(path) or max(table_snapshots(path), default=0))
    while True:
        v += 1
        vdir = os.path.join(path, f"v={v}")
        try:
            os.mkdir(vdir)  # atomic claim: concurrent writers serialize here
            break
        except FileExistsError:
            continue
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(vdir)
    _commit_pointer(path, v)
    return v


def _commit_pointer(path: str, v: int) -> None:
    """MONOTONIC pointer swap: the mkdir claim serializes version
    NUMBERS, not commit ORDER.  If the writer holding v=N+1 commits
    first, a later os.replace from the v=N writer must not move the
    pointer backwards (that would silently discard the newer snapshot
    from "current").  Re-check under a brief retry loop: losing the race
    is fine — the older snapshot stays readable via time travel."""
    for _ in range(3):
        cur = current_snapshot(path)
        if cur is not None and cur >= v:
            return  # a newer (or same) snapshot already won "current"
        fd, tmp = tempfile.mkstemp(dir=path, prefix="_ptr_")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": v}, f)
        os.replace(tmp, os.path.join(path, _PTR))
        # re-read: if a concurrent older writer overwrote us between the
        # check and the replace, loop and restore monotonicity
        if (current_snapshot(path) or 0) >= v:
            return


def read_table_versioned(spark: SparkSession, path: str,
                         snapshot: int | None = None) -> DataFrame:
    """Current snapshot by default; pass ``snapshot=N`` for time travel."""
    v = snapshot if snapshot is not None else current_snapshot(path)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def expire_snapshots(path: str, keep: int = 2) -> list[int]:
    """Retire all but the newest ``keep`` snapshots (never the current
    one).  Returns the expired version numbers — the Iceberg maintenance
    operation that bounds storage under continuous commits."""
    cur = current_snapshot(path)
    versions = table_snapshots(path)
    survivors = set(versions[-keep:]) | ({cur} if cur is not None else set())
    expired = []
    for v in versions:
        if v not in survivors:
            shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
            expired.append(v)
    return expired
