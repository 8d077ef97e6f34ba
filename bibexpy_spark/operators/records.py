"""Record-level delete / update with snapshot-before-mutation.

Reference parity (apps/api/routers/records.py:53-121,170+): deleting rows or
patching cells always snapshots the dataset first; every mutation lands in
the audit log.

Iceberg contract: these are row-level ``DELETE FROM`` / ``MERGE INTO`` on an
Iceberg table, with time travel giving the snapshot for free.  Parquet
fallback (this sandbox ships no Iceberg runtime): a versioned table directory
``<table>/v<N>/`` where every mutation writes a NEW full version and flips a
``current`` pointer atomically — the same append-only snapshot discipline,
coarser granularity.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    """Minimal snapshot-per-mutation table (Iceberg-fallback semantics)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.path, "current.json")

    def current_version(self) -> int:
        try:
            return json.load(open(self._pointer()))["version"]
        except (OSError, json.JSONDecodeError, KeyError):
            return 0

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v}")

    def _flip(self, v: int) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "ts": time.time()}, f)
        os.replace(tmp, self._pointer())

    # -- operations ------------------------------------------------------------
    def write(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        self._flip(v)
        return v

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v == 0:
            raise FileNotFoundError(f"no snapshot in {self.path}")
        return self.spark.read.parquet(self._version_dir(v))

    def delete_where(self, cond: Column) -> int:
        """DELETE FROM t WHERE cond — new snapshot with the rows removed."""
        return self.write(self.read().filter(~F.coalesce(cond, F.lit(False))))

    def update_where(self, cond: Column, assignments: dict[str, Column]) -> int:
        """UPDATE t SET ... WHERE cond — new snapshot with patched cells."""
        df = self.read()
        safe = F.coalesce(cond, F.lit(False))
        for col, value in assignments.items():
            df = df.withColumn(col, F.when(safe, value).otherwise(F.col(col)))
        return self.write(df)

    def merge_upsert(self, updates: DataFrame, key: str) -> int:
        """MERGE INTO semantics: matched rows replaced, new rows appended."""
        cur = self.read()
        merged = cur.join(updates.select(key), key, "left_anti").unionByName(
            updates.select(*cur.columns)
        )
        return self.write(merged)
