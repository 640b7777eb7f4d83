"""Table-format contract: the three write verbs the engine needs.

The engine's maintenance plans (pipeline writes, retention expiry,
late-data repair) were designed for an Iceberg-class table format but
run against a parquet-directory twin in this sandbox (no
iceberg-spark-runtime jar — see pipeline.py module docstring). Round-2
review asked for those "on Iceberg this becomes X" docstrings to be
EXECUTED contracts, not prose: this module names the three verbs as an
interface, keeps the parquet implementation as the default (bit-for-bit
the previous behavior, including its persist barrier and
absent-partition workarounds), and adds a snapshot-isolated in-memory
implementation that behaves like the metadata-level Iceberg verbs.
Contract tests (tests/test_table_format.py) run retention, late-data
repair, and the rollup pipeline against BOTH implementations and assert
identical results.

The verbs (Iceberg analogs in parens):

- ``overwrite_partitions`` — replace exactly the partitions present in
  the written DataFrame, leave all others untouched
  (``DataFrame.writeTo(t).overwritePartitions()``).
- ``delete_where`` — remove rows matching a predicate; partitions left
  empty disappear (metadata ``DELETE FROM t WHERE ...``).
- ``merge_replace_keys`` — replace every row whose key appears in a key
  set with the new rows for those keys (``MERGE ... WHEN MATCHED THEN
  DELETE / WHEN NOT MATCHED THEN INSERT`` over a key-complete source).

Reference analog: the reference's product store is a filesystem of
keyed rasters with overwrite-by-key semantics (``L2T_STARS.py:134-143``
idempotent skip, ``process_STARS_product.py:468-507`` cleanup); these
verbs are the same contract at table granularity.
"""

from __future__ import annotations

import shutil
from abc import ABC, abstractmethod
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class TableFormat(ABC):
    """Minimal table-format contract for the engine's maintenance verbs."""

    @abstractmethod
    def exists(self, spark: SparkSession, path: str) -> bool: ...

    @abstractmethod
    def read(self, spark: SparkSession, path: str) -> DataFrame: ...

    @abstractmethod
    def append(self, df: DataFrame, path: str) -> None: ...

    @abstractmethod
    def overwrite_partitions(
        self,
        df: DataFrame,
        path: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
        barrier: bool = False,
    ) -> None:
        """Replace exactly the ``partition_col`` partitions present in
        ``df``; all other partitions survive untouched.

        ``barrier=True`` declares that ``df``'s lineage reads the table
        being overwritten (read-modify-write): a format without snapshot
        isolation must materialize first (CLAUDE.md rule 8).
        """

    @abstractmethod
    def delete_where(
        self,
        spark: SparkSession,
        path: str,
        predicate: Column,
        partition_col: str,
    ) -> int:
        """Delete rows matching ``predicate``; returns rows deleted.
        Partitions left with zero rows cease to exist. No-op (0) on a
        missing table."""

    @abstractmethod
    def merge_replace_keys(
        self,
        spark: SparkSession,
        path: str,
        new_df: DataFrame,
        keys: DataFrame,
        key_col: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
    ) -> None:
        """MERGE with a key-complete source: delete every existing row
        whose ``key_col`` appears in ``keys``, insert all of ``new_df``
        (which must contain the full replacement rows for those keys).
        ``partition_col`` must be a pure function of ``key_col`` so the
        replacement is partition-local."""


class ParquetFormat(TableFormat):
    """Parquet-directory implementation — the engine's default.

    Exactly the previous inline behavior: dynamic partition overwrite
    (which never touches partitions absent from the output), an explicit
    persist barrier for read-modify-write lineages, and explicit
    directory removal for fully-deleted partitions (the two workarounds
    an Iceberg runtime makes unnecessary).
    """

    def exists(self, spark: SparkSession, path: str) -> bool:
        p = Path(path)
        return p.exists() and any(p.rglob("*.parquet"))

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def append(self, df: DataFrame, path: str) -> None:
        df.write.mode("append").parquet(path)

    def overwrite_partitions(
        self,
        df: DataFrame,
        path: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
        barrier: bool = False,
    ) -> None:
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        if barrier:  # rule 8: never read + overwrite the same files lazily
            df = df.persist()
            df.count()
        out = df.repartition(partition_col)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        (
            out.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
        if barrier:
            df.unpersist()

    def delete_where(
        self,
        spark: SparkSession,
        path: str,
        predicate: Column,
        partition_col: str,
    ) -> int:
        if not self.exists(spark, path):
            return 0
        df = self.read(spark, path)
        # pruning pass: only partitions that actually hold matching rows
        affected = [
            r[partition_col]
            for r in df.where(predicate)
            .select(partition_col)
            .distinct()
            .collect()
        ]
        if not affected:
            return 0
        n_before = df.where(F.col(partition_col).isin(affected)).count()
        kept = (
            df.where(F.col(partition_col).isin(affected))
            .where(~predicate)
            .persist()  # rule-8 barrier: kept reads the overwritten files
        )
        n_after = kept.count()
        kept_parts = {
            r[partition_col]
            for r in kept.select(partition_col).distinct().collect()
        }
        if n_after > 0:
            (
                kept.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        kept.unpersist()
        # dynamic overwrite never rewrites a partition ABSENT from the
        # output — fully-deleted partitions must be removed explicitly
        for b in affected:
            if b not in kept_parts:
                d = Path(path) / f"{partition_col}={b}"
                if d.exists():
                    shutil.rmtree(d)
        return n_before - n_after

    def merge_replace_keys(
        self,
        spark: SparkSession,
        path: str,
        new_df: DataFrame,
        keys: DataFrame,
        key_col: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
    ) -> None:
        if not self.exists(spark, path):
            self.overwrite_partitions(
                new_df, path, partition_col, sort_cols=sort_cols
            )
            return
        existing = self.read(spark, path)
        # affected partitions may hold unaffected keys too — carry their
        # existing rows into the partition overwrite
        parts = [
            r[partition_col]
            for r in new_df.select(partition_col).distinct().collect()
        ]
        keep = existing.where(F.col(partition_col).isin(parts)).join(
            F.broadcast(keys.select(key_col)), key_col, "left_anti"
        )
        out = keep.select(new_df.columns).unionByName(new_df)
        self.overwrite_partitions(
            out, path, partition_col, sort_cols=sort_cols, barrier=True
        )


class InMemoryFormat(TableFormat):
    """Snapshot-isolated in-memory fake of an Iceberg-class format.

    Every verb reads the current snapshot (a plain row list), computes
    the next snapshot, and swaps it atomically — so read-modify-write
    needs no persist barrier, deletes are "metadata-level" (no partition
    bookkeeping), and a concurrent reader keeps the snapshot it started
    with. Used by the contract tests to prove the engine's plans are
    correct against the semantics the docstrings claim, independent of
    the parquet workarounds.
    """

    def __init__(self) -> None:
        self._tables: dict[str, tuple[object, list]] = {}

    def exists(self, spark: SparkSession, path: str) -> bool:
        return path in self._tables and len(self._tables[path][1]) > 0

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        schema, rows = self._tables[path]
        return spark.createDataFrame(rows, schema)

    def append(self, df: DataFrame, path: str) -> None:
        rows = df.collect()
        if path in self._tables:
            schema, old = self._tables[path]
            self._tables[path] = (schema, old + rows)
        else:
            self._tables[path] = (df.schema, rows)

    def overwrite_partitions(
        self,
        df: DataFrame,
        path: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
        barrier: bool = False,  # snapshot isolation: barrier is free
    ) -> None:
        new_rows = df.collect()
        parts = {r[partition_col] for r in new_rows}
        survivors = []
        if path in self._tables:
            _, old = self._tables[path]
            cols = [f.name for f in df.schema.fields]
            survivors = [
                tuple(r[c] for c in cols)
                for r in old
                if r[partition_col] not in parts
            ]
        self._tables[path] = (df.schema, survivors + new_rows)

    def delete_where(
        self,
        spark: SparkSession,
        path: str,
        predicate: Column,
        partition_col: str,
    ) -> int:
        if not self.exists(spark, path):
            return 0
        snapshot = self.read(spark, path)
        kept = snapshot.where(~predicate).collect()
        schema, old = self._tables[path]
        self._tables[path] = (schema, kept)
        return len(old) - len(kept)

    def merge_replace_keys(
        self,
        spark: SparkSession,
        path: str,
        new_df: DataFrame,
        keys: DataFrame,
        key_col: str,
        partition_col: str,
        sort_cols: tuple[str, ...] = (),
    ) -> None:
        new_rows = new_df.collect()
        if path not in self._tables:
            self._tables[path] = (new_df.schema, new_rows)
            return
        dead = {r[key_col] for r in keys.select(key_col).collect()}
        schema, old = self._tables[path]
        cols = [f.name for f in new_df.schema.fields]
        survivors = [
            tuple(r[c] for c in cols) for r in old if r[key_col] not in dead
        ]
        self._tables[path] = (new_df.schema, survivors + new_rows)
