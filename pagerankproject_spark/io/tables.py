"""Table-format abstraction — SURVEY.md §7.4.

The engine's durable tables (`pages`, `edges`, `weighted_edges`,
`vertices`, `ranks`, CSR blocks) target Iceberg in production
(north_rule: "Iceberg tables of Common-Crawl-style web pages"); this
sandbox has no Iceberg runtime jar (verified — SURVEY §7.4), so the
same protocol is served by an atomic parquet-directory format.
Everything engine-side programs against `TableFormat`; which one you
get is decided by `resolve_format` from the session's catalog config,
so the SAME job code runs in both worlds:

  * `IcebergFormat` — `df.writeTo(cat.db.name).createOrReplace()`;
    atomicity, snapshots and partition evolution come from Iceberg.
    Activated when a `spark.sql.catalog.<name>` is configured with the
    Iceberg catalog implementation.
  * `ParquetDirFormat` — write to `<name>.tmp` then atomic rename,
    mirroring the commit discipline of `ParquetCheckpointer`.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession


class TableFormat(Protocol):
    def write(self, df: DataFrame, name: str) -> None: ...

    def read(self, spark: SparkSession, name: str) -> DataFrame: ...

    def exists(self, spark: SparkSession, name: str) -> bool: ...


@dataclass
class ParquetDirFormat:
    """Directory-of-parquet tables with write-tmp + atomic-rename commits."""

    base_dir: str

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def write(self, df: DataFrame, name: str) -> None:
        final = self._path(name)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        old = final + ".old"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.isdir(self._path(name))


@dataclass
class IcebergFormat:
    """Iceberg tables via a configured Spark catalog (production path)."""

    catalog: str
    namespace: str = "linkgraph"

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def write(self, df: DataFrame, name: str) -> None:
        df.writeTo(self._ident(name)).createOrReplace()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.table(self._ident(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return spark.catalog.tableExists(self._ident(name))


def iceberg_catalogs(spark: SparkSession) -> list[str]:
    """Names of session catalogs backed by Iceberg's SparkCatalog."""
    out = []
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in v.lower():
                out.append(k.rsplit(".", 1)[1])
    return sorted(out)


def resolve_format(
    spark: SparkSession, base_dir: str | None = None
) -> TableFormat:
    """IcebergFormat when an Iceberg catalog is configured on the
    session, else ParquetDirFormat rooted at `base_dir` (required then)."""
    cats = iceberg_catalogs(spark)
    if cats:
        return IcebergFormat(catalog=cats[0])
    if base_dir is None:
        raise ValueError(
            "no Iceberg catalog configured and no base_dir given for the "
            "parquet fallback"
        )
    os.makedirs(base_dir, exist_ok=True)
    return ParquetDirFormat(base_dir=base_dir)


def write_bucketed_edges(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str = "src_id",
) -> None:
    """Persist an edge table hash-bucketed (and sorted) by the iteration
    join key. A bucketed scan carries its partitioning into the join, so
    the per-iteration `edges JOIN ranks` needs NO exchange (and no sort)
    on the big side — only the small ranks side shuffles into the bucket
    layout. This is the durable-table twin of the in-memory
    `repartition(P, key).persist()` the iterative loops use, and the
    reason the CSR/bucketed layout wins on a real cluster where the edge
    table outlives one job (BENCH.md 'CSR blocks' note).

    Uses the session catalog (`saveAsTable`) — works on plain Spark with
    a warehouse dir; with an Iceberg catalog configured, Iceberg's
    equivalent is a bucket partition transform on the same key.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
