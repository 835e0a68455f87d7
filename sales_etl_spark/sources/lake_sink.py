"""The transaction-log lake as a REAL batch sink — Spark 4's Python
Data Source writer API (pyspark.sql.datasource) wired to the lake's
atomic manifest protocol, completing the pair with the streaming CDC
reader (streaming/lake_source.py)::

    from sales_etl_spark.sources.lake_sink import register_lake_sink
    register_lake_sink(spark)
    df.write.format("lake_table").option("path", t).mode("append").save()

Execution shape — the two-phase commit the DataSource API is FOR:

- EXECUTOR side (``write``, once per task): the task's Arrow record
  batches stream into ONE parquet file in the table's ``data/`` dir
  under a uuid name — fully parallel, no driver staging hop, and
  INVISIBLE to readers until a manifest names it (write-then-rename
  inside the task keeps partially-written bytes unobservable).
- DRIVER side (``commit``, after every task succeeded): the collected
  file names publish as one atomic lake version through
  ``lake.commit_staged`` — the same O_EXCL hard-link protocol and
  version-race retries every other writer uses, so DataSource writes,
  ``commit_write`` writes, streaming upserts, and compactions all
  interleave safely on one table.
- ``abort``: staged files unlink; since no manifest ever named them,
  readers never saw anything (and a crashed abort leaves only
  vacuum-able orphans — fsck reports them benign).

SaveMode append/overwrite map to lake append/overwrite commits; time
travel, deletion-vector carry-forward, and the skip indexes behave
exactly as with commit_write (stats/bloom can be added by a later
compaction — the DataSource path records none at write time).
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, rel_file: str | None):
        self.rel_file = rel_file


class _LakeWriter(DataSourceArrowWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _FileCommit(None)  # empty task → no file
        data_dir = Path(self.path) / "data"
        data_dir.mkdir(parents=True, exist_ok=True)
        name = f"pyds-{uuid.uuid4().hex[:12]}.parquet"
        tmp = data_dir / f".{name}.tmp"
        pq.write_table(pa.Table.from_batches(batches), str(tmp))
        os.rename(tmp, data_dir / name)
        return _FileCommit(f"data/{name}")

    def commit(self, messages) -> None:
        from sales_etl_spark import lake

        files = sorted(
            m.rel_file for m in messages if m is not None and m.rel_file
        )
        lake.commit_staged(
            self.path, files,
            mode="overwrite" if self.overwrite else "append",
        )

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.rel_file:
                try:
                    (Path(self.path) / m.rel_file).unlink()
                except FileNotFoundError:
                    pass


class LakeDataSource(DataSource):
    """``format("lake_table")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake_table"

    def writer(self, schema, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("lake_table writer requires option 'path'")
        return _LakeWriter(path, overwrite)


def register_lake_sink(spark) -> None:
    spark.dataSource.register(LakeDataSource)
