"""The transaction-log lake as a REAL Structured Streaming source —
Spark 4's Python Data Source API (pyspark.sql.datasource) wired to the
lake's manifest log, so ``spark.readStream.format("lake_cdc")`` tails
a table's append commits with exactly-once offset tracking:

- OFFSETS are version numbers: an offset ``{"v": n}`` means "versions
  ``<= n`` consumed". The checkpoint stores them like any source
  offset, so restart resumes exactly after the last committed batch.
- BATCHES are the append commits in ``(start, end]``; each commit's
  new files (``n_new_files`` — the same bookkeeping lake.read_changes
  uses) become one InputPartition per file, and rows are read on
  EXECUTORS as Arrow record batches (the scale path — the Simple
  reader variant funnels every row through the driver).
- DETERMINISTIC REPLAY: data files are immutable and manifests name
  them, so re-reading any offset range yields identical rows —
  the property exactly-once recovery needs from a source.

CDC contract: like :func:`sales_etl_spark.lake.read_changes`, the
stream REFUSES to cross a non-append commit (overwrite / delete /
merge have no row-level append feed) — it raises mid-stream rather
than silently emitting wrong changes. Tail compacted tables from a
fresh ``startingVersion`` after the overwrite, or keep ingest tables
append-only (the layout this source is for).

Registration is per-session::

    from sales_etl_spark.streaming.lake_source import register_lake_source
    register_lake_source(spark)
    stream = (spark.readStream.format("lake_cdc")
              .option("path", table_path).load())

Options: ``path`` (required), ``startingVersion`` (default ``-1`` =
everything from v0; pass the current head to tail only new commits).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _LakeFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


def _versions(table_path: str) -> list[int]:
    log = Path(table_path) / "_log"
    if not log.is_dir():
        return []
    return sorted(
        int(p.stem) for p in log.glob("*.json") if p.stem.isdigit()
    )


def _manifest(table_path: str, version: int) -> dict:
    return json.loads(
        (Path(table_path) / "_log" / f"{version:08d}.json").read_text()
    )


def _new_files_between(table_path: str, start_v: int, end_v: int) -> list[str]:
    """Files introduced by append commits in (start_v, end_v] —
    absolute paths; raises on a non-append commit in the range."""
    out: list[str] = []
    for v in _versions(table_path):
        if start_v < v <= end_v:
            m = _manifest(table_path, v)
            if m["mode"] != "append":
                raise ValueError(
                    f"lake_cdc: version {v} is a {m['mode']!r} commit — "
                    "no append-only change feed across it (restart from "
                    "a startingVersion beyond it, or keep the ingest "
                    "table append-only)"
                )
            if m["n_new_files"]:
                out.extend(
                    str(Path(table_path) / f)
                    for f in m["files"][-m["n_new_files"]:]
                )
    return out


class _LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options["path"]
        self._start = int(options.get("startingVersion", "-1"))

    def initialOffset(self) -> dict:
        return {"v": self._start}

    def latestOffset(self) -> dict:
        vs = _versions(self._path)
        return {"v": vs[-1] if vs else self._start}

    def partitions(self, start: dict, end: dict):
        files = _new_files_between(self._path, start["v"], end["v"])
        # one partition per data file: reads parallelize across
        # executors exactly like a batch scan of the same files
        return [_LakeFilePartition(f) for f in files] or [
            # Spark requires >= 1 partition; an empty range yields an
            # empty file list handled in read()
            _LakeFilePartition("")
        ]

    def read(self, partition: _LakeFilePartition):
        if not partition.file_path:
            return iter(())
        import pyarrow.parquet as pq

        return pq.ParquetFile(partition.file_path).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to ack


class LakeStreamDataSource(DataSource):
    """``format("lake_cdc")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdc"

    def schema(self):
        # schema of the latest committed snapshot, read from one
        # parquet footer (driver-side, metadata-only)
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options["path"]
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(
                f"lake_cdc: no committed versions at {path}"
            )
        files = _manifest(path, vs[-1])["files"]
        if not files:
            raise FileNotFoundError(f"lake_cdc: empty table at {path}")
        return from_arrow_schema(
            pq.read_schema(str(Path(path) / files[0]))
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _LakeStreamReader(self.options)


def register_lake_source(spark) -> None:
    """Idempotently register the ``lake_cdc`` format on a session."""
    spark.dataSource.register(LakeStreamDataSource)
