"""Named-query registry backing ``__spark_entry__.py``.

Every operator the engine claims is registered here twice over: a
Spark builder and (where ANSI SQL can express it) a DuckDB oracle.
Column names are part of the contract — the driver's comparator sorts
columns by name and hashes values, so builders alias every computed
column and oracles use the identical ``AS`` names.

Determinism rules all builders/oracles follow (so value-hashes match
between a distributed Spark plan and single-threaded DuckDB):

- money/metric sums go through DECIMAL — exact, order-independent;
- double division only on already-exact operands (both engines then
  produce the identical IEEE result);
- any top-k / keep-one selection carries a full deterministic
  tiebreaker (unique key last in the sort order);
- no wall-clock (`today()`) — snapshot dates are literals.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a named query. ``oracle`` is the DuckDB SQL twin run on
    the same parquet tables (views: region nation customer supplier
    part orders lineitem events documents embeddings)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        QUERY_REGISTRY[name] = QueryDef(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return deco
