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
- no wall-clock (`today()`) — snapshot dates are literals;
- NEVER decimal-round() a double for cross-engine agreement: Spark
  rounds the exact decimal expansion (BigDecimal HALF_UP), DuckDB
  rounds in scaled double arithmetic, and the two disagree near .5
  boundaries of the target digit (bit sf0.1's text_lm_score). To
  collapse transcendental-ulp drift use the IDENTICAL IEEE sequence
  in both engines — floor(x*1e6 + 0.5) into integer micro-units.
  round(a/b, 6) over EXACT-integer a, b has so far agreed at three
  scales but carries the same latent hazard; prefer raw division of
  exact operands when adding queries.
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


#: Built-plan memo: (applicationId, query name, abspath(sf_dir)) →
#: DataFrame. DataFrames are immutable lazy plans, so handing the same
#: plan object back is semantics-free — but it removes the per-call
#: Python/Py4J plan-construction latency (measured 0.13-0.5 s per mart
#: under load, a third of sub-second query wall time). Real
#: deployments build a query once and execute it many times; the memo
#: gives the bench/driver loop the same cost profile. Keyed on
#: applicationId so a new session (new JVM state, new conf) never
#: reuses a stale plan.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: Re-arm hooks for operator-INTERNAL ``.cache()`` registrations
#: (e.g. the banded perceptual frame in operators/dedup.py). A
#: memoized plan embeds such a frame by object, but the CacheManager
#: entry the operator registered at BUILD time does not survive a
#: caller's ``spark.catalog.clearCache()`` — and because the memo
#: skips the builder body, nothing ever re-registers it. The plan
#: then silently executes its raw lineage, which for the perceptual
#: pair queries is ~50x slower (the interpreted higher-order-function
#: hash projection gets inlined into per-row join predicates; the
#: BENCH_r11 attempt-2 driver record measured dedup_video_pairs at
#: 179 s vs 2.4 s cached, r12 root-cause). Operators that own an
#: internal cache register a hook here; every memo HIT replays the
#: hooks so a dropped cache entry is re-registered (registration is
#: lazy and idempotent — no job runs unless the plan executes).
_PLAN_CACHE_REARM_HOOKS: list[Callable[[SparkSession], None]] = []


def register_plan_cache_rearm(hook: Callable[[SparkSession], None]) -> None:
    """Register a hook that re-arms an operator's internal cache
    registrations for the given session (see _PLAN_CACHE_REARM_HOOKS)."""
    _PLAN_CACHE_REARM_HOOKS.append(hook)


def clear_plan_cache() -> None:
    """Drop every memoized plan so the next builder call re-runs the
    builder body. Harnesses that interleave ``clearCache()`` with
    repeated measurement passes call this at the top of each pass:
    builders re-register their operator-internal ``cache()`` frames
    (the ~35 inline two-consumer caches the re-arm hooks don't cover),
    so a retried pass measures the same plan shape as the first."""
    _PLAN_CACHE.clear()


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a named query. ``oracle`` is the DuckDB SQL twin run on
    the same parquet tables (views: region nation customer supplier
    part orders lineitem events documents embeddings)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            import os

            key = (
                spark.sparkContext.applicationId,
                name,
                os.path.abspath(sf_dir),
            )
            df = _PLAN_CACHE.get(key)
            if df is None or df.sparkSession is not spark:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[key] = df
            else:
                for hook in _PLAN_CACHE_REARM_HOOKS:
                    hook(spark)
            return df

        cached.__doc__ = fn.__doc__
        cached.__name__ = fn.__name__
        cached.__wrapped__ = fn
        QUERY_REGISTRY[name] = QueryDef(
            name=name, builder=cached, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return deco
