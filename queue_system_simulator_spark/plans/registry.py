"""Query registry: every operator the engine claims is registered here as a
(name → Spark builder [+ DuckDB oracle SQL]) pair.

The driver contract (``/root/repo/__spark_entry__.py``) compares each Spark
result against its oracle at sf0.01 by row-count + schema + order-insensitive
value hash, so:

* every computed column is aliased identically on both sides;
* float expressions are written with structurally identical op order on both
  sides (bit-equal results) or rounded where the algorithms legitimately
  differ (percentile interpolation, multi-partition float sums);
* exact time arithmetic is done in integer microseconds.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, description: str = ""
) -> Callable:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing query map: oracle-backed queries only.

    Rows-only library queries (seeded generators, sequential kernels with
    no SQL-expressible oracle) stay in ``QUERIES`` for pytest and local
    tools, but are excluded here: the driver's correctness gate records an
    oracle-less entry as ``err: no_oracle`` rather than a weaker rows-only
    check, so registering them can only lose points.
    """
    return {
        name: spec.build
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
