"""Query/oracle registry.

Every operator in SURVEY.md §2.2 registers here as a named query:

    @query("q_agg_count_by", oracle="SELECT ... ")
    def q_agg_count_by(spark, sf_dir): ...

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin reads
of this registry. The oracle string is ANSI SQL runnable by DuckDB on the
same parquet tables; queries whose semantics are not SQL-expressible
(streaming state, approximate ops) register with ``oracle=None`` and get
the driver's weaker rows-only check.

Parity rules encoded as convention (SURVEY.md §7 "hard parts"):
- alias every computed column identically on both engines;
- explicitly cast aggregate integer results (DuckDB SUM(int)->HUGEINT vs
  Spark ->BIGINT) and round floating aggregates so summation order cannot
  flip the driver's value hash;
- avoid raw timestamp outputs (ns-vs-us precision) — project epoch
  seconds or ISO strings instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        extended,
        filters,
        joins,
        scans,
        scalar_funcs,
        skew,
        sorts_setops,
        sql_surface,
        udfs,
        windows,
    )
    from .functions import (  # noqa: F401
        dedup,
        langid,
        multimodal,
        similarity,
        text,
    )
    from .streaming import jobs, stateful  # noqa: F401

    _LOADED = True
