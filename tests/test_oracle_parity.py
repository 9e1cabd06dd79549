"""Differential tests: every SQL-oracled query must match DuckDB on the
small fixture — the local replica of the driver's t2 gate (SURVEY §5.2)."""

from __future__ import annotations

import math

import duckdb
import pytest

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
    registry,
)
from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.catalog import (
    TABLES,
    table_path,
)

from conftest import SF_DIR


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'"
        )
    return con


ORACLED = sorted(registry.all_oracles())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.all_queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(registry.all_oracles()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in dcols
    ), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    sc, dc = _canon(srows, sdf.columns), _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_every_query_has_an_oracle():
    """Round-4 invariant: ALL registered queries carry a DuckDB oracle
    (the former rows-only keys were closed via exactness invariants and
    deterministic full replays — see SURVEY §2.2). A new query without
    an oracle is a deliberate, documented decision, not a default."""
    rows_only = sorted(
        set(registry.all_queries()) - set(registry.all_oracles())
    )
    assert rows_only == [], (
        f"queries without oracles: {rows_only} — add an oracle or "
        "document why the semantics are not SQL-expressible"
    )
