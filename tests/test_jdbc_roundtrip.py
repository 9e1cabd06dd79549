"""Real-JDBC round-trip over the bundled embedded Derby engine.

The reference's identity path lives in MySQL (``app.py:15-18``:
login SELECT at 78-80, register INSERT at 121-124). No MySQL server
exists in this environment, but pyspark ships Apache Derby
(jars/derby*-10.16) — a real transactional JDBC database — so the
JDBC source/sink is verified against live database storage here, not
just option construction: write → partitioned read → pushdown →
login/register semantics. Swapping in MySQL is a url+driver change.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.sources.jdbc import (
    DERBY_DRIVER,
    USERS_SCHEMA,
    derby_url,
    jdbc_reader,
    jdbc_writer,
    login_lookup,
)

_USERS = [
    ("Ala", "ala@x.pl", 30, "Gdansk", "f", "pw1"),
    ("Bob", "bob@x.pl", 41, "Sopot", "m", "pw2"),
    ("Cyd", "cyd@x.pl", 25, "Gdynia", "x", "pw3"),
    ("Dag", "dag@x.pl", 63, "Gdansk", "f", "pw4"),
]

# VARCHAR for every string column: Derby's dialect otherwise maps
# StringType -> CLOB, which cannot take an equality comparison at all
# (the login lookup's pushed-down WHERE email=? fails server-side) —
# the same declaration a MySQL deployment needs for indexable keys.
_USER_COLTYPES = (
    "name VARCHAR(64), email VARCHAR(128), city VARCHAR(64), "
    "gender VARCHAR(8), password VARCHAR(64)"
)


@pytest.fixture()
def db(spark):
    """A fresh embedded-Derby database seeded with the users table.
    Unique dir per test: embedded Derby keeps a JVM-lifetime lock per
    database directory, so reuse across tests would couple them."""
    # keep Derby's side log out of the repo/cwd (it writes derby.log
    # to user.dir on boot; harmless but noisy) — must be set before
    # the first connection boots the engine, no-op afterwards
    spark._jvm.System.setProperty(
        "derby.stream.error.file",
        os.path.join(tempfile.gettempdir(), "derby.log"),
    )
    url = derby_url(
        os.path.join(
            tempfile.gettempdir(), f"derby_test_{uuid.uuid4().hex[:12]}"
        )
    )
    users = spark.createDataFrame(_USERS, USERS_SCHEMA)
    jdbc_writer(
        users, url, "users",
        mode="overwrite", driver=DERBY_DRIVER,
        column_types=_USER_COLTYPES,
    )
    return url


def test_roundtrip_preserves_rows_and_schema(spark, db):
    back = jdbc_reader(spark, db, "users", driver=DERBY_DRIVER).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(_USERS)
    assert [f.name for f in back.schema.fields] == [
        "name", "email", "age", "city", "gender", "password",
    ]


def test_partitioned_read_splits_and_loses_nothing(spark, db):
    """The scale path: partitionColumn+bounds range-split the scan into
    parallel per-partition SELECTs. Rows outside [lower, upper) must
    still arrive (bounds shape the split, they do NOT filter — the
    first/last partitions take the open ends)."""
    back = jdbc_reader(
        spark, db, "users",
        partition_column="age", num_partitions=3,
        lower_bound=30, upper_bound=60,  # 25 and 63 fall outside
        driver=DERBY_DRIVER,
    ).load()
    assert back.rdd.getNumPartitions() == 3
    assert sorted(r.email for r in back.collect()) == sorted(
        u[1] for u in _USERS
    )


def test_filter_pushdown_reaches_the_database(spark, db):
    """Predicate pushdown is what keeps a 100 TB-side JDBC dim read
    sane: the WHERE clause must run in the database, not in Spark
    after a full-table fetch. `*` in PushedFilters marks a filter the
    source fully handles."""
    back = jdbc_reader(spark, db, "users", driver=DERBY_DRIVER).load()
    plan = (
        back.filter("age > 35")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(age,35)" in plan
    assert sorted(r.email for r in back.filter("age > 35").collect()) == [
        "bob@x.pl", "dag@x.pl",
    ]


def test_login_lookup_over_live_jdbc(spark, db):
    """R25 (`app.py:78-80`) against real database storage: hit returns
    the projected row, wrong password returns nothing."""
    users = jdbc_reader(spark, db, "users", driver=DERBY_DRIVER).load()
    hit = login_lookup(users, "ala@x.pl", "pw1").collect()
    assert [tuple(r) for r in hit] == [("ala@x.pl", 30, "Gdansk", "f")]
    assert login_lookup(users, "ala@x.pl", "wrong").collect() == []


def test_register_append_inserts_via_jdbc(spark, db):
    """R26 (`app.py:121-124`) as a real INSERT: append a new user and
    read it back through the same connection options. (The engine
    appends the full row including gender — the reference drops it,
    a documented quirk not replicated; SURVEY §7.)"""
    new = spark.createDataFrame(
        [("Eve", "eve@x.pl", 35, "Oliwa", "f", "pw5")], USERS_SCHEMA
    )
    jdbc_writer(new, db, "users", mode="append", driver=DERBY_DRIVER)
    users = jdbc_reader(spark, db, "users", driver=DERBY_DRIVER).load()
    assert users.count() == len(_USERS) + 1
    got = login_lookup(users, "eve@x.pl", "pw5").collect()
    assert [tuple(r) for r in got] == [("eve@x.pl", 35, "Oliwa", "f")]
