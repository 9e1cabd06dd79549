"""JDBC source/sink — the reference's MySQL identity path, Spark-side.

The reference keeps ``all_users.users`` in MySQL with a point-lookup
login (``SELECT email, age, city, gender … WHERE email=%s AND
password=%s``, ``app.py:78-80``) and an INSERT register path
(``app.py:121-124``). The engine equivalents are a JDBC reader builder
plus two relational helpers that work on ANY users DataFrame (JDBC,
parquet, …) — the semantics are engine concepts, the storage is not.

No database exists in the test environment, so ``jdbc_reader`` only
assembles options (covered by a construction test); the lookup/append
helpers are tested against the parquet-backed `customer` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

USERS_SCHEMA = (
    "name string, email string, age int, city string, gender string, "
    "password string"
)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
):
    """JDBC read builder (users dim at the reference; any table here).

    For big JDBC tables pass ``partition_column`` + bounds so the read
    parallelizes into ``num_partitions`` range-splits instead of a
    single-connection scan — the only way a JDBC source scales.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read requires both bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def login_lookup(users: DataFrame, email: str, password: str) -> DataFrame:
    """Point lookup (R25): ``SELECT email, age, city, gender FROM users
    WHERE email=? AND password=?`` (``app.py:78-80``) — first match."""
    return (
        users.filter(
            (F.col("email") == email) & (F.col("password") == password)
        )
        .select("email", "age", "city", "gender")
        .limit(1)
    )


def register_append(users_sink_path: str, new_user: DataFrame) -> None:
    """Row append (R26): the INSERT of the register path
    (``app.py:121-124``). NOTE the reference drops the form's ``gender``
    on INSERT (documented quirk, SURVEY §7 non-goals) — this writer
    appends the full row instead."""
    new_user.write.mode("append").parquet(users_sink_path)
