"""JDBC source/sink — the reference's MySQL identity path, Spark-side.

The reference keeps ``all_users.users`` in MySQL with a point-lookup
login (``SELECT email, age, city, gender … WHERE email=%s AND
password=%s``, ``app.py:78-80``) and an INSERT register path
(``app.py:121-124``). The engine equivalents are JDBC reader/writer
builders plus two relational helpers that work on ANY users DataFrame
(JDBC, parquet, …) — the semantics are engine concepts, the storage is
not.

No MySQL server exists in the test environment, but pyspark bundles
the embedded Apache Derby engine (a real transactional JDBC database,
jars/derby*-10.16), so the whole path IS exercised for real:
tests/test_jdbc_roundtrip.py writes users through ``jdbc_writer``,
reads them back through a range-partitioned ``jdbc_reader``, asserts
WHERE-clause pushdown reaches the database (``PushedFilters`` in the
physical plan), and runs the R25 login lookup / R26 register append
against the live database. Swapping Derby for MySQL is a url + driver
string change — every option here is source-generic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC url for a database directory (created on
    first connect). One JVM may own an embedded Derby database at a
    time — fine under local/driver-side use; a multi-JVM cluster would
    point at a server url (Derby network server, MySQL, …) instead."""
    return f"jdbc:derby:{db_dir};create=true"

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
    driver: str | None = None,
):
    """JDBC read builder (users dim at the reference; any table here).

    For big JDBC tables pass ``partition_column`` + bounds so the read
    parallelizes into ``num_partitions`` range-splits instead of a
    single-connection scan — the only way a JDBC source scales.
    ``driver`` pins the JDBC driver class when the url scheme alone
    can't resolve it (embedded Derby needs it; MySQL with its
    connector jar on the classpath does not).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", "10000")
    )
    if driver is not None:
        reader = reader.option("driver", driver)
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


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    column_types: str | None = None,
) -> None:
    """JDBC write (R26's INSERT path over a real driver): ``append``
    is the register INSERT, ``overwrite`` drops and recreates the
    table (initial load). ``batchsize`` batches the INSERT round-trips
    — the JDBC-sink lever that matters at volume; past that, a real
    bulk load belongs in the database's native loader, with Spark
    writing files it ingests.

    ``column_types`` feeds ``createTableColumnTypes`` on table
    creation. It matters for string keys: most dialects (Derby, and
    MySQL for long strings) map StringType to a LOB type that cannot
    take an index or — in Derby — even an equality comparison, so a
    pushed-down ``WHERE email = ?`` fails or full-scans. Declare
    lookup columns VARCHAR(n) explicitly (e.g. ``"email VARCHAR(128),
    password VARCHAR(64)"``)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", "10000")
    )
    if driver is not None:
        writer = writer.option("driver", driver)
    if column_types is not None:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.mode(mode).save()


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
