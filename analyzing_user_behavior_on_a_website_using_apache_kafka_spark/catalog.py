"""Fixture-table catalog.

The driver generates TPC-H-ish parquet at ``/root/testdata/sf*/`` (see
TESTDATA.md / FIXTURES.md). Loaders here are the only place paths are
spelled out; every query takes ``(spark, sf_dir)`` and pulls tables
through :func:`load_table` so filters/projections still push down to the
parquet scan (we return the raw ``spark.read.parquet`` DataFrame, never a
cached/materialized copy).

At 100 TB the same loader maps to partitioned/bucketed external tables:
the API surface (name -> DataFrame) is unchanged; only the storage layout
option strings differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor — region
# and nation are fixed-cardinality (5 / 25 rows) regardless of sf, exactly
# like the reference's fixed 12-service topic namespace (index.html:98-109).
BROADCAST_SAFE = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize(name: str, df: DataFrame) -> DataFrame:
    """Schema normalization applied to every scan (batch and streaming).

    events.ts has shipped in two physical shapes across fixture
    regenerations, and BOTH must keep working:

    - TIMESTAMP(NANOS): Spark's reader rejects it; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as int64
      nanoseconds and is converted here to a microsecond TimestampType
      via integer division (`div 1000` — no double rounding), matching
      DuckDB's ns→us truncation so the oracle sees identical instants.
    - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
      TIMESTAMP_NTZ, which breaks ``unix_millis`` and ``withWatermark``
      (both demand TIMESTAMP). Cast to TimestampType — the session tz is
      pinned UTC (session.py), so the stored micros map to the same
      instant DuckDB reads, and oracle parity holds.
    """
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_reader_conf(spark: SparkSession, name: str) -> None:
    """Make any caller's session able to read the fixtures.

    The driver harness builds its own SparkSession without our confs;
    both confs below are runtime-settable, so set them defensively:

    - ``nanosAsLong=true``: without it Spark 4 rejects a
      TIMESTAMP(NANOS) events fixture outright.
    - ``inferTimestampNTZ.enabled=false``: a timestamp[us]
      isAdjustedToUTC=false fixture otherwise infers TIMESTAMP_NTZ,
      which ``withWatermark``/``unix_millis`` reject. Disabling the
      inference reads the stored micros as plain TIMESTAMP (UTC session
      tz ⇒ same instants DuckDB sees). ``normalize`` still handles the
      NTZ shape for sessions where this conf is locked.

    Applies to batch and streaming reads alike.
    """
    if name == "events":
        for key, val in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ):
            try:
                spark.conf.set(key, val)
            except Exception:  # pragma: no cover - conf locked down
                pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Raw parquet scan for one fixture table (lazy; pushdown-friendly)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    ensure_reader_conf(spark, name)
    return normalize(name, spark.read.parquet(table_path(sf_dir, name)))


# (path identity) -> row count. Keyed by (abspath, size, mtime_ns) per
# file so a fixture REGENERATED at the same path between driver rounds
# (TESTDATA.md: same paths every round) can never serve a stale count —
# the same identity discipline as scale_probe._base_fingerprint. Plain
# ints, not DataFrames, so evict_caches does NOT need to clear this
# (nothing here holds unpersisted-lineage state); timing harnesses keep
# the memo warm by design, matching what a production job would know
# from its catalog statistics.
_ROW_COUNT_CACHE: dict[tuple, int] = {}


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of one fixture table from parquet FOOTER metadata —
    no Spark job, no scan.

    Width/geometry rules (similarity.n_planes_for, dedup's band words)
    need the corpus size at PLAN-CONSTRUCTION time; running a count()
    job inside a query constructor makes "lazy" queries eager and
    double-charges any tool that constructs the plan twice (ADVICE
    r12). Parquet footers carry exact row counts, so this is a local
    metadata read — the same information a cluster catalog serves from
    table statistics. Directory layouts skip the paths Spark's scan
    skips (any component starting with '_' or '.': _temporary job
    attempts, _SUCCESS markers, hidden files), so the footer count
    matches the scan count even on a layout a crashed write left
    behind. Falls back to a Spark count() when the path is not
    footer-readable (e.g. object storage without a local pyarrow
    filesystem) — that branch is deliberately UNCACHED (no stat-based
    identity exists to invalidate on), so non-local callers pay an
    eager count per construction; at cluster scale the real answer is
    catalog/table statistics, not this helper.
    """
    path = table_path(sf_dir, name)

    def _hidden(p: str) -> bool:
        return p.startswith("_") or p.startswith(".")

    files = []
    if os.path.isdir(path):
        for root, dirs, names in os.walk(path):
            dirs[:] = [d for d in dirs if not _hidden(d)]
            # every non-hidden file, not just *.parquet: Spark's scan
            # reads extension-less part files too, and skipping them
            # here would size the geometry for a smaller corpus than
            # the plan scans (r13 review). A non-parquet stray makes
            # pyarrow raise below → honest count() fallback, the same
            # behavior the scan's own error path gives.
            files.extend(
                os.path.join(root, f) for f in names if not _hidden(f)
            )
    elif os.path.exists(path):
        files.append(path)
    try:
        ident = tuple(
            (os.path.abspath(f), st.st_size, st.st_mtime_ns)
            for f in sorted(files)
            for st in (os.stat(f),)
        )
    except OSError:
        ident = ()
    if not ident:  # not a local path — lazy-count fallback, uncached
        return load_table(spark, sf_dir, name).count()
    if ident not in _ROW_COUNT_CACHE:
        try:
            import pyarrow.parquet as pq

            n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        except Exception:
            n = load_table(spark, sf_dir, name).count()
        _ROW_COUNT_CACHE[ident] = n
    return _ROW_COUNT_CACHE[ident]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
