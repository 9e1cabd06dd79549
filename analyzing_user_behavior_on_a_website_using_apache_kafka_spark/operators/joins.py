"""Join operators.

Reference parity: the demographics enrichment is semantically
``events ⋈ users`` evaluated eagerly at produce time (``app.py:79-88``,
``index.html:63-67``; SURVEY §2.1 R6). Here it is a proper relational
join with the strategy chosen for scale:

- small dims (nation: 25 rows, region: 5 rows — fixed cardinality at any
  sf, like the reference's 12-service namespace) are explicitly
  ``broadcast()`` — zero shuffle;
- big-big joins (lineitem ⋈ orders) shuffle on the join key and AQE
  handles skew splitting at runtime;
- the as-of join (no native Spark operator) is composed from an
  equi-join on the entity key + per-probe ``max_by``-style reduction —
  the equi component keeps it hash-joinable, so it scales as a normal
  shuffled join instead of a range BNLJ.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT e.event_id, e.event_type, c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join: events ⋈ customer — the R6 demographic enrichment.

    Planner-chosen strategy (broadcast if customer fits the threshold,
    else sort-merge with AQE); the declarative form is identical either
    way.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return ev.join(cust, ev.user_id == cust.c_custkey, "inner").select(
        "event_id", "event_type", "c_mktsegment"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hash join on the fixed-cardinality nation dim.

    ``broadcast(nation)`` guarantees zero shuffle of the fact side — at
    100 TB the 25-row dim ships to every executor once and the join is
    map-side.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an ON-clause filter on the right side only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000),
        "left",
    ).select("c_custkey", "o_orderkey")


@query(
    "q_join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one finished order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name, o.o_orderpriority
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table chain: lineitem ⋈ orders ⋈ customer ⋈ nation + agg.

    The big-big legs shuffle on their keys; nation is broadcast. Catalyst
    + CBO/AQE handle the ordering — expressed declaratively, no manual
    scheduling.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1996-01-01"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q_join_theta_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('p0', 0.0, 100000.0), ('p1', 100000.0, 200000.0),
             ('p2', 200000.0, 300000.0), ('p3', 300000.0, 450000.0),
             ('p4', 450000.0, 1000000.0)
    )
    SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(o.o_totalprice), 2) AS avg_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (interval) join: orders banded by price range.

    The band table is tiny → Spark plans a *broadcast* nested-loop join,
    which is the correct 100 TB strategy for small-side theta joins: the
    fact table is never shuffled, each task scans its split once against
    the broadcast intervals.
    """
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("p0", 0.0, 100000.0),
            ("p1", 100000.0, 200000.0),
            ("p2", 200000.0, 300000.0),
            ("p3", 300000.0, 450000.0),
            ("p4", 450000.0, 1000000.0),
        ],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


_TWIN_BAND = 100.0  # |Δ o_totalprice| defining a "price twin"
_BIN_W = 100.0  # bin width; bands ≤ bin width ⇒ 3 probe bins suffice


@query(
    "q_join_range_binned",
    oracle=f"""
    SELECT a.o_orderkey,
           CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_price_twins
    FROM orders a LEFT JOIN orders b
      ON b.o_orderkey <> a.o_orderkey
     AND abs(a.o_totalprice - b.o_totalprice) <= {_TWIN_BAND}
    GROUP BY a.o_orderkey
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIG-BIG range join via binning: per order, how many other orders
    price within ±100 — both sides fact-sized, so the broadcast-BNLJ
    strategy of `q_join_theta_range` is unavailable.

    Quantize the range dimension into width-100 bins; each probe row
    explodes to its 3 adjacent bins (|Δ| ≤ band ≤ bin width ⇒ the match
    is in bin−1..bin+1 — lossless, and the 3 probe bins are distinct so
    no pair is double-counted); join is a plain EQUI join on the bin id
    (shuffle-partitioned, no broadcast, no nested loop), then the exact
    band predicate re-checks. Probe replication = ⌈band/bin⌉ + 2 rows —
    the knob trading shuffle volume against bin selectivity at 100 TB.
    Zero-twin orders need no restoring join: every order collides with
    ITSELF in its center bin (|Δ| = 0 ≤ band), so each group is
    non-empty by construction and the count just subtracts that one
    guaranteed self-match (r11 — dropped the former restore-the-zeros
    LEFT JOIN, one less orders scan and exchange).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return binned_band_self_join(o)


def binned_band_self_join(o: DataFrame) -> DataFrame:
    """Core binned band self-join over any (o_orderkey, o_totalprice)
    DataFrame — separated from the fixture loader so property tests can
    drive it with adversarial values (exact-boundary deltas and NULL
    prices included).

    NULL range values get the SQL band-join semantics explicitly: a
    null price satisfies no band predicate in either direction, so the
    row emits n_price_twins = 0 and never counts as anyone's twin. The
    guaranteed-self-match trick only covers non-null rows (a null bins
    to null and falls out of the equi-join), so the zero rows come from
    a cheap unioned `IsNull` scan — pushed to parquet, where row-group
    null-count stats skip it entirely on NOT NULL data like TPC-H
    orders — NOT from the old restore-zeros left join (a full second
    exchange)."""
    build = o.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_totalprice").alias("b_price"),
        F.floor(F.col("o_totalprice") / _BIN_W).alias("bin"),
    )
    probe = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.array(
                F.floor(F.col("o_totalprice") / _BIN_W) - 1,
                F.floor(F.col("o_totalprice") / _BIN_W),
                F.floor(F.col("o_totalprice") / _BIN_W) + 1,
            )
        ).alias("bin"),
    )
    # Count INCLUDING the self-match, then subtract 1 (r11): every
    # order collides with itself in its own bin at |Δ| = 0 ≤ band, so
    # each group is guaranteed non-empty and the former
    # restore-the-zeros LEFT JOIN back to `o` — a third scan plus an
    # exchange of both 150k-row sides at sf0.1 — disappears entirely.
    # Self appears exactly once (only the probe's CENTER bin equals
    # its own build bin). Non-null rows only: a null price bins to
    # null and drops out of the equi-join — its zero row is unioned
    # back below instead.
    twins = (
        probe.join(build, "bin")
        .filter(
            F.abs(F.col("o_totalprice") - F.col("b_price")) <= _TWIN_BAND
        )
        .groupBy("o_orderkey")
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("n_price_twins"))
    )
    null_rows = o.filter(F.col("o_totalprice").isNull()).select(
        "o_orderkey", F.lit(0).cast("bigint").alias("n_price_twins")
    )
    return twins.select("o_orderkey", "n_price_twins").unionByName(
        null_rows
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT e.event_id,
           CAST(o.o_orderdate AS DATE) AS asof_orderdate
    FROM events e
    ASOF JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order date at-or-before each event's timestamp.

    Spark has no native ASOF JOIN (SURVEY §4.2); composition: equi-join on
    the entity key (hash-joinable → scales), keep rows with
    ``o_orderdate <= ts``, then reduce per event with ``max(o_orderdate)``.
    The output projects only the as-of *date*: the fixture has multiple
    orders per (custkey, date), and DuckDB's ASOF JOIN breaks those ties
    by scan order, so any payload column would be nondeterministic in the
    oracle — the as-of timestamp itself is the well-defined answer. At
    100 TB this is one shuffle on the entity key with a partial max — no
    window state; the alternative union+last() composition is equivalent
    but touches state twice.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (ev.ts >= orders.o_orderdate),
        "inner",
    )
    return joined.groupBy("event_id").agg(
        F.max(F.col("o_orderdate")).cast("date").alias("asof_orderdate")
    )


# (session, corpus) -> written Hive-partitioned event-log layout for
# q_join_dpp, memoized so repeated calls (oracle sweeps, scale probes)
# re-use one written copy instead of re-writing the fact per invocation
_DPP_LAYOUT_CACHE: dict[tuple[int, str], str] = {}


def _dpp_fingerprint(sf_dir: str) -> str:
    """Identity of the layout's SOURCE data: corpus path + the events
    parquet's (size, mtime_ns).  The driver regenerates fixtures
    per-round at the SAME path, so _SUCCESS markers alone cannot
    validate a reused layout — a layout built from last round's
    events would silently serve stale facts (r9 review finding)."""
    corpus = os.path.abspath(sf_dir)
    st = os.stat(os.path.join(corpus, "events.parquet"))
    return f"{corpus}|{st.st_size}|{st.st_mtime_ns}"


def _dpp_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write (once) and return the q_join_dpp layout dir: the fact
    table Hive-partitioned by event_type plus the enum-sized type dim.

    The path is DETERMINISTIC per corpus (ADVICE r8: a fresh mkdtemp
    per cold call both leaked the previous layout when evict_caches
    cleared the memo and re-wrote the full event log on every cold
    bench rep) — a hash of the corpus path, so distinct corpora can
    never collide into one directory (a readable-name sanitization
    mapped /a/b_c and /a/b/c to the same dir).  A directory left by an
    earlier session is reused only if it is COMPLETE (Spark's
    ``_SUCCESS`` markers for both tables) AND its ``SOURCE`` marker
    matches the current corpus fingerprint — a fixture regenerated at
    the same path (the driver does this every round) changes
    size/mtime and forces a rebuild instead of serving stale facts.
    The dim write lives HERE, inside the memoized builder, so a memo
    hit re-writes nothing at all.

    Concurrent-builder safety: the whole check-build-publish section
    holds an exclusive ``flock`` on a sibling lock file, so two
    processes racing on a cold corpus (a driver sweep plus a stray
    bench) serialize — the loser re-checks under the lock, finds the
    winner's complete layout, and builds nothing.  The build still
    lands in a pid-suffixed staging dir and publishes with one atomic
    ``os.rename`` so a crash mid-build leaves no half-written live
    dir (the stale remains lack ``_SUCCESS``/``SOURCE`` and are
    cleared by the next builder).
    """
    import fcntl

    corpus = os.path.abspath(sf_dir)
    fp = _dpp_fingerprint(sf_dir)
    key = (id(spark), corpus)
    hit = _DPP_LAYOUT_CACHE.get(key)
    if hit is not None and _dpp_layout_complete(hit, fp):
        return hit
    out = os.path.join(
        tempfile.gettempdir(),
        "aub_dpp_" + hashlib.md5(corpus.encode()).hexdigest()[:12],
    )
    with open(out + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not _dpp_layout_complete(out, fp):
                tmp = f"{out}.tmp.{os.getpid()}"
                shutil.rmtree(tmp, ignore_errors=True)
                ev = load_table(spark, sf_dir, "events").select(
                    "event_id", "value", "event_type"
                )
                ev.write.mode("overwrite").partitionBy(
                    "event_type"
                ).parquet(os.path.join(tmp, "fact"))
                dim = (
                    spark.read.parquet(os.path.join(tmp, "fact"))
                    .select("event_type")
                    .distinct()
                    .withColumn(
                        "tier",
                        F.when(
                            F.col("event_type").isin(
                                "click", "purchase"
                            ),
                            "hot",
                        ).otherwise("cold"),
                    )
                )
                dim.write.mode("overwrite").parquet(
                    os.path.join(tmp, "dim")
                )
                with open(os.path.join(tmp, "SOURCE"), "w") as f:
                    f.write(fp)
                # under the lock the incumbent is stale by definition
                # (incomplete or built from a regenerated corpus)
                shutil.rmtree(out, ignore_errors=True)
                os.rename(tmp, out)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    _DPP_LAYOUT_CACHE[key] = out
    return out


def _dpp_layout_complete(out: str, fingerprint: str) -> bool:
    """Both tables fully written AND built from the CURRENT corpus."""
    if not (
        os.path.isfile(os.path.join(out, "fact", "_SUCCESS"))
        and os.path.isfile(os.path.join(out, "dim", "_SUCCESS"))
    ):
        return False
    try:
        with open(os.path.join(out, "SOURCE")) as f:
            return f.read() == fingerprint
    except OSError:
        return False


@query(
    "q_join_dpp",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CASE WHEN event_type IN ('click', 'purchase')
                  THEN 'hot' ELSE 'cold' END AS tier
      FROM events
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 4) AS sum_value
    FROM events e
    JOIN dim d ON e.event_type = d.event_type
    WHERE d.tier = 'hot'
    GROUP BY e.event_type
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (r8 widening): the star-schema join
    where the partitions of the fact table to scan are only known at
    RUNTIME, from the dim side's filter — the partition-layout twin of
    the runtime bloom filter (tests/test_plans.py's
    ``test_runtime_bloom_filter_prunes_probe_side``).

    Mechanics: the event log is laid out Hive-partitioned by
    event_type (the ``q_sink_partitioned`` layout), the enum-sized
    type dim carries a non-key attribute (tier), and the query joins
    fact⋈dim with a LITERAL filter on that attribute. No literal
    predicate on the partition column exists anywhere in the query —
    static partition pruning is impossible. Catalyst's DPP rule turns
    the dim side into a reused-broadcast subquery on the fact scan:
    ``PartitionFilters: [dynamicpruning#...]``, so only the 'hot'
    partition directories are ever opened (asserted in
    tests/test_plans.py on this exact plan; fires under DEFAULT confs,
    vanilla-session safe).

    Scale (100 TB): THE fact-table access pattern — a date/tenant/
    type-partitioned event log joined against a filtered dim scans
    only the partitions the dim filter selects, turning a 100 TB scan
    into the few-TB slice that survives pruning, with zero literal
    leakage into the query text. The dim build (inside ``_dpp_layout``)
    derives from the fact layout's own partition values (a directory
    listing — the `select(partition_col).distinct()` of a partitioned
    scan reads no data pages) for fixture self-containment; the plan
    shape is identical for a real warehouse dim table. Both tables are
    written once per corpus at a deterministic path and memoized — a
    warm invocation writes NOTHING (r9; previously the dim re-wrote
    per call and evicting the memo leaked the tempdir and re-wrote the
    full event log per cold bench rep).
    """
    out = _dpp_layout(spark, sf_dir)
    fact = spark.read.parquet(os.path.join(out, "fact"))
    hot = spark.read.parquet(os.path.join(out, "dim")).filter(
        F.col("tier") == "hot"
    )
    return (
        fact.join(hot, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
