"""Measure the aggregate resident set of the session-lifetime persists.

The ``_CACHE_OWNERSHIP`` contract (``functions/dedup.py`` header) claims
every ``persist(MEMORY_AND_DISK)`` relation is a SLIM projection — ids +
hashes, never document text or embeddings — so the whole-session cache
footprint is O(corpus keys), spilling rather than evicting.  VERDICT r9
item 6: nothing measured that across a full sweep.  This tool does: it
runs every persisting query key in ONE session at the given sf_dir,
materializes each (count action), then sums the JVM BlockManager's
per-RDD storage info.

Usage:  python tools/cache_pressure.py [sf_dir]
Prints one JSON line: total/mem/disk bytes, per-RDD breakdown, and
bytes-per-document-row (the slimness ratio the contract implies).

The pytest wrapper (tests/test_plans.py::test_session_cache_stays_slim)
asserts the budget so the claim is a check, not a docstring.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every registered key whose served plan owns >= 1 session-lifetime
# persist (the _CACHE_OWNERSHIP census; grep `persist(StorageLevel` in
# the package to re-derive).  A new persisting key belongs HERE plus in
# session.evict_caches if it adds a memo dict.
PERSISTING_KEYS: tuple[str, ...] = (
    "q_dedup_near",            # minhash signatures
    "q_dedup_ngram_jaccard",   # jaccard prefix postings (+ _PAIR_CACHE)
    "q_dedup_containment",     # containment ordered tokens
    "q_dedup_editdist",        # location-prefix postings
    "q_dedup_simhash",         # simhash signatures
    "q_dedup_embed_cosine",    # LSH buckets + scored half-pairs
    "q_dedup_semantic",        # centroid assignment
    "q_dedup_clusters",        # verified-pair memo (_PAIR_CACHE)
    "q_dedup_incremental",     # bucketed md5 index side
    "q_time_rollup",           # O(hours×types) hourly base memo
    "q_time_interpolate",      # same hourly base (shared memo entry)
    "q_sim_timeseries",        # O(users×24) profile memo
    "q_sample_temperature",    # O(languages) count relation
    "q_sample_stratified",     # rates + thinned (memoized r10)
)


def measure(spark, sf_dir: str) -> dict:
    """Evict, run every persisting key to completion, and report the
    aggregate BlockManager residency."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        registry,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        evict_caches,
    )

    evict_caches(spark)
    qs = registry.all_queries()
    for k in PERSISTING_KEYS:
        qs[k](spark, sf_dir).count()

    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    rdds = [
        {
            "name": (i.name() or "").strip(),
            "mem_bytes": i.memSize(),
            "disk_bytes": i.diskSize(),
            "partitions": i.numCachedPartitions(),
        }
        for i in infos
    ]
    import duckdb

    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchone()[0]
    mem = sum(r["mem_bytes"] for r in rdds)
    disk = sum(r["disk_bytes"] for r in rdds)
    return {
        "sf_dir": sf_dir,
        "n_keys": len(PERSISTING_KEYS),
        "n_cached_rdds": len(rdds),
        "mem_bytes": mem,
        "disk_bytes": disk,
        "total_bytes": mem + disk,
        "n_documents": n_docs,
        "bytes_per_doc": round((mem + disk) / max(n_docs, 1), 1),
        "rdds": sorted(rdds, key=lambda r: -r["mem_bytes"])[:10],
    }


def main() -> int:
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cache_pressure", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    rep = measure(spark, sf_dir)
    print(json.dumps(rep))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
