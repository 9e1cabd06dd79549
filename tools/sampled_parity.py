"""Sampled sf0.1 oracle parity for the pair-join keys whose DuckDB
oracle is intractable at full sf0.1.

VERDICT r9 item 7: `q_dedup_ngram_jaccard`, `q_dedup_editdist`, and
`q_dedup_clusters` have exact sf0.01 oracle parity plus property tests,
but at sf0.1 the single-threaded DuckDB pair join (12.5M candidate
pairs, per-pair array/levenshtein work) needs hours — so 10x parity
rested on property tests alone.  This closes it: restrict the sf0.1
documents table to a DETERMINISTIC hash-bucket sample (the same
first-8-md5-hex-chars bucket every sampler in functions/sampling.py
uses — no RNG, reproducible across runs and engines), publish the
restriction as a corpus dir, and run the ENGINE query and the DuckDB
oracle side-by-side on it.  Duplicate-pair semantics restrict cleanly:
a pair survives the restriction iff BOTH docs do, and both engines see
the identical restricted corpus, so equality on the sample is exact
parity on real sf0.1 content/density — not a tolerance invariant.

Usage:  python tools/sampled_parity.py [sf_dir] [bucket_pct]
Defaults: /root/testdata/sf0.1, 20 (~1000 of 5000 docs → ~500k
candidate pairs, minutes for DuckDB instead of hours).
Prints one JSON line per key + a summary; exit 1 on any mismatch.
Recorded per-round in SCALE.md ("Sampled sf0.1 parity").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

KEYS = ("q_dedup_ngram_jaccard", "q_dedup_editdist", "q_dedup_clusters")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_restricted_corpus(sf_dir: str, bucket_pct: int) -> str:
    """Publish a corpus dir whose documents table is the deterministic
    hash-bucket restriction of sf_dir's; every other table symlinks to
    the original.  Same write-once fingerprint + flock discipline as
    fixtures.materialized_fixture (this tool may race a concurrent
    sweep's fixture builders in /tmp)."""
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.fixtures import (
        materialized_fixture,
    )

    def _build(tmp: str) -> None:
        con = duckdb.connect()
        src = os.path.join(sf_dir, "documents.parquet")
        con.execute(
            f"""
            COPY (
              SELECT * FROM '{src}'
              WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)
                      % 100 < {bucket_pct}
            ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)
            """
        )
        for t in TABLES:
            if t == "documents":
                continue
            s = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(s):
                os.symlink(s, os.path.join(tmp, f"{t}.parquet"))

    return materialized_fixture(
        f"parity{bucket_pct}", sf_dir, ["documents"], _build
    )


def main() -> int:
    from check_oracle import canon

    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark import (
        registry,
    )
    from analyzing_user_behavior_on_a_website_using_apache_kafka_spark.session import (
        get_spark,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bucket_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    restricted = build_restricted_corpus(sf_dir, bucket_pct)

    spark = get_spark(
        "sampled_parity", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{os.path.join(restricted, t + '.parquet')}'"
        )
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]

    qs, oracles = registry.all_queries(), registry.all_oracles()
    failures = []
    for name in KEYS:
        t0 = time.time()
        sdf = qs[name](spark, restricted)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        match = (
            sorted(c.lower() for c in scols)
            == sorted(c.lower() for c in dcols)
            and len(srows) == len(drows)
            and canon(srows, scols) == canon(drows, dcols)
        )
        if not match:
            failures.append(name)
        print(json.dumps({
            "key": name,
            "match": match,
            "rows": len(srows),
            "oracle_rows": len(drows),
            "n_docs": n_docs,
            "bucket_pct": bucket_pct,
            "spark_sec": round(t_spark, 2),
            "duckdb_sec": round(t_duck, 2),
        }))
    print(
        f"{len(KEYS) - len(failures)}/{len(KEYS)} sampled-parity passed"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
