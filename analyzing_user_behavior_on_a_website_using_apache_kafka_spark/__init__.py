"""PySpark-native analytics engine with the query surface of the reference
clickstream pipeline (KrystianPupiec/Analyzing-user-behavior-on-a-website-
using-Apache-Kafka).

The reference is a Kafka -> Python batch-recompute -> PDF pipeline
(``Raport.py:31-227``). This package re-expresses its semantics — and the
standard analytics surface they generalize to (SURVEY.md §2.2) — as idiomatic
PySpark: declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the incremental path, and Pandas-UDF-backed custom operators
only where built-ins genuinely cannot express the semantics.

Layout:
    session     SparkSession builder tuned for local[N] test + cluster scale
    catalog     table loaders / temp-view registration for the fixture tables
    registry    query + oracle registration (drives __spark_entry__)
    operators/  batch relational surface (scans, filters, joins, aggs, windows,
                sorts/set-ops, scalar function packs)
    functions/  north-star ops: dedup, similarity, text analysis, multimodal
    streaming/  Structured Streaming jobs incl. reference report parity
    sources/    source/sink helpers (kafka-shaped stream, file stream, append)
    plans/      plan inspection / explain helpers (scale design notes)
"""

__version__ = "0.1.0"
