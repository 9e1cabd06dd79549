"""Language identification via corpus-trained n-gram profiles.

The classic n-gram approach (Cavnar & Trenkle, "N-Gram-Based Text
Categorization", 1994): build a per-language profile of the most frequent
word unigrams from labeled data, then classify each document by profile
overlap. Both phases are pure DataFrame algebra — two shuffles total
(profile build, then classify via broadcast join against the
dictionary-sized profile).

The fixture corpus (`documents`) is synthetic with a shared vocabulary
across `lang` labels, so absolute accuracy is meaningless here — the
declared query is checked for *engine parity* (identical scoring in the
DuckDB oracle), and the unit test asserts structural invariants
(exactly one prediction per doc, scores within bounds).

Scale design: the profile table is O(languages × PROFILE_K) — broadcast
side always. Classification is tokenize → explode → join(profile) →
groupBy(doc), i.e. one shuffle on doc_id whose payload is (lang, hits)
pairs, independent of document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

PROFILE_K = 20  # top-K words per language profile


def language_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, word, rank) — the PROFILE_K most frequent words per language.

    Deterministic tie-break (count DESC, word ASC) so both engines build
    byte-identical profiles.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("word").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PROFILE_K)
        .select("lang", "word", "rank")
    )


@query(
    "q_text_langid",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    counts AS (
      SELECT lang, word, COUNT(*) AS cnt FROM tok
      WHERE word <> '' GROUP BY lang, word
    ),
    profile AS (
      SELECT lang AS p_lang, word FROM (
        SELECT lang, word,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, word ASC) AS rank
        FROM counts
      ) WHERE rank <= {PROFILE_K}
    ),
    doc_tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    hits AS (
      SELECT t.doc_id, p.p_lang, CAST(COUNT(*) AS BIGINT) AS hits
      FROM doc_tok t JOIN profile p USING (word)
      WHERE t.word <> ''
      GROUP BY t.doc_id, p.p_lang
    )
    SELECT doc_id, p_lang AS pred_lang, hits
    FROM (
      SELECT doc_id, p_lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, p_lang ASC) AS rn
      FROM hits
    ) WHERE rn = 1
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict a language per document by n-gram-profile overlap.

    Tokens join against the broadcast profile; per-doc hit counts per
    candidate language; argmax with deterministic tie-break
    (hits DESC, lang ASC).
    """
    profiles = language_profiles(spark, sf_dir).select(
        F.col("lang").alias("p_lang"), "word"
    )
    d = load_table(spark, sf_dir, "documents")
    doc_tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    hits = (
        doc_tok.join(F.broadcast(profiles), "word")
        .groupBy("doc_id", "p_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("p_lang").asc()
    )
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("p_lang").alias("pred_lang"), "hits")
    )
