"""Dedup test corpus: ``documents`` ∪ deterministic mutants.

The raw synthetic documents are near-orthogonal bags of words, so real
near-duplicate structure is synthesized (as with pages.py): every 10th
doc gets a near-dup copy (one appended token, id+100000) and every
20th an exact copy (id+200000).  Twin derivations for Spark and DuckDB,
parity-tested like the pages table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NEAR_OFF = 100_000
EXACT_OFF = 200_000


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    near = (
        d.where(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + NEAR_OFF).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" neardup tail")).alias("text"),
        )
    )
    exact = d.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + EXACT_OFF).alias("doc_id"), F.col("text")
    )
    return d.unionByName(near).unionByName(exact)


def corpus_cte() -> str:
    return f"""
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + {NEAR_OFF} AS doc_id, text || ' neardup tail' AS text
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + {EXACT_OFF} AS doc_id, text FROM documents WHERE doc_id % 20 = 0
""".strip()


def corpus_with() -> str:
    return f"WITH corpus AS (\n{corpus_cte()}\n)"
