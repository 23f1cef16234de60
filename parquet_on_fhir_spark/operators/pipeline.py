"""End-to-end training-corpus curation pipeline (the composition the
LLM-data operators exist for): exact dedup → MinHash near-dedup →
quality/language filters → token budgeting.

Single lazy DataFrame graph — Catalyst fuses the filter stages into the
scans; the only shuffles are the two dedup key-exchanges and the final
budget window. Every stage is the already-tested operator from
dedup.py / text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators import text as tx
from parquet_on_fhir_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: list[str] | None = None,
    near_dup_threshold: float = 0.8,
    token_budget: int | None = None,
    embeddings: DataFrame | None = None,
    embedding_threshold: float = 0.95,
) -> DataFrame:
    """Returns the curated corpus with ``quality`` and ``n_tokens``
    columns attached.

    Stages (in pipeline order):
    1. exact dedup (content hash; min-id survivor)
    2. near-dedup: MinHash-LSH pairs ≥ threshold → drop the higher id of
       each pair (keep-first, mirroring exact dedup's survivor rule)
    2b. optional embedding near-dedup: ``embeddings`` is a DataFrame of
        (id_col, embedding array); sign-LSH-bucketed cosine pairs ≥
        ``embedding_threshold`` drop the higher id — catches semantic
        duplicates the text-shingle pass misses (translations,
        paraphrases, re-renders).
    3. quality + optional language filter (JVM expressions)
    4. optional token budget: order by quality desc (id tiebreak) and
       keep documents while the running token total fits the budget —
       a deterministic greedy knapsack via a window running sum.
    """
    d = exact_dedup(docs, text_col, id_col)

    sigs = minhash_signatures(d, text_col, id_col, num_hashes=32)
    pairs = minhash_lsh_pairs(sigs, id_col, num_bands=8, jaccard_threshold=near_dup_threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    d = d.join(losers, id_col, "left_anti")

    if embeddings is not None:
        from parquet_on_fhir_spark.operators.dedup import embedding_near_dup_pairs

        epairs = embedding_near_dup_pairs(
            embeddings, id_col, "embedding", threshold=embedding_threshold
        )
        elosers = epairs.select(F.col("id_b").alias(id_col)).distinct()
        d = d.join(elosers, id_col, "left_anti")

    d = d.withColumn("quality", F.round(tx.quality_score(text_col), 4)).withColumn(
        "n_tokens", tx.token_count(text_col).cast("long")
    )
    d = d.filter(F.col("quality") >= min_quality)
    if languages:
        d = d.filter(tx.detect_language(text_col).isin(*languages))

    if token_budget is not None:
        w = (
            Window.orderBy(F.desc("quality"), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        d = (
            d.withColumn("__running", F.sum("n_tokens").over(w))
            .filter(F.col("__running") <= token_budget)
            .drop("__running")
        )
    return d
