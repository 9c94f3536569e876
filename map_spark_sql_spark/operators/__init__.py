"""North-star extension operators (SURVEY.md §2.8).

Beyond the reference's surface: the operations a large-scale LLM training-data
pipeline needs — deduplication, similarity search, text analysis, multimodal
columns — built Spark-first on the ``documents`` / ``embeddings`` tables.
"""

from map_spark_sql_spark.operators.dedup import (
    content_hash,
    exact_dedup,
    minhash_signatures,
    minhash_pairs,
    simhash,
    simhash_pairs,
)
from map_spark_sql_spark.operators.similarity import cosine_topk, cosine_pairs_lsh
from map_spark_sql_spark.operators.text import (
    language_guess,
    quality_stats,
    token_fingerprint,
)

__all__ = [
    "content_hash",
    "exact_dedup",
    "minhash_signatures",
    "minhash_pairs",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "cosine_pairs_lsh",
    "language_guess",
    "quality_stats",
    "token_fingerprint",
]
