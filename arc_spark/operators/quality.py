"""Repetition-based quality filtering (Gopher/C4-style gates).

LLM corpus curation drops documents whose text is internally repetitive —
boilerplate, scraped navigation, keyword stuffing. The standard gates
(Rae et al. 2021 "Gopher", §A.1.1) are ratios over the document's own
token stream: fraction of distinct words, and the fraction of the
document occupied by its single most frequent word. The reference engine
stops at storage-level dedup (arc `internal/compaction/dedup.go`);
intra-document repetition profiling is part of the training-data
pipeline this engine adds on top.

Scale design: one explode + two grouped aggregations, all codegen'd
JVM-side — no joins, no windows, no Python. The (doc_id, word) key is
fine-grained, so the shuffle spreads evenly no matter how skewed document
sizes are; partial (map-side) aggregation collapses each partition's
word runs before anything crosses the network. A 100 TB corpus profiles
in one pass at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_profile(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_distinct_frac: float = 0.45,
    max_top_word_frac: float = 0.10,
) -> DataFrame:
    """Per-document repetition metrics + keep/drop decision.

    Output: (id, n_words, distinct_frac, top_word_frac, keep) where
    distinct_frac = |distinct words| / |words| and top_word_frac =
    max word count / |words|. ``keep`` applies both Gopher-style gates.

    All three counts come from ONE explode → groupBy(id, word) →
    groupBy(id) pipeline: n_words = Σ counts, n_distinct = row count,
    top = max count — no second scan, no join back to the documents.
    """
    words = documents.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    per_word = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_word.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    distinct_frac = F.col("n_distinct") / F.col("n_words")
    top_frac = F.col("top_c") / F.col("n_words")
    return agg.select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        distinct_frac.alias("distinct_frac"),
        top_frac.alias("top_word_frac"),
        (
            (distinct_frac >= F.lit(min_distinct_frac))
            & (top_frac <= F.lit(max_top_word_frac))
        ).alias("keep"),
    )
