"""LLM-data-pipeline operators (SURVEY.md §2.K) — dedup, similarity,
text analysis, multimodal columns. Importing registers all keys."""

from data_transform_spark.pipeline import (  # noqa: F401
    curation,
    dedup,
    e2e,
    multimodal,
    retrieval,
    similarity,
    text,
    training,
)
