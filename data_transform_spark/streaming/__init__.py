"""Structured Streaming operators (SURVEY.md §2.I). Importing registers keys."""

from data_transform_spark.streaming import ops  # noqa: F401
