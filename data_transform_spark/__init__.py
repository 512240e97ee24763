"""data_transform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``ajscholl/data-transform`` (a DataFrame-transformation / ETL library; the
reference checkout at /root/reference is empty — see SURVEY.md §0, so the
spec is the driver contract in __spark_entry__.py plus the fixture tables).

Design principles (SURVEY.md §2 "100 TB design rule"):
  * DataFrame API only; Catalyst plans everything (no RDDs).
  * No collect() except final small results.
  * Broadcast small dimensions; bound every cross/theta join.
  * Arrow-batched pandas UDFs when Python is unavoidable; never per-row UDFs
    in hot paths.
"""

from data_transform_spark.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
__version__ = "0.1.0"
