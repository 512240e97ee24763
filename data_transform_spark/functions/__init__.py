"""Importing this package registers all §2.H/§2.J function-bundle operators."""

from data_transform_spark.functions import (  # noqa: F401
    arrays,
    dates,
    json_map,
    maths,
    strings,
    udfs,
)
