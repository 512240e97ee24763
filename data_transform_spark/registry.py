"""Central operator registry.

Every operator from SURVEY.md §2 registers itself here via the ``register``
decorator. ``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` (when present) is the equivalent DuckDB SQL string the
driver hash-compares against. Keys without an oracle get the driver's weaker
rows-only check — only used for genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Register a query callable and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
