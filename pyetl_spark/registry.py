"""Query registry — the contract surface for the driver harness.

Every operator from SURVEY.md §2 registers here via the ``@query`` decorator:

    @query("agg_groupby_pricing", oracle="SELECT ...")
    def agg_groupby_pricing(spark, sf_dir) -> DataFrame: ...

Tier A keys pass an ``oracle`` (DuckDB ANSI SQL over the pre-registered
views); Tier B keys omit it (driver records a rows-only check). Tier C
(streaming-only) never registers — those live in tests/.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over these
dicts, so adding an operator is one decorated function in one module.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key``; ``oracle`` is its DuckDB SQL twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators run (idempotent)."""
    from pyetl_spark import queries as _q  # noqa: F401

    _q.load()
