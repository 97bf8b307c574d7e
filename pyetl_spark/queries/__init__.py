"""Query modules, one per SURVEY.md §2 family. ``load()`` imports them all so
their ``@query`` decorators populate the registry."""

from __future__ import annotations

import importlib

_MODULES = [
    "scans",
    "etl",
    "aggs",
    "joins",
    "windows",
    "sorts_sets",
    "subqueries",
    "tpch_more",
    "extras",
    "scalar_fns",
    "events_windows",
    "analytics",
    "timeseries",
    "llm_text",
    "llm_vec",
    "llm_scale",
    "udfs",
    "sinks",
    "stats",
    "hierarchy",
    "geo",
]


def load() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(f"pyetl_spark.queries.{mod}")
        except ModuleNotFoundError as exc:
            # allow partial builds while modules land incrementally
            if f"pyetl_spark.queries.{mod}" not in str(exc):
                raise
