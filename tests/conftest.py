"""Shared test fixtures: one SparkSession per test run, a DuckDB oracle
connection per scale factor, and the parity comparator that mirrors the
driver's t2 gate (row-count + schema + order-insensitive value compare)."""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.session import get_session
from pyetl_spark.tables import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("PYETL_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("pyetl-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()


def _norm_value(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT bit compare — pyetl_spark.parity engineers bit-identical
        # floats on both engines, and the driver's value-hash is assumed
        # exact too. 0.0 == -0.0 in Python; acceptable (both engines
        # produce the sign identically from identical ops).
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    # duckdb may hand back Decimal for some exprs
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_value(float(v))
    except ImportError:
        pass
    return v


def _normalize(cols, rows):
    """Sort columns by name (driver behavior), then sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted_cols, out


def _type_cat(t: str) -> str:
    """Coarse type category for cross-engine schema comparison — int vs
    float crossings (e.g. Spark ceil→BIGINT vs DuckDB ceil→DOUBLE) pass a
    Python == on values (1 == 1.0) but can break a value hash."""
    t = str(t).lower()
    if "[]" in t or t.startswith(("array", "list", "struct", "map")):
        return "nested"
    if t.startswith(
        ("tinyint", "smallint", "integer", "bigint", "hugeint", "int",
         "long", "short", "byte", "ubigint", "uint", "usmallint", "utinyint")
    ):
        return "int"
    if t.startswith(("double", "float", "real", "decimal")):
        return "float"
    if t.startswith("bool"):
        return "bool"
    if "timestamp" in t:
        return "ts"
    if t == "date":
        return "date"
    return "str"


def assert_parity(spark, duck, key: str, sf_dir: str = SF_ORACLE):
    """Run engine query + DuckDB oracle, compare EXACTLY like the driver:
    toPandas (catches Arrow ns-overflow), pandas sort_values over all
    columns (catches unsortable array cells), then a type-strict value
    compare (catches int/float crossings such as DuckDB HUGEINT sums).
    See pyetl_spark/canon.py for the r1 failure modes this encodes."""
    from pyetl_spark import registry
    from pyetl_spark.canon import canon_frame, frame_rows

    registry.load_all()
    sdf = registry.QUERIES[key](spark, sf_dir)
    pdf_s = canon_frame(sdf.toPandas())

    s_cats = {c: _type_cat(t) for c, t in sdf.dtypes}
    type_rel = duck.sql(registry.ORACLE[key])
    d_cats = dict(zip(type_rel.columns, [_type_cat(t) for t in type_rel.types]))
    cat_mismatch = {
        c: (s_cats[c], d_cats[c])
        for c in s_cats
        if c in d_cats and s_cats[c] != d_cats[c]
    }
    assert not cat_mismatch, f"{key}: type-category mismatch {cat_mismatch}"

    pdf_d = canon_frame(duck.execute(registry.ORACLE[key]).df())

    assert len(pdf_s) == len(pdf_d), (
        f"{key}: row count {len(pdf_s)} (spark) != {len(pdf_d)} (duckdb)"
    )
    assert list(pdf_s.columns) == list(pdf_d.columns), (
        f"{key}: columns {list(pdf_s.columns)} != {list(pdf_d.columns)}"
    )
    ns_rows, nd_rows = frame_rows(pdf_s), frame_rows(pdf_d)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(ns_rows, nd_rows)) if a != b
    ]
    assert not mismatches, (
        f"{key}: {len(mismatches)}/{len(ns_rows)} rows differ; first 3: "
        f"{mismatches[:3]}"
    )
