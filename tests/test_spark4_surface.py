"""Spark 4 modern-surface operators: SQL UDF inlining, Python Data Source
API, native XML, VARIANT-in-parquet. The oracle hash-match for each lives in
test_oracle_parity / the canon sweep; these tests pin the *mechanism* claims
the docstrings make (codegen inlining, partition fan-out, lossless storage).
"""

from __future__ import annotations

import pytest as _pytest

# fast-lane member (pyproject [tool.pytest.ini_options] markers):
# Spark-4 surface mechanism probes — ~30 s, no per-key fixture sweeps
pytestmark = _pytest.mark.fast

import contextlib
import io

from pyspark.sql import functions as F

from pyetl_spark import registry
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE

registry.load_all()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestSqlUdf:
    def test_inlined_no_python(self, spark):
        """The whole point of a SQL UDF: the physical plan must contain the
        expanded arithmetic, not a UDF call node or a Python eval."""
        df = registry.QUERIES["fn_sql_udf"](spark, SF_ORACLE)
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "pyetl_disc_price" not in plan  # fully inlined by analyzer
        assert "HashAggregate" in plan

    def test_constant_folds_through_body(self, spark):
        """A literal argument folds through the function body — the
        optimizer sees through the abstraction."""
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION pyetl_t_fold(p DOUBLE) "
            "RETURNS DOUBLE RETURN p * (1.0 - 0.1)"
        )
        plan = _plan(spark.sql("SELECT pyetl_t_fold(id * 1.0) FROM range(5)"))
        # body folded to * 0.9 (the name survives only as the output alias)
        assert "* 0.9" in plan and "- 0.1" not in plan


class TestPythonDataSource:
    def test_partition_count_invariance(self, spark):
        """Same rows regardless of the partition plan — the slab math in
        SyntheticEventsReader.read covers [0, rows) exactly once for any
        `parts`, including parts that don't divide rows."""
        from pyetl_spark.operators.pydatasource import SyntheticEventsSource

        with contextlib.suppress(Exception):
            spark.dataSource.register(SyntheticEventsSource)
        a = (
            spark.read.format("pyetl_synth_events")
            .option("rows", 1013)  # prime: every parts choice has ragged slabs
            .option("parts", 7)
            .load()
        )
        b = (
            spark.read.format("pyetl_synth_events")
            .option("rows", 1013)
            .option("parts", 3)
            .load()
        )
        assert a.count() == 1013 == b.count()
        assert a.exceptAll(b).count() == 0 == b.exceptAll(a).count()

    def test_reader_parallelism_plan(self, spark):
        """partitions() drives task fan-out: 8 requested → 8 RDD splits."""
        from pyetl_spark.operators.pydatasource import SyntheticEventsSource

        with contextlib.suppress(Exception):
            spark.dataSource.register(SyntheticEventsSource)
        d = (
            spark.read.format("pyetl_synth_events")
            .option("rows", 100)
            .option("parts", 8)
            .load()
        )
        assert d.rdd.getNumPartitions() == 8


class TestXml:
    def test_fixture_domain_is_escape_free(self, spark):
        """source_xml_parse builds XML by concat (no entity escaping), which
        is only sound because the encoded string columns contain no XML
        metacharacters — pin that fixture contract so a future fixture
        change fails loudly here rather than silently corrupting the key."""
        o = load_tables(spark, SF_ORACLE).orders
        bad = o.filter(
            F.col("o_orderpriority").rlike("[&<>\"']")
            | F.col("o_orderstatus").rlike("[&<>\"']")
        )
        assert bad.count() == 0

    def test_escaped_content_roundtrips_via_to_xml(self, spark):
        """The general-content path: to_xml performs entity escaping, and
        from_xml reverses it — the pair is the production encode/decode."""
        df = spark.createDataFrame(
            [(1, 'a & b < c > "d"')], "id long, s string"
        )
        xml = df.select(F.to_xml(F.struct("id", "s")).alias("x"))
        back = xml.select(
            F.from_xml("x", "id BIGINT, s STRING").alias("r")
        ).select("r.*")
        row = back.collect()[0]
        assert row["id"] == 1 and row["s"] == 'a & b < c > "d"'


class TestVariantParquet:
    def test_readback_schema_is_variant(self, spark):
        df = registry.QUERIES["sink_parquet_variant"](spark, SF_ORACLE)
        # the key itself aggregates; assert the stored column type directly
        from pyetl_spark.queries.sinks import _scratch

        back = spark.read.parquet(_scratch("parquet_variant"))
        assert dict(back.dtypes)["v"] == "variant"
        assert df.count() > 0

    def test_try_variant_get_null_on_missing(self, spark):
        v = spark.range(1).select(
            F.parse_json(F.lit('{"a": 1}')).alias("v")
        )
        row = v.select(
            F.try_variant_get("v", "$.missing", "int").alias("m"),
            F.variant_get("v", "$.a", "int").alias("a"),
        ).collect()[0]
        assert row["m"] is None and row["a"] == 1


class TestSqlParams:
    def test_bound_parameter_reaches_pushed_filters(self, spark):
        """Parameters resolve before optimization: the :min_price bind
        must appear in the parquet scan's PushedFilters, identical to an
        inlined literal."""
        df = registry.QUERIES["fn_sql_params"](spark, SF_ORACLE)
        plan = _plan(df)
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(o_totalprice,150000.0)" in plan
        assert "EqualTo(o_orderstatus,O)" in plan


class TestSqlScripting:
    def test_script_returns_last_statement_result(self, spark):
        prev = spark.conf.get("spark.sql.scripting.enabled")
        spark.conf.set("spark.sql.scripting.enabled", "true")
        try:
            r = spark.sql(
                """
                BEGIN
                  DECLARE v BIGINT DEFAULT 0;
                  SET v = (SELECT sum(id) FROM range(10));
                  SELECT v AS total;
                END
                """
            ).collect()
        finally:
            spark.conf.set("spark.sql.scripting.enabled", prev)
        assert r[0]["total"] == 45


class TestSlabMathProperties:
    def test_slabs_partition_exactly(self):
        """Pure-Python property: for ANY (rows, parts), the per-partition
        id slabs cover [0, rows) exactly once — the invariant both the
        batch reader and a cluster's task fan-out rely on."""
        from hypothesis import given, strategies as st

        from pyetl_spark.operators.pydatasource import SyntheticEventsReader

        @given(
            rows=st.integers(min_value=0, max_value=100_000),
            parts=st.integers(min_value=1, max_value=64),
        )
        def check(rows: int, parts: int) -> None:
            r = SyntheticEventsReader(rows=rows, parts=parts)
            seen = []
            for p in r.partitions():
                seen.extend(t[0] for t in r.read(p))
            assert sorted(seen) == list(range(rows))

        check()

    def test_stream_offsets_partition_exactly(self):
        """Stream twin: consecutive read() calls and readBetweenOffsets
        over the same range yield identical, gap-free id sequences."""
        from hypothesis import given, strategies as st

        from pyetl_spark.operators.pydatasource import CounterStreamReader

        @given(
            step=st.integers(min_value=1, max_value=1000),
            batches=st.integers(min_value=1, max_value=10),
        )
        def check(step: int, batches: int) -> None:
            r = CounterStreamReader(step=step)
            off = r.initialOffset()
            ids = []
            for _ in range(batches):
                it, nxt = r.read(off)
                ids.extend(t[0] for t in it)
                off = nxt
            assert ids == list(range(step * batches))
            replay = [t[0] for t in r.readBetweenOffsets({"n": 0}, off)]
            assert replay == ids

        check()
