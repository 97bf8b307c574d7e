"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference's extensibility story is "plug a new feed into the engine";
Spark 4's Python DataSource API is the idiomatic port of that surface: a
pure-Python reader class is registered once per session and then consumed
through the ordinary `spark.read.format(...)` path — schema, options,
partition planning, and per-partition iteration all declared, with Spark
distributing one `read(partition)` call per task.

Scale contract: `partitions()` returns the parallelism plan — each
InputPartition is an independent task, so a 1000-executor cluster fans the
read out with zero coordination beyond the plan itself (the same contract
parquet splits satisfy). The generator below is deterministic per (row id),
so the output is engine-checkable: the DuckDB oracle reproduces it from
`range()` exactly. No randomness, no wall clock.

This is the *batch* half of the API; a `SimpleDataSourceStreamReader` twin
would serve the streaming path (offset bookkeeping replaces the static
partition plan) — not registered here because the batch contract is the
oracle-checkable one.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth's multiplicative-hash constant — a cheap deterministic scrambler
#: both engines can evaluate exactly in 64-bit integer arithmetic.
_MIX = 2654435761


def ship_by_value() -> None:
    """Register this module for by-value cloudpickle so the DataSource
    class deserializes on Python workers WITHOUT the repo on their
    PYTHONPATH (same posture as operators/multimodal.py: self-contained
    task closures unless the package is installed cluster-wide). Must be
    pyspark's VENDORED cloudpickle — the workers deserialize with
    pyspark.serializers, which ignores the standalone package's registry."""
    from pyspark import cloudpickle

    import pyetl_spark.operators.pydatasource as _self

    cloudpickle.register_pickle_by_value(_self)


class SyntheticEventsReader(DataSourceReader):
    """Deterministic generator: ids [0, rows) split evenly over `parts`."""

    def __init__(self, rows: int, parts: int) -> None:
        self._rows = rows
        self._parts = parts

    def partitions(self) -> Sequence[InputPartition]:
        # one InputPartition per planned task; value = partition ordinal
        return [InputPartition(i) for i in range(self._parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # contiguous id slab per partition → no overlap, full coverage
        p = partition.value
        lo = (self._rows * p) // self._parts
        hi = (self._rows * (p + 1)) // self._parts
        for i in range(lo, hi):
            yield (i, i % 13, (i * _MIX) % 1000)


class SyntheticEventsSource(DataSource):
    """`spark.read.format("pyetl_synth_events").option("rows", n)...`"""

    @classmethod
    def name(cls) -> str:
        return "pyetl_synth_events"

    def schema(self) -> str:
        return "id BIGINT, bucket BIGINT, val BIGINT"

    def reader(self, schema) -> SyntheticEventsReader:  # noqa: ANN001
        return SyntheticEventsReader(
            rows=int(self.options.get("rows", 10000)),
            parts=int(self.options.get("parts", 8)),
        )
