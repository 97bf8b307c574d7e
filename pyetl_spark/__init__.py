"""pyetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL tool (JohnOmernik/pyetl),
extended with LLM-data-pipeline operators (dedup, similarity search, text
analysis) and designed for 100 TB scale.

Architecture: everything is declared through the DataFrame / Spark SQL API so
Catalyst + Tungsten own the physical plan (predicate pushdown, column pruning,
join selection, AQE). Python touches data only through Arrow-batched pandas
UDFs, and only where built-in functions cannot express the semantics.

Capability basis: SURVEY.md §2 (operator inventory), §7 (build plan). The
reference mount was empty at survey time (SURVEY.md §0), so parity claims cite
the survey's provenance-tagged inventory rather than reference file:line.
"""

from pyetl_spark.session import get_session, tune
from pyetl_spark.tables import TABLE_NAMES, load_tables

__all__ = ["get_session", "tune", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
