"""Physical-layout and plan-shaping helpers (SURVEY.md §4, north-star
scale posture): bucketing for shuffle-free co-located joins, deterministic
salting for skewed keys. Catalyst owns logical optimization; this package
only shapes the *data layout* decisions Catalyst can't make for you."""

from pyetl_spark.plans.layout import (
    bucketed_join,
    colocate_join,
    salted_join,
    zorder_repartition,
    zvalue,
    write_bucketed,
)

__all__ = [
    "write_bucketed",
    "bucketed_join",
    "colocate_join",
    "salted_join",
    "zorder_repartition",
    "zvalue",
]
