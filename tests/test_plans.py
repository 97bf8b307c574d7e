"""Physical-plan quality gates (SURVEY.md §4, north-star scale posture).

Correctness tests prove the answer is right; these prove the *plan* is the
one you'd want at 100 TB: filters reach the parquet scan, projections prune
the read schema, small dims broadcast, aggregates split partial/final, and
nothing silently degenerates to a cartesian product.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re

import pytest

pytestmark = pytest.mark.medium

from pyetl_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


#: (key, mode) → plan text. Building a query's DataFrame runs its eager
#: side effects (bloom builds collect, sinks write), so the two
#: registry-wide lints (nested-loop + python-eval) must not each pay that
#: cost per key — the plan is identical; render it once.
_PLAN_CACHE: dict[tuple[str, str], str] = {}


def plan_of(spark, key: str, mode: str = "formatted") -> str:
    cached = _PLAN_CACHE.get((key, mode))
    if cached is not None:
        return cached
    df = registry.QUERIES[key](spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    plan = buf.getvalue()
    _PLAN_CACHE[(key, mode)] = plan
    return plan


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "scan_pushdown_filter")
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_quantity,49.0)" in plan


def test_projection_prunes_read_schema(spark):
    plan = plan_of(spark, "scan_parquet_project")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the 3 projected columns leave the file (orders has 6)
    assert "o_orderkey" in read_schema
    assert "o_totalprice" not in read_schema
    assert "o_orderdate" not in read_schema


def test_pandas_boundaries_project_before_arrow(spark):
    """applyInPandas / mapInPandas ship EVERY input column through
    Arrow — Catalyst cannot prune past the Python boundary, so the
    query must project first (r14: both keys were crossing the full
    source row for a 3/4-column transform)."""
    plan = plan_of(spark, "grouped_map_applyInPandas")
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_totalprice" in rs
    assert "o_custkey" not in rs and "o_orderdate" not in rs
    plan = plan_of(spark, "map_partitions_arrow")
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_discount" in rs
    assert "l_partkey" not in rs and "l_shipdate" not in rs


def test_q1_aggregate_is_partial_final(spark):
    plan = plan_of(spark, "agg_groupby_pricing")
    # map-side combine: two HashAggregate nodes around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_broadcast_hint_plumbing(spark):
    plan = plan_of(spark, "join_broadcast_hint")
    assert "BroadcastHashJoin" in plan


def test_q3_no_cartesian_and_filters_pushed(spark):
    plan = plan_of(spark, "join_multi_3way")
    assert "CartesianProduct" not in plan
    # every base table's filter reached its scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_theta_range_join_stays_hash(spark):
    """The equi conjunct must keep this a hash join (range as post-filter),
    never a nested loop over the whole fact table."""
    plan = plan_of(spark, "join_theta_range")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_is_take_ordered(spark):
    plan = plan_of(spark, "topk_limit")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_q1(spark):
    """AQE finalizes the plan only on execution; the executed plan must show
    fused codegen stages (`*(n)` markers)."""
    df = registry.QUERIES["agg_groupby_pricing"](spark, SF_ORACLE)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan


def test_asof_join_single_shuffle(spark):
    """The as-of rewrite must cost ONE exchange on the key (union + window),
    not a pair join."""
    plan = plan_of(spark, "join_asof", mode="simple")
    assert "Join" not in plan.replace("SortMergeJoin", "")  # no join at all
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.mark.parametrize("key", ["dedup_exact", "text_top_terms"])
def test_llm_aggs_have_partial_combine(spark, key):
    plan = plan_of(spark, key)
    assert plan.count("HashAggregate") >= 2


def test_partitioned_sink_readback_prunes_partitions(spark):
    """Filtering the Hive-layout read-back on the partition key must prune
    at planning time (PartitionFilters), not scan all dt= dirs."""
    import os
    import tempfile

    from pyetl_spark.tables import load_tables
    from pyspark.sql import functions as F

    path = os.path.join(tempfile.gettempdir(), "pyetl_prune_check")
    ev = load_tables(spark, SF_ORACLE).events.select(
        "event_id", "value", F.to_date("ts").alias("dt")
    )
    ev.write.partitionBy("dt").mode("overwrite").parquet(path)
    one_day = spark.read.parquet(path).filter(
        F.col("dt") == "2024-01-05"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters", 1)[1][:200]


def test_topk_per_group_agg_has_no_window_sort(spark):
    """The aggregate-form top-k must plan as a hash aggregate with
    map-side partial lists — no Window operator, no per-partition sort
    of the full input (that's exactly what it exists to avoid)."""
    plan = plan_of(spark, "topk_per_group_agg")
    assert "Window" not in plan
    assert plan.count("ObjectHashAggregate") + plan.count("SortAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_funnel_reuses_user_id_exchange(spark):
    """All three funnel stages shuffle on user_id; Catalyst/AQE must not
    plan a cartesian product and every join stays an equi-join."""
    plan = plan_of(spark, "events_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """100 TB posture: a selective dim-side filter must be able to inject
    a runtime bloom filter into the fact scan (InjectRuntimeFilter →
    might_contain guard) when broadcast is off the table — the mechanism
    that prunes shuffle input when the filter itself isn't pushable.
    Thresholds are production-scale gates, so the test lowers them to
    demonstrate the rewrite and restores the session confs after."""
    from pyspark.sql import functions as F

    from pyetl_spark.tables import load_tables

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t = load_tables(spark, SF_ORACLE)
        o, li = t.orders, t.lineitem
        j = li.join(
            o.filter(F.col("o_totalprice") > 450000),
            li.l_orderkey == o.o_orderkey,
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized
        assert "bloom_filter_agg" in optimized
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_range_join_stays_hash(spark):
    """The whole point of join_range_bucketed: the compound equi key
    (bucket, user) must give a hash-family join — never the
    BroadcastNestedLoopJoin a bare range predicate degenerates to."""
    plan = plan_of(spark, "join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_snm_dedup_has_no_join(spark):
    """Sorted-neighborhood dedup's whole point: neighbor comparison via
    lead() windows, never a pair join — the plan must contain window
    exchanges but NO join operator of any kind (the quadratic twin
    dedup_near_jaccard is the contrast case)."""
    plan = plan_of(spark, "dedup_sorted_neighborhood")
    assert "Window" in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert j not in plan, f"unexpected {j} in SNM plan"


def test_outlier_fences_broadcast_back(spark):
    """Tukey-fence join-back: the per-nation fence table (25 rows) and
    the nation dim must BROADCAST onto suppliers — a shuffle join here
    would move the fact table for a dimension-sized build side."""
    plan = plan_of(spark, "outlier_iqr")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_sweep_line_single_window_partitioning(spark):
    """The sweep's running sum and final max group on the SAME key
    (o_orderpriority): after the boundary aggregate there must be
    exactly one exchange hashpartitioning on the priority key feeding
    window + final agg (no re-shuffle between them)."""
    import re

    plan = plan_of(spark, "interval_max_concurrent", mode="simple")
    prio_only = re.findall(
        r"Exchange hashpartitioning\(o_orderpriority#\d+, \d+\)", plan
    )
    assert len(prio_only) == 1, prio_only
    # explode-based boundary events: each base table scanned exactly once
    # (the naive union form scans orders+lineitem twice — 4 scans)
    assert plan.count("FileScan") == 2, plan.count("FileScan")


def test_markov_lead_then_tiny_agg(spark):
    """events_markov: one exchange on user_id for the lead() window;
    the transition matrix agg is partial/final (map-side combine soaks
    the per-row explosion before the tiny shuffle)."""
    plan = plan_of(spark, "events_markov")
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2


def test_q18_aggregate_before_join(spark):
    """join_big_order_customers: the HAVING aggregate must sit BELOW the
    joins (filter 97% of orders out before touching customer), and the
    threshold filter must apply between the two aggregate halves."""
    plan = plan_of(spark, "join_big_order_customers", mode="simple")
    agg_pos = plan.rfind("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos > join_pos > -1, "aggregate should be under the joins"
    assert plan.count("HashAggregate") >= 2


def test_q10_top20_is_take_ordered(spark):
    """join_returned_revenue_top: global top-20 must be per-partition
    TakeOrdered + merge, never a full sort of the customer aggregate."""
    plan = plan_of(spark, "join_returned_revenue_top", mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # nation side


def test_q16_distinct_below_part_join(spark):
    """join_part_supplier_diversity: the (partkey, suppkey) distinct and
    the part-side predicates both run below the join."""
    plan = plan_of(spark, "join_part_supplier_diversity")
    assert "PushedFilters: [IsNotNull(p_brand)" in plan or \
        "Not(EqualTo(p_brand,Brand#45))" in plan
    assert plan.count("HashAggregate") >= 4  # distinct pair + count-distinct


def test_q22_anti_join_stays_hash(spark):
    """subq_dormant_high_balance: NOT IN compiles to a null-aware anti
    join; with non-null keys it must stay a hash join, and the date
    filter must reach the orders scan."""
    plan = plan_of(spark, "subq_dormant_high_balance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


# --- registry-wide plan lint -------------------------------------------------
# Queries where a nested-loop/cartesian operator is EXPECTED (documented
# cross joins and non-equi-only joins — Spark physically executes these as
# BroadcastNestedLoopJoin/CartesianProduct by design, SURVEY §2.3 note).
_NESTED_LOOP_OK = {
    "join_cross",          # literal CROSS JOIN of two dims
    "vec_cosine_topk",     # pruned probe crossJoin (id-bounded, documented)
    "vec_knn_classify",    # same broadcast-probe pass as vec_cosine_topk
    "dedup_embedding_cosine",
    "fn_array_outer",      # cartesian of two tiny exploded arrays
    "vec_ann_ivf",         # IVF assignment: vectors × broadcast centroid
                           # table (k rows) — the intended BNLJ
    "vec_ann_ivf_persisted",  # same IVF assignment BNLJ, persisted-index
                           # lifecycle variant
    "vec_ann_recall_eval",  # IVF assignment + broadcast-probe ground truth
    "vec_ann_ivfpq",       # same IVF assignment BNLJ (vectors + probes ×
                           # broadcast k-row centroid table), residual-PQ
                           # composition — candidate scoring itself is the
                           # (cell, sub, code) hash equi-join
    "vec_ann_ivfpq_persisted",  # same composed index, persisted-index
                           # lifecycle variant (same intended BNLJ)
    "vec_ann_ivfpq_index_maintenance",  # same composed index; the
                           # day-2 delta leg re-uses the identical
                           # vectors × broadcast-centroid assignment
                           # BNLJ (ivfpq_index_delta → ivf_assign)
    "vec_ann_ivfpq_compacted",  # same composed index, full disk
                           # lifecycle (ingest + compaction) — search
                           # tail carries the same intended BNLJ
    "vec_ann_ivfpq_recall_eval",  # same assignment BNLJ + the exact
                           # ground truth's broadcast-probe pass (the
                           # vec_ann_recall_eval shape)
    "text_source_divergence",  # 1-row corpus-total scalar crossJoined in
    "text_bm25_search",    # 1-row (N, avgdl) corpus scalar crossJoined in
    "text_stopword_discovery",  # 1-row n_docs scalar crossJoined for the
                           # doc-frequency threshold
    "text_heavy_hitters",  # 1-row total-token scalar crossJoined for the
                           # frequency-share threshold
    "text_heavy_hitters_mg",  # same scalar threshold as text_heavy_hitters
    "text_lm_score",       # 1-row vocab-size scalar crossJoined in
    "agg_benford_digits",  # 1-row digit-total scalar crossJoined in
    "basket_association_rules",  # 1-row basket-total scalar crossJoined in
    "orders_survival_km",  # 1-row censoring-horizon scalar crossJoined in
    "orders_abc_class",    # 1-row grand-total scalar crossJoined in (the
                           # r7 two-phase cumsum re-route replaced the
                           # sum-over-() global window with a broadcast
                           # one-row total)
    "subq_any_all",        # 1-row ALL-bound scalar (max) crossJoined in —
                           # the standard quantified-subquery rewrite
    "text_semdedup",       # k-means cell assignment: vectors × broadcast
                           # k-centroid table, same intended BNLJ as
                           # vec_ann_ivf
    "vec_mmr_diversify",   # stage-1 candidates via the same broadcast-
                           # probe pass as vec_cosine_topk
    "vec_hard_negatives",  # same broadcast-probe pass (10 probes ×
                           # corpus), wrong-label filter
    "agg_ks_statistic",    # 1-row (n1, n2) totals scalar crossJoined in
    "text_importance_sample_dsir",  # 3-scalar (T, R, V) crossJoined into
                           # the vocab ratio table
    "text_vocab_coverage",  # 3-row k-list × 1-row totals crossJoin
    "win_pct_rank_twophase",  # 1-row N scalar crossJoined in
    "etl_partition_skew_audit",  # 1-row totals scalar crossJoined in
    "events_funnel_windowed",  # 1-row stage counts crossJoined to one row
    "agg_percentile_exact_twophase",  # 1-row n scalar crossJoined onto
                           # the ranked rows for the anchor filter
    "er_blocking_quality",  # unblocked ground-truth all-pairs on the
                           # id-bounded (<600) evaluation slice — the
                           # Christen-style evaluation is all-pairs BY
                           # DEFINITION; production blocking itself is the
                           # equi-join being graded
    "agg_psi_drift",       # 1-row smoothed-totals scalar crossJoined onto
                           # the 22-row bucket spine
    "pipeline_experiment_readout",  # four 1-row sub-results crossJoined
                           # into the dashboard row (inherits psi/ztest
                           # scalar shapes)
    "agg_important_stock",  # 1-row (total, nparts) scalar crossJoined
                           # onto the per-part sums — the Q11 HAVING-vs-
                           # scalar-subquery threshold
    "agg_kmv_overlap",     # 5x5 sketch-row pair crossJoin (one row per
                           # event_type sketch) — set ops on k-bounded
                           # arrays, fact table scanned once upstream
    "geo_point_in_polygon",  # points x 14-literal-edge broadcast dim —
                           # the intended ray-casting probe pass; real
                           # polygon sets gate on bbox grid cells first
    "geo_grid_density",    # CELL table (<=432 rows, bounded by geography
                           # not data) x 9-offset broadcast — the 3x3
                           # smoothing stencil; per-point work upstream is
                           # one map-side-combined groupBy
    "er_em_mu_estimate",   # <=8-row agreement-pattern table x 1-row EM
                           # parameter aggregate, twice — constant-size by
                           # construction (the pair corpus is reduced
                           # before any EM step)
    "agg_bootstrap_ci",    # 1-row full-sample stats x 1-row CI bounds —
                           # the final dashboard-row assembly
    "dedup_minhash_recall_eval",  # three 1-row count aggregates cross-
                           # joined into the precision/recall row; the
                           # candidate and truth joins upstream are hash
                           # equi-joins on band keys / shingles
}

registry.load_all()
_ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("key", _ALL_KEYS)
def test_plan_lint_no_accidental_nested_loop(spark, key):
    """Every declared query's physical plan is built (plans are lazy —
    cheap) and checked for silent degeneration into a nested-loop join.
    A CartesianProduct/BroadcastNestedLoopJoin outside the whitelist
    means a join predicate stopped being an equi-join — at 100 TB that
    plan is a non-starter, so it fails HERE, not in production."""
    if key in _NESTED_LOOP_OK:
        pytest.skip("nested-loop is the documented physical plan")
    plan = plan_of(spark, key, mode="simple")
    assert "CartesianProduct" not in plan, f"{key}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{key}: BNLJ"


# Queries where a single-partition (global) Window is EXPECTED — every
# entry is either (a) bounded by a constant or a tiny domain at any data
# scale, or (b) the declared exact-oracle form whose docstring names its
# sub-global scale twin. Anything NOT listed that grows a
# Window-over-SinglePartition fails the lint below — this is the pattern
# that silently funnels an unbounded domain through one task at 100 TB
# (caught manually in dedup_allpairs_prefix r3; now automated).
_GLOBAL_WINDOW_OK = {
    "etl_freshness_lag",       # per-source freshness: ≤ |sources| rows
    "win_ntile_pct",           # SURVEY §2.5 declared form (global ntile);
                               # scale twin win_pct_rank_twophase is
                               # implemented + driver-verified
    "revenue_yoy",             # year spine: ≤ tens of rows
    "alloc_largest_remainder",  # nation-bounded remainder ranking
    "sample_neyman_allocation",  # stratum-bounded (<=|mktsegment|=5 rows)
                                 # share + remainder windows, same
                                 # apportionment shape as
                                 # alloc_largest_remainder
    "orders_survival_km",      # KM curve over distinct day durations
    "agg_skyline_2d",          # running max over per-level aggregate
    "ts_interpolate_linear",   # day-spine gap walk: calendar-bounded
    "text_chi_square",         # lang×source contingency margins ≤100 rows
    "vec_ann_ivf",             # row_number over k centroids (k-bounded)
    "vec_ann_recall_eval",     # same centroid numbering
    "text_semdedup",           # same k-means centroid numbering
    "text_zipf_exponent",      # rank window AFTER TakeOrdered limit(1000)
                               # — bounded by the constant k, not vocab
    "agg_cramers_v",           # lang×source contingency margins ≤100 rows
                               # (same bounded table as text_chi_square)
    "ts_sma_crossover",        # day-spine SMA windows: calendar-bounded
    "ts_hampel_outliers",      # day-spine rolling median: calendar-bounded
    "agg_bootstrap_ci",        # rank pick over the B=100-row replicate-
                               # means table — bounded by the replicate
                               # constant, not data
}

_GLOBAL_WINDOW_RE = re.compile(r"\bWindow\b")


def _has_global_window(plan: str) -> bool:
    """A Window whose child chain reaches Exchange SinglePartition within
    3 lines — the physical signature of Window.orderBy/partitionBy()
    without keys (global sort/agg through ONE task)."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if _GLOBAL_WINDOW_RE.search(ln) and "WindowGroupLimit" not in ln:
            for j in range(i + 1, min(i + 4, len(lines))):
                if "Exchange SinglePartition" in lines[j]:
                    return True
    return False


@pytest.mark.parametrize("key", _ALL_KEYS)
def test_plan_lint_no_accidental_global_window(spark, key):
    """Registry-wide: no query may grow a single-partition Window outside
    the justified whitelist — the one-task global sort is the classic
    100 TB scale-killer (WindowExec 'Moving all data to a single
    partition' warning made a hard failure)."""
    if key in _GLOBAL_WINDOW_OK:
        pytest.skip("global window is the documented/bounded plan")
    plan = plan_of(spark, key, mode="simple")
    assert not _has_global_window(plan), f"{key}: Window over SinglePartition"


def test_contamination_check_broadcasts_eval_no_train_distinct(spark):
    """text_contamination_check's scale contract (r7 verdict #4): the
    tiny eval grams broadcast against the RAW train-gram stream — the
    plan must show a BroadcastHashJoin on the gram hash and must NOT
    shuffle the corpus-wide gram table (no Exchange hashpartitioning on
    a bare gram key, which is the signature of the old
    train-side .distinct() before the join)."""
    plan = plan_of(spark, "text_contamination_check", mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert not re.search(r"hashpartitioning\(gram#\d+L?, \d+\)", ln), (
                f"corpus-wide gram exchange: {ln}"
            )


def test_profile_is_single_scan(spark):
    """The profiler's claim: stats for ALL columns in ONE table scan
    (the oracle's UNION reads six times; the engine must not)."""
    plan = plan_of(spark, "etl_profile", mode="simple")
    assert plan.count("FileScan") == 1, plan.count("FileScan")


def test_minhash_assign_edges_are_linear_not_clique(spark):
    """The scale contract of minhash_dedup_assign's edge construction
    (the REAL builder, operators/minhash._candidate_edges): no in-bucket
    self-join clique (no joins at all — edges come from window passes),
    no whole-corpus Window over the raw (band, hash) bucket key — the
    pass over the full banded rows partitions by the SALTED sub-bucket
    key, so the largest single-task sort is B/salt_buckets; the only
    un-salted window runs over the sub-hub frame (≤ salt_buckets rows
    per bucket). Union branches share one physical shuffle
    (ReusedExchange), and nothing degenerates to nested-loop."""
    import pyspark.sql.functions as F

    from pyetl_spark.operators.minhash import _banded, _candidate_edges
    from pyetl_spark.tables import load_tables

    docs = load_tables(spark, SF_ORACLE).documents.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    banded = _banded(docs, "doc_id", "tokens", 32, 8, 42)
    edges = _candidate_edges(banded)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edges.explain("formatted")
    plan = buf.getvalue()
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert j not in plan, f"unexpected {j} in edge-construction plan"
    # four distinct window specs after normalizing expression ids: the
    # salted member pass (min → RangeFrame, lag → RowFrame — one sort,
    # two frames) and the sub-hub pass (same two frames over the ≤
    # salt_buckets-rows-per-bucket frame). A fifth spec — e.g. a window
    # back over the raw banded rows keyed only by (band_idx, band_hash)
    # — must not reappear.
    import re

    specs = {
        re.sub(r"#\d+L?", "", s)
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    }
    assert len(specs) == 4, specs
    assert sum("_salt" in s for s in specs) == 2, specs
    # (exchange reuse across the union branches is an AQE runtime
    # decision — isFinalPlan=false here — so it is not asserted)


def test_global_shuffle_rank_single_pinned_shuffle(spark):
    """global_shuffle_rank must pin its range shuffle (localCheckpoint)
    before any action reads it: range-partition bounds come from a SAMPLE,
    so two independent executions can place rows differently and the
    driver-side offsets would silently disagree with the final job. The
    returned plan therefore reads the checkpointed blocks (ExistingRDD)
    and contains NO live range-partitioning Exchange to re-execute."""
    import pyspark.sql.functions as F

    from pyetl_spark.operators.global_rank import global_shuffle_rank
    from pyetl_spark.tables import load_tables

    docs = load_tables(spark, SF_ORACLE).documents.select("doc_id")
    out = global_shuffle_rank(docs, "doc_id", seed=7, num_partitions=4)

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "ExistingRDD" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    # dense-permutation sanity on the pinned path
    ranks = sorted(r[0] for r in out.select("shuffle_rank").collect())
    assert ranks == list(range(len(ranks)))


def test_winnowing_hashes_grams_once(spark):
    """The gram-hash array must be materialized as its own projection —
    referenced from inside the window lambda it would be re-computed per
    window element (O(m²) md5 calls per doc). One md5 transform in the
    plan, one narrow WholeStageCodegen pass, read schema pruned to
    (doc_id, text), no shuffle before the explode."""
    plan = plan_of(spark, "text_winnowing_fingerprint", mode="simple")
    assert plan.count("md5") == 1, plan
    assert "Exchange" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_ohlc_aggregate_is_partial_final(spark):
    """OHLC bars must combine map-side: a partial aggregate below the
    (user, hour) exchange so the shuffle carries bars, not ticks. min_by
    forces SortAggregate (struct-carrying buffer) — still partial/final."""
    plan = plan_of(spark, "ts_resample_ohlc", mode="simple")
    assert "partial_min_by" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_interval_overlap_is_bucketed_broadcast_hash(spark):
    """The interval-overlap join must run as a hash join on the day
    bucket (windows side broadcast), with the exact overlap predicate as
    the join's post-condition — never a nested loop over all pairs."""
    plan = plan_of(spark, "join_interval_overlap", mode="simple")
    assert "BroadcastHashJoin [bucket" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # event side reads only the two columns the spans need
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp" in plan, plan


def test_merge_upsert_shuffles_on_merge_key_only(spark):
    """MERGE kernel: one full-outer sort-merge join, both sides hashed on
    the natural key, nothing else — the shape that lets a bucketed
    snapshot absorb a small change batch with one small shuffle."""
    plan = plan_of(spark, "etl_merge_upsert", mode="simple")
    assert "SortMergeJoin [o_orderkey" in plan, plan
    assert "FullOuter" in plan, plan
    assert plan.count("Exchange hashpartitioning(o_orderkey") == 2, plan


def test_rollup_cascade_reuses_hourly_materialization(spark):
    """Cascading rollup contract: day and week grains re-aggregate the
    persisted HOURLY bars (InMemoryTableScan), never re-reading raw
    events — the continuous-aggregate shape."""
    plan = plan_of(spark, "events_rollup_multi_grain", mode="simple")
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "Union" in plan, plan


def test_hash_sample_uses_window_group_limit(spark):
    """k-per-group hash sampling must hit Spark's rank-limit pushdown:
    WindowGroupLimit (partial below the exchange, final above) keeps
    per-partition state at k rows per group instead of sorting whole
    groups."""
    plan = plan_of(spark, "sample_hash_per_group", mode="simple")
    assert plan.count("WindowGroupLimit") == 2, plan


def test_dpp_partitioned_join_prunes_at_runtime(spark):
    """sink_dpp_partitioned_join: the filtered dim must turn into a
    dynamicpruningexpression on the partitioned fact scan — the runtime
    partition-pruning mechanism that keeps date-dim joins cheap at 100 TB."""
    plan = plan_of(spark, "sink_dpp_partitioned_join", mode="extended")
    assert "dynamicpruning" in plan.lower()


def test_bloom_prefilter_runs_in_scan_stage(spark):
    """join_bloom_prefilter: the membership test is a JVM expression in the
    fact scan's codegen stage (no Python eval, no pre-join exchange added
    beyond the join's own)."""
    plan = plan_of(spark, "join_bloom_prefilter")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the totalprice conjunct still reaches the parquet reader
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan


#: Queries whose PURPOSE is the Python boundary (SURVEY §2.11 UDF surface)
#: or that are pandas-backed custom operators where no built-in DataFrame
#: composition expresses the semantics (SURVEY's operator-implementation
#: ladder). Everything else must stay wholly JVM-side.
_PYTHON_EVAL_OK = {
    "udf_scalar_python",       # the mandated row-UDF boundary proof
    "udf_pandas_scalar",       # the mandated Arrow-UDF twin
    "udaf_pandas_grouped",     # mandated grouped-agg pandas UDAF
    "udtf_python",             # mandated Python UDTF
    "udtf_table_arg",          # TABLE-argument UDTF (declared slow-path
                               # boundary proof, id-bounded input)
    "udf_arrow_scalar",        # Spark 4.1 @arrow_udf boundary proof
    "udtf_arrow",              # Spark 4.1 @arrow_udtf (batch-vectorized
                               # UDTF boundary proof, id-bounded input)
    "grouped_map_applyInPandas",  # mandated grouped-map surface
    "map_partitions_arrow",    # mandated mapInPandas escape hatch
    "win_udaf_pandas",         # windowed pandas UDAF (bounded frames)
    "win_ewma",                # recursive EWMA: no closed JVM form
    "ts_forecast_holt",        # Holt recursion, reference-pinned pandas
    "text_pack_greedy",        # exact first-fit packer (stateful scan)
    "text_bpe_tokenize",       # trained-merges encode (Arrow UDF)
    "text_semdedup",           # within-cell NumPy cosine block
    "text_heavy_hitters_mg",   # per-partition Misra-Gries summaries
    "vec_mmr_diversify",       # NumPy-reference-exact rerank stage
    "vec_pca_project",         # mapInPandas moment aggregation
    "graph_pagerank",          # iterative solve bookkeeping
    "multimodal_features",     # Arrow decode plumbing (stubbed decoder)
    "multimodal_cdc_chunks",   # content-defined chunking over binary
    "multimodal_frame_sample",  # frame-sampling over binary payloads
    "multimodal_ahash_dedup",  # average-hash fingerprints over binary
    "pipeline_curation_full",  # composes the pandas-backed stages above
}

_PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
    "AggregateInPandas",
    "PythonUDTF",
)


@pytest.mark.parametrize("key", _ALL_KEYS)
def test_plan_lint_no_accidental_python_eval(spark, key):
    """The hot path stays JVM-side: outside the declared UDF surface and
    the pandas-backed custom operators, NO query's physical plan may
    contain a Python evaluation node — a stray .udf() in a helper would
    silently serialize every row across the Python boundary (the 10-100×
    cliff SURVEY §2.11 exists to fence off)."""
    if key in _PYTHON_EVAL_OK:
        pytest.skip("Python boundary is this operator's documented design")
    plan = plan_of(spark, key, mode="simple")
    found = [m for m in _PY_MARKERS if m in plan]
    assert not found, f"{key}: unexpected Python eval {found}"


# --- registry-wide plan-CONSTRUCTION cost lint (r10; SCALE.md r9 lesson) ----
# Executor plans are not the only scale axis: a query whose DataFrame BUILD
# issues thousands of Py4J round-trips (one per literal in a big expression
# bank, or one per un-batched Column op) spends driver seconds per
# submission — the r9 vec_ann_lsh pathology (~2,000 round-trips, 3–17 s
# build, fixed by compiling the SRP bank to ONE F.expr string). This lint
# makes that class mechanical instead of bench archaeology: every key's
# builder runs at sf0.001 with py4j method calls counted, and fails above
# max(1500, 2 x its committed r12 baseline) — 1500 covers the registry's
# p90 (581) with ~2.5x headroom; the 2x term lets the 11 documented
# heavy-build keys (iterative fits whose EAGER driver jobs — k-means, EM,
# connected components, funnel counts — dominate the count) regress no
# more than 2x before failing. Baseline: build_cost_r12.jsonl (368 keys,
# measured 2026-08-16 with scripts/gen_build_cost.py — the script IS the
# "same loop", so regeneration stopped being archaeology). History: r11
# trimmed the literal-bank members of the r10 over-1500 set —
# dedup_simhash 5401→979 via the compiled 64-term bit-majority SQL and
# the minhash family 5194/3257/2846/2742 → 1795/2117/1709/1605 via the
# compiled signature SQL in _banded; r12 reproduced the same over-1500
# set (the minhash keys moved ≤25 calls for the empty-token filter) and
# added two keys: dedup_paragraph_global (219 — cheap lazy builder) and
# vec_ann_ivfpq (6410 — an ADJUDICATED eager-iteration builder: its
# count is kmeans_fit_exact's 2 Lloyd jobs + pq_fit_exact's 2 over the
# residual frame, i.e. ~the sum of vec_ann_ivf's and vec_pq_adc_topk's
# adjudicated counts, not a literal bank). Of the over-1500 keys, the
# eager-iteration builders' counts ARE the algorithm's driver jobs
# (k-means/EM/funnel/readout); the trimmed minhash-family keys are lazy
# builders whose residual count is the multi-stage join/CC plan itself —
# their literal banks are already compiled, so a future jump there is a
# real regression, not algorithm. Regenerate with
# scripts/gen_build_cost.py if builds legitimately change.
# r13: baseline file is build_cost_r13.jsonl — r12 rows carried over
# verbatim except the three refreshed ivfpq-family keys (ivfpq_encode
# refactor; 6410→6432 / 6490) and the NEW
# vec_ann_ivfpq_index_maintenance (8240), vec_ann_ivfpq_compacted
# (8374), and vec_ann_ivfpq_recall_eval (6641) — all adjudicated
# eager-iteration builders: the maintenance fit jobs over the day-1
# subset + the delta/ingest encode (for the compacted key also the
# persist/compact write jobs, eager by nature; for the recall eval the
# same full-corpus fit as vec_ann_ivfpq plus the ground-truth plan);
# measured with scripts/gen_build_cost.py --only, same loop as the
# lint.

_BUILD_BASELINE: dict[str, int] = {}
_BUILD_BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "build_cost_r13.jsonl",
)
if os.path.exists(_BUILD_BASELINE_PATH):
    with open(_BUILD_BASELINE_PATH) as _fh:
        for _line in _fh:
            _rec = json.loads(_line)
            _BUILD_BASELINE[_rec["key"]] = int(_rec["py4j_calls"])


@contextlib.contextmanager
def _count_py4j_calls():
    """Count py4j JavaMember invocations (driver->JVM round-trips) inside
    the block. JavaMember.__call__ is the dominant round-trip path; field
    reads and object GC traffic are ignored (noise-level)."""
    import py4j.java_gateway as jg

    counter = {"n": 0}
    orig = jg.JavaMember.__call__

    def patched(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    jg.JavaMember.__call__ = patched
    try:
        yield counter
    finally:
        jg.JavaMember.__call__ = orig


@pytest.mark.parametrize("key", _ALL_KEYS)
def test_plan_lint_build_py4j_calls_bounded(spark, key):
    with _count_py4j_calls() as c:
        registry.QUERIES[key](spark, SF_ORACLE)
    budget = max(1500, 2 * _BUILD_BASELINE.get(key, 0))
    assert c["n"] <= budget, (
        f"{key}: plan BUILD took {c['n']} Py4J round-trips "
        f"(budget {budget}; r12 baseline {_BUILD_BASELINE.get(key)}). "
        "Driver-side plan construction is a scale axis (SCALE.md): batch "
        "literal banks into one F.expr / compiled SQL string instead of "
        "per-element Column ops."
    )
