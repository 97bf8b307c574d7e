"""Cross-query invariants (SURVEY.md §5.2 layer 3) + tolerance tests for
approximate operators."""

from __future__ import annotations

import pytest

# fast-lane member (pyproject [tool.pytest.ini_options] markers):
# cross-query invariants — structural, no per-key fixture scans
pytestmark = pytest.mark.fast

from pyspark.sql import functions as F

from pyetl_spark import registry
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE

registry.load_all()


def _q(spark, key):
    return registry.QUERIES[key](spark, SF_ORACLE)


def test_semi_anti_partition_left_table(spark):
    """join_semi ∪ join_anti over the same predicate partitions customer."""
    semi = _q(spark, "join_semi").select("c_custkey")
    # join_semi filters on urgent orders; rebuild its complement directly
    t = load_tables(spark, SF_ORACLE)
    customer, orders = t.customer, t.orders
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    anti = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey")
    n_total = customer.count()
    assert semi.count() + anti.count() == n_total
    assert semi.intersect(anti).count() == 0


def test_union_distinct_equals_distinct_of_union_all(spark):
    ua = _q(spark, "set_union_all").distinct()
    ud = _q(spark, "set_union_distinct")
    assert ua.exceptAll(ud).count() == 0
    assert ud.exceptAll(ua).count() == 0


def test_rollup_grand_total_matches_direct_count(spark):
    rollup = _q(spark, "agg_rollup")
    grand = rollup.filter((F.col("g_region") == 1) & (F.col("g_nation") == 1))
    n_cust = load_tables(spark, SF_ORACLE).customer.count()
    assert grand.count() == 1
    assert grand.collect()[0]["n_cust"] == n_cust


def test_row_number_bijection_per_partition(spark):
    df = _q(spark, "win_rank_dense")
    per = df.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.countDistinct("rn").alias("n_rn"),
        F.max("rn").alias("max_rn"),
    )
    bad = per.filter(
        (F.col("n") != F.col("n_rn")) | (F.col("n") != F.col("max_rn"))
    )
    assert bad.count() == 0


def test_approx_distinct_within_tolerance(spark):
    """agg_approx_distinct (HLL++, rsd=2%) vs exact (SURVEY §2.4)."""
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in _q(spark, "agg_approx_distinct").collect()
    }
    exact = {
        r["o_orderpriority"]: r["n_customers"]
        for r in _q(spark, "agg_count_distinct").collect()
    }
    for k, ev in exact.items():
        assert abs(approx[k] - ev) / ev <= 0.05, (k, approx[k], ev)


def test_broadcast_hint_same_result_as_unhinted(spark):
    a = _q(spark, "join_inner_equi")
    b = _q(spark, "join_broadcast_hint")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_udf_boundaries_agree(spark):
    """Row UDF, pandas UDF, and the JVM expression must produce identical
    rounded results."""
    py = _q(spark, "udf_scalar_python")
    pdf = _q(spark, "udf_pandas_scalar")
    assert py.exceptAll(pdf).count() == 0
    assert pdf.exceptAll(py).count() == 0


def test_sessions_are_disjoint_with_min_gaps(spark):
    """stream_session invariants: per user, sessions don't overlap and
    consecutive sessions are separated by > 30 minutes."""
    from pyspark.sql import Window

    s = _q(spark, "stream_session")
    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = s.select(
        "user_id",
        "session_seq",
        (
            F.unix_micros("session_start")
            - F.unix_micros(F.lag("session_end").over(w))
        ).alias("gap_us"),
        (
            F.unix_micros("session_end") - F.unix_micros("session_start")
        ).alias("dur_us"),
    )
    assert gaps.filter(F.col("dur_us") < 0).count() == 0
    bad_gaps = gaps.filter(
        F.col("gap_us").isNotNull()
        & (F.col("gap_us") <= 30 * 60 * 1_000_000)
    )
    assert bad_gaps.count() == 0


def test_cleaning_pipeline_output_is_subset(spark):
    """text_lang_filter_pipeline rows ⊆ documents, langs respected."""
    from pyetl_spark.tables import load_tables

    out = _q(spark, "text_lang_filter_pipeline")
    docs = load_tables(spark, SF_ORACLE).documents
    assert out.count() <= docs.count()
    assert out.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    assert (
        out.filter(~F.col("lang").isin("en", "fr", "es")).count() == 0
    )


def test_greedy_packing_respects_budget_and_tracks_approx(spark):
    """Exact packer: no pack exceeds 256 tokens (except single oversized
    docs) and pack count per lang is >= the shuffle-free approximation's
    (first-fit can only open more packs than the ideal running split)."""
    from pyetl_spark import registry
    from tests.conftest import SF_ORACLE

    registry.load_all()
    greedy = registry.QUERIES["text_pack_greedy"](spark, SF_ORACLE)
    per_pack = (
        greedy.groupBy("lang", "pack_id")
        .agg(
            F.sum("n_tokens").alias("tok"),
            F.count("*").alias("n_docs"),
        )
        .collect()
    )
    for r in per_pack:
        assert r["tok"] <= 256 or r["n_docs"] == 1, r
    g_counts = {
        r["lang"]: r["n"]
        for r in greedy.groupBy("lang")
        .agg(F.countDistinct("pack_id").alias("n"))
        .collect()
    }
    approx = registry.QUERIES["text_pack_sequences"](spark, SF_ORACLE)
    a_counts = {
        r["lang"]: r["n"]
        for r in approx.groupBy("lang")
        .agg(F.countDistinct("pack_id").alias("n"))
        .collect()
    }
    for lang, g in g_counts.items():
        assert g >= a_counts[lang], (lang, g, a_counts[lang])


def test_agg_topk_equals_window_topk(spark):
    """topk_per_group_agg (hash-aggregate form) must emit the exact row
    set of win_topk_per_group's row_number form — same semantics, two
    physical strategies."""
    agg_rows = {
        (r["o_custkey"], r["o_orderkey"], r["rk"])
        for r in _q(spark, "topk_per_group_agg").collect()
    }
    win_rows = {
        (r["o_custkey"], r["o_orderkey"], r["rn"])
        for r in _q(spark, "win_topk_per_group").collect()
    }
    assert agg_rows == win_rows


def test_retention_offset_zero_is_cohort_size(spark):
    """Every user is active on their own cohort day, so the offset-0 row
    of each cohort equals the number of users first seen that day."""
    rows = _q(spark, "events_retention").collect()
    offset0 = {
        r["cohort_day"]: r["n_users"] for r in rows if r["day_offset"] == 0
    }
    ev = load_tables(spark, SF_ORACLE).events
    cohort_sizes = {
        r["cohort_day"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert offset0 == cohort_sizes


def test_latest_per_key_matches_maxby_twin(spark):
    """etl_latest_per_key (row_number form) == max_by(struct) aggregate
    over (ts, event_id) — the two CDC-compaction strategies agree."""
    win = {
        (r["user_id"], r["event_id"])
        for r in _q(spark, "etl_latest_per_key").collect()
    }
    ev = load_tables(spark, SF_ORACLE).events
    pair = F.struct(F.col("ts"), F.col("event_id"))
    agg = {
        (r["user_id"], r["event_id"])
        for r in ev.groupBy("user_id")
        .agg(F.max_by("event_id", pair).alias("event_id"))
        .collect()
    }
    assert win == agg


def test_funnel_counts_monotone(spark):
    """Funnel stages can only shrink: n_view >= n_click_after_view >=
    n_purchase_after_click."""
    r = _q(spark, "events_funnel").collect()[0]
    assert r["n_view"] >= r["n_click_after_view"] >= r["n_purchase_after_click"]


def test_largest_remainder_sums_to_budget(spark):
    """Apportionment invariant: units are non-negative and sum to exactly
    the 10000-unit budget — the property the largest-remainder method
    guarantees and naive independent rounding does not."""
    rows = _q(spark, "alloc_largest_remainder").collect()
    assert all(r["units"] >= 0 for r in rows)
    assert sum(r["units"] for r in rows) == 10000


def test_sweep_peak_bounds(spark):
    """Sweep-line peak concurrency per priority is ≥ 1 and ≤ the number
    of orders in that priority class (sanity bounds of the +1/-1 walk)."""
    t = load_tables(spark, SF_ORACLE)
    per_prio = {
        r["o_orderpriority"]: r["n"]
        for r in t.orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in _q(spark, "interval_max_concurrent").collect():
        assert 1 <= r["max_concurrent"] <= per_prio[r["o_orderpriority"]]


def test_incremental_agg_equals_full_rescan(spark):
    """Mergeable-state invariant: state ⊕ delta == from-scratch aggregate
    (count/sum/max merge losslessly)."""
    from pyetl_spark.parity import fxp, rnd

    merged = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in _q(spark, "etl_incremental_agg").collect()
    }
    e = load_tables(spark, SF_ORACLE).events
    full = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            rnd(
                F.sum(fxp(F.col("value"), 10**6)).cast("double")
                / F.lit(1000000.0),
                4,
            ).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert merged == full


def test_attribution_purchases_conserved(spark):
    """Every purchase is attributed exactly once: attribution counts sum
    to the total purchase count."""
    rows = _q(spark, "events_attribution").collect()
    e = load_tables(spark, SF_ORACLE).events
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == n_purchases


def test_snm_pairs_subset_of_exact_at_same_threshold(spark):
    """Sorted-neighborhood recall direction: every SNM pair with
    jaccard >= 0.8 must also be found by the exhaustive blocked join
    (dedup_near_jaccard, τ=0.8) — SNM trades recall, never precision."""
    snm = {
        (r["doc_a"], r["doc_b"])
        for r in _q(spark, "dedup_sorted_neighborhood").collect()
        if r["jaccard"] >= 0.8
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in _q(spark, "dedup_near_jaccard").collect()
    }
    assert snm <= exact


def test_abc_classes_partition_and_order(spark):
    """ABC classification: classes partition all customers; every A
    customer's cumulative share ≤ every C customer's (the labels follow
    the revenue ordering)."""
    rows = _q(spark, "orders_abc_class").collect()
    by_class = {}
    for r in rows:
        by_class.setdefault(r["abc_class"], []).append(r["cum_share"])
    assert set(by_class) <= {"A", "B", "C"}
    if "A" in by_class and "C" in by_class:
        assert max(by_class["A"]) <= min(by_class["C"])


def test_pii_redaction_fires_on_synthetic_pii(spark):
    """The declared query runs on fixture text (few/no hits); this pins
    the behavior on text that HAS PII: emails and long digit runs get
    typed placeholders, counts match, short numbers survive."""
    import pyspark.sql.functions as F

    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    num = r"[0-9]{6,}"
    rows = [
        (1, "contact alice@example.com or bob.smith@mail.co today"),
        (2, "card 1234567890123456 pin 1234 order 987654"),
        (3, "clean text with no sensitive content at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), num, "<NUM>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(email), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(num), F.lit(0))).alias(
            "n_long_numbers"
        ),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[1]["redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert got[1]["n_emails"] == 2
    assert got[2]["redacted"] == "card <NUM> pin 1234 order <NUM>"
    assert got[2]["n_long_numbers"] == 2
    assert got[3]["redacted"] == rows[2][1]


def test_chunk_overlap_covers_every_token(spark):
    """Chunking invariants on synthetic docs: every token appears in at
    least one chunk, consecutive chunks overlap by size-stride tokens,
    and tail chunks clamp."""
    import pyspark.sql.functions as F

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = F.split("text", " ")
    base = df.select("doc_id", toks.alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - F.lit(1), F.lit(48))
    chunked = base.select(
        "doc_id", "toks", F.explode(starts).alias("s")
    ).select(
        "doc_id",
        (F.col("s") / F.lit(48)).cast("long").alias("chunk_idx"),
        F.slice("toks", F.col("s") + F.lit(1), F.lit(64)).alias("chunk"),
    )
    rows = sorted(
        (r["chunk_idx"], r["chunk"]) for r in chunked.collect()
    )
    # 150 tokens, stride 48 → starts 0,48,96,144 → 4 chunks
    assert [c for c, _ in rows] == [0, 1, 2, 3]
    assert len(rows[0][1]) == 64
    assert len(rows[3][1]) == 6          # tail clamp: 150-144
    covered = {t for _, chunk in rows for t in chunk}
    assert len(covered) == 150           # every token in >=1 chunk
    # overlap: last 16 of chunk k == first 16 of chunk k+1
    assert rows[0][1][48:] == rows[1][1][:16]


def test_global_shuffle_rank_partition_invariant(spark):
    """The two-phase distributed rank must be a dense permutation and
    IDENTICAL for any partition count (rank = position in the total
    (md5 key, id) order, independent of range boundaries)."""
    from pyetl_spark.operators.global_rank import global_shuffle_rank

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    r4 = {
        r["doc_id"]: r["shuffle_rank"]
        for r in global_shuffle_rank(df, "doc_id", seed=7, num_partitions=4)
        .collect()
    }
    r17 = {
        r["doc_id"]: r["shuffle_rank"]
        for r in global_shuffle_rank(
            df.repartition(13), "doc_id", seed=7, num_partitions=17
        ).collect()
    }
    assert r4 == r17
    assert sorted(r4.values()) == list(range(1000))   # dense permutation
    # different seed -> different permutation
    r_other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in global_shuffle_rank(df, "doc_id", seed=8, num_partitions=4)
        .collect()
    }
    assert r_other != r4


def test_winnowing_guarantee(spark, tmp_path):
    """The winnowing contract (k=3, w=4): two docs sharing a contiguous
    span of ≥ k+w-1 = 6 tokens MUST share at least one fingerprint;
    docs with fully disjoint vocabularies must share none."""
    import os

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight {shared} nine ten eleven twelve"),
        (3, "red blue green yellow purple orange pink brown black white"),
    ]
    base = os.path.join(str(tmp_path), "sf")
    os.makedirs(base, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        src = f"/root/testdata/sf0.001/{t}.parquet"
        dst = os.path.join(base, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)

    from pyetl_spark import registry

    registry.load_all()
    out = registry.QUERIES["text_winnowing_fingerprint"](spark, base)
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 10-token span must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_corpus_shards_balanced_and_reproducible(spark, tmp_path):
    """Shard export contract: sizes equal ±1 BY CONSTRUCTION (round-robin
    on the dense rank, not hash luck), same seed → identical layout,
    different seed → different permutation, readback prunes to one
    shard's file and recovers the exact within-shard order."""
    import os

    from pyetl_spark.operators.corpus_shards import (
        assign_shards,
        write_corpus_shards,
    )
    from pyetl_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001").documents.select(
        "doc_id"
    )
    n = docs.count()
    a1 = assign_shards(docs, n_shards=8, seed=7)
    sizes = {r["shard"]: r["n"] for r in
             a1.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert len(sizes) == 8
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    assert sum(sizes.values()) == n
    # reproducible across invocations; seed changes the permutation
    r1 = sorted(map(tuple, a1.collect()))
    r2 = sorted(map(tuple, assign_shards(docs, n_shards=8, seed=7).collect()))
    r3 = sorted(map(tuple, assign_shards(docs, n_shards=8, seed=8).collect()))
    assert r1 == r2
    assert r1 != r3
    # (shard, shard_pos) is a bijection onto 0..n-1 of the rank space
    assert len({(s, p) for _, s, p in r1}) == n

    out = os.path.join(str(tmp_path), "shards")
    write_corpus_shards(docs, out, n_shards=8, seed=7)
    back = spark.read.parquet(out)
    assert back.count() == n
    one = spark.read.parquet(os.path.join(out, "shard=3"))
    rows = one.collect()
    expect = sorted(
        [(d, p) for d, s, p in r1 if s == 3], key=lambda t: t[1]
    )
    assert [(r["doc_id"], r["shard_pos"]) for r in
            sorted(rows, key=lambda r: r["shard_pos"])] == expect
    # one file per shard (the 1:1 shard:file contract)
    files = [f for f in os.listdir(os.path.join(out, "shard=3"))
             if f.endswith(".parquet")]
    assert len(files) == 1, files


def test_training_examples_no_leakage(spark):
    """events_training_examples: the feature window is strictly prior —
    verified against a brute-force per-label recount (which is exactly the
    O(n²) join the operator exists to avoid; fine at fixture scale)."""
    ex = registry.QUERIES["events_training_examples"](spark, SF_ORACLE)
    ev = load_tables(spark, SF_ORACLE).events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_type",
    )
    labels = ex.select("event_id", "user_id", "label_us", "n_any_7d")
    brute = (
        labels.join(ev.withColumnRenamed("user_id", "u2"), 
                    (F.col("u2") == F.col("user_id"))
                    & (F.col("us") >= F.col("label_us") - 604_800_000_000)
                    & (F.col("us") <= F.col("label_us") - 1),
                    "left")
        .groupBy("event_id", "n_any_7d")
        .agg(F.count("us").alias("brute_n"))
    )
    mismatch = brute.filter(F.col("brute_n") != F.col("n_any_7d")).count()
    assert mismatch == 0
    # every label event produces exactly one example row
    n_purchases = load_tables(spark, SF_ORACLE).events.filter(
        F.col("event_type") == "purchase"
    ).count()
    assert ex.count() == n_purchases


def test_manifest_publish_crash_leaves_readers_on_old_version(spark, tmp_path):
    """A writer that lands data files but dies BEFORE the manifest flip
    must be invisible: readers resolving _LATEST still get the previously
    published version, file-complete and count-consistent."""
    import json
    import os

    from pyetl_spark import registry

    out = registry.QUERIES["sink_manifest_atomic_publish"](
        spark, SF_ORACLE
    ).collect()[0]
    assert out["consistent"] and out["version"] == 2
    # simulate the crash: v3 data lands, no manifest, no pointer flip
    import tempfile

    base = os.path.join(
        os.environ.get("PYETL_SCRATCH", tempfile.gettempdir()),
        "pyetl_spark_sinks",
        "manifest_publish",
    )
    load_tables(spark, SF_ORACLE).nation.write.mode("overwrite").parquet(
        os.path.join(base, "v3")
    )
    with open(os.path.join(base, "_LATEST")) as f:
        mname = f.read().strip()
    assert mname == "manifest_v2.json"
    with open(os.path.join(base, mname)) as f:
        manifest = json.load(f)
    vdir = os.path.join(base, f"v{manifest['version']}")
    n = spark.read.parquet(
        *[os.path.join(vdir, fn) for fn in manifest["files"]]
    ).count()
    assert n == manifest["n_rows"]


def test_fp_row_hash_rejects_non_money_doubles(spark):
    """_fp_row_hash assumes every double sits on the 2dp money grid; a
    ratio/score column silently collapsing distinct rows to one
    fingerprint is the failure the r8 advisory flagged — the guard must
    raise instead. Money-grid doubles (and nulls) still fingerprint."""
    import pytest

    from pyetl_spark.queries.sinks import _fp_row_hash

    # collect(), not count(): count() lets Catalyst prune the unused
    # fingerprint projection and the guard never evaluates (vacuous)
    ok = spark.createDataFrame(
        # 134228608.14 pins the scale-relative tolerance: its scaled
        # ulp error (~1.9e-6) exceeds a naive absolute 1e-6 cutoff
        [(1, 12.34), (2, None), (3, -0.5), (4, 134228608.14)],
        "id int, amount double",
    )
    rows = ok.select(_fp_row_hash(ok).alias("h")).collect()
    assert len(rows) == 4 and all(r["h"] is not None for r in rows)

    bad = spark.createDataFrame(
        [(1, 0.123456)], "id int, score double"
    )
    with pytest.raises(Exception, match="2dp money grid"):
        bad.select(_fp_row_hash(bad).alias("h")).collect()


def test_time_travel_as_of_reads_are_snapshot_consistent(spark):
    """Every retained version re-reads to exactly its manifest's row
    count; the version chain is append-monotone (rows_added ≥ 0, v1 has
    all its rows counted as added); the planted orphan v99 directory
    never surfaces as a readable version."""
    from pyetl_spark import registry

    rows = registry.QUERIES["sink_snapshot_time_travel"](
        spark, SF_ORACLE
    ).collect()
    assert [r["version"] for r in rows] == [1, 2, 3]
    assert all(r["consistent"] for r in rows)
    assert all(r["rows_added"] >= 0 for r in rows)
    assert rows[0]["rows_added"] == rows[0]["n_rows"]
    # AS-OF v2 must be a strict prefix of v3 in row count (2001 appended)
    assert rows[1]["n_rows"] < rows[2]["n_rows"]
    # fingerprints differ across versions (content actually changed)
    fps = {r["fingerprint"] for r in rows}
    assert len(fps) == 3


def test_point_in_polygon_planted_truth(spark):
    """Ray-casting parity against hand-checked points on the CONCAVE
    pentagon (poly 2): a point in the notch between the two prongs is
    OUTSIDE even though it is inside the bounding box and on the hull."""
    from pyspark.sql import functions as F

    from pyetl_spark.queries.geo import _polygon_edges

    cases = [
        # (px, py, poly_id, inside?)
        (30000, 20000, 1, True),    # triangle interior
        (10001, 59000, 1, False),   # outside triangle, inside its bbox
        (70000, 110000, 2, True),   # left prong interior
        (85000, 190000, 2, False),  # the concave notch: bbox yes, poly no
        (85000, 120000, 2, True),   # below the notch, inside
        (50000, 300000, 3, True),   # rectangle interior
        (19999, 300000, 3, False),  # just left of the rectangle
    ]
    pts = spark.createDataFrame(
        [(i, x, y) for i, (x, y, _, _) in enumerate(cases)],
        "pid int, px long, py long",
    )
    edges = spark.createDataFrame(
        _polygon_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
    )
    straddles = (
        (F.col("y1") <= F.col("py")) & (F.col("y2") > F.col("py"))
    ) | ((F.col("y2") <= F.col("py")) & (F.col("y1") > F.col("py")))
    cross = (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1")) - (
        F.col("py") - F.col("y1")
    ) * (F.col("x2") - F.col("x1"))
    left_of = F.when(F.col("y2") > F.col("y1"), cross < 0).otherwise(
        cross > 0
    )
    crossed = F.when(straddles & left_of, 1).otherwise(0)
    got = {
        (r["pid"], r["poly_id"]): r["inside"]
        for r in pts.crossJoin(F.broadcast(edges))
        .groupBy("pid", "poly_id")
        .agg((F.sum(crossed) % 2 == 1).alias("inside"))
        .collect()
    }
    for i, (_, _, poly, want) in enumerate(cases):
        assert got[(i, poly)] == want, (i, poly, want)


def test_neyman_allocation_sums_to_budget_and_dominates_uniform(spark):
    """sample_neyman_allocation: exact budget conservation, every
    stratum sampled, and (Neyman property) allocation ordering follows
    the N_h * S_h weight ordering."""
    rows = _q(spark, "sample_neyman_allocation").collect()
    assert sum(r["alloc"] for r in rows) == 1000
    assert all(r["alloc"] > 0 for r in rows)
    # order by the EXACT N_h * S_h weight (recomputed from exact cents
    # moments), not the 4dp display stddev — the rounded column can flip
    # near-ties and make the dominance check flaky on other fixtures
    t = load_tables(spark, SF_ORACLE).customer
    moments = {
        r["segment"]: r
        for r in t.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.abs("c_acctbal") * 100 + F.lit(0.5)).cast("long")).alias("s1"),
            F.sum(
                (F.floor(F.abs("c_acctbal") * 100 + F.lit(0.5)).cast("long")
                 * F.floor(F.abs("c_acctbal") * 100 + F.lit(0.5)).cast("long"))
            ).alias("s2"),
        )
        .collect()
    }

    def exact_weight(r):
        m = moments[r["segment"]]
        n = m["n"]
        var = (n * m["s2"] - m["s1"] * m["s1"]) / (n * (n - 1))
        return n * var ** 0.5

    by_weight = sorted(rows, key=exact_weight)
    allocs = [r["alloc"] for r in by_weight]
    # largest-remainder can flip exact ties only; weights here are distinct
    assert allocs == sorted(allocs)


def test_bootstrap_ci_brackets_full_sample_mean(spark):
    """agg_bootstrap_ci: the percentile CI must bracket the full-sample
    mean (Poisson weights are mean-1 so replicate means center on it),
    lo < hi, and the half-width is small relative to the mean."""
    r = _q(spark, "agg_bootstrap_ci").collect()[0]
    assert r["boot_lo"] < r["mean_price"] < r["boot_hi"]
    width = r["boot_hi"] - r["boot_lo"]
    assert 0 < width < 0.1 * r["mean_price"]


def test_budget_select_exclusive_budget_and_quality_order(spark):
    """text_budget_select: every kept doc starts under the budget
    (exclusive prefix < 600) and, within a language, kept docs are a
    PREFIX of the quality ordering — no skipped better doc."""
    rows = _q(spark, "text_budget_select").collect()
    assert rows, "selection must be non-empty"
    assert all(r["cum_before"] < 600 for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r["quality"], r["doc_id"]))
        cum = 0
        for r in rs:
            assert r["cum_before"] == cum, (lang, r)
            cum += r["n_tokens"]


def test_em_estimate_separates_match_field_from_noise_field(spark):
    """er_em_mu_estimate: EM must drive the informative fields (segment,
    balance bucket — strongly correlated within true duplicate-ish
    pairs is NOT this fixture, but agreement rates differ by field)
    to m > u, and all probabilities into (0, 1)."""
    r = _q(spark, "er_em_mu_estimate").collect()[0]
    for f in ("seg", "bal", "dig"):
        assert 0.0 < r[f"m_{f}"] < 1.0
        assert 0.0 < r[f"u_{f}"] < 1.0
    assert 0.0 < r["p_match"] < 1.0
    # the EM fit must find SOME discriminating structure: at least one
    # field with m materially above u (the mixture is non-degenerate)
    assert any(
        r[f"m_{f}"] > r[f"u_{f}"] + 0.05 for f in ("seg", "bal", "dig")
    )


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    """ts_theil_sen agrees with an independent in-driver recomputation
    (numpy median over explicitly enumerated pairwise slopes) for every
    nation."""
    import numpy as np

    got = {r["nation"]: r for r in _q(spark, "ts_theil_sen").collect()}
    t = load_tables(spark, SF_ORACLE)
    monthly = (
        t.orders.join(
            t.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate").cast("long") - 1992) * 12
                + (F.month("o_orderdate").cast("long") - 1)
            ).alias("x"),
        )
        .agg(
            F.sum(F.floor(F.abs(F.col("o_totalprice")) * 100 + 0.5))
            .alias("y_c")
        )
        .collect()
    )
    series = {}
    for row in monthly:
        series.setdefault(row["nation"], []).append((row["x"], row["y_c"]))
    for nation, pts in series.items():
        pts.sort()
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
        ]
        want = float(np.median(slopes)) / 100.0
        assert abs(got[nation]["slope_per_month"] - want) < 1e-3, nation


def test_minhash_recall_eval_quality_floor(spark):
    """dedup_minhash_recall_eval: the 4x2 banding must recall ~all
    near-identical truth pairs (fixture dups sit at j ~ 0.99 where
    P[candidate] = 1-(1-j^2)^4 ~ 1.0) and keep precision above the
    random-collision floor; counts must be internally consistent."""
    r = _q(spark, "dedup_minhash_recall_eval").collect()[0]
    assert r["n_hits"] <= min(r["n_truth"], r["n_candidates"])
    assert r["n_truth"] > 0
    assert r["recall"] >= 0.9
    assert r["precision"] >= 0.3


def test_contamination_check_detects_planted_copy(spark, tmp_path):
    """An eval doc whose text is copied verbatim from a train doc must
    come back contaminated=true with frac 1.0; an eval doc with unique
    text must come back 0.0/false (text_contamination_check)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyetl_spark.registry import QUERIES, load_all
    from pyetl_spark.tables import TABLE_NAMES
    from tests.conftest import SF_ORACLE

    load_all()
    fx = tmp_path / "contam"
    fx.mkdir()
    for name in TABLE_NAMES:
        if name == "documents":
            continue
        os.symlink(f"{SF_ORACLE}/{name}.parquet", fx / f"{name}.parquet")
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq = "one two three four five six seven eight nine ten"
    docs = pa.table(
        {
            "doc_id": pa.array([3, 5, 7, 0], pa.int64()),
            "text": pa.array(
                # 3/5/7 (% 101 != 0): train docs; 0 (% 101 == 0): the
                # eval doc, a verbatim copy of train doc 3's text
                [shared, uniq + " extra words here pad pad pad",
                 "filler text that matters not at all here ok",
                 shared],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
        }
    )
    pq.write_table(docs, fx / "documents.parquet")
    out = {
        r["eval_doc_id"]: r
        for r in QUERIES["text_contamination_check"](
            spark, str(fx)
        ).collect()
    }
    assert 0 in out and out[0]["contaminated"] is True
    assert out[0]["contamination_frac"] == 1.0


def test_paragraph_dedup_strips_cross_doc_boilerplate(spark, tmp_path):
    """dedup_paragraph_global (r12): a 10-token chunk shared by MORE
    than 3 distinct docs is boilerplate and must vanish from every
    doc's clean_text (in-order reconstruction of the survivors); a
    chunk in exactly 3 docs stays; a doc that is ALL boilerplate comes
    back as the empty string, not a dropped row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyetl_spark.registry import QUERIES

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"  # exactly one chunk
    rare = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"    # in 3 docs: stays
    texts = [
        boiler + " u0a u0b u0c u0d u0e u0f u0g u0h u0i u0j",  # 0
        boiler + " " + rare,                                    # 1
        boiler + " " + rare,                                    # 2
        boiler + " " + rare,                                    # 3
        boiler,                                                 # 4: all boiler
        "solo words only here nothing shared at all ok fine",   # 5
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_paragraph_global"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 6
    # the 4-doc chunk is stripped everywhere, in-order survivors remain
    assert out[0]["clean_text"] == "u0a u0b u0c u0d u0e u0f u0g u0h u0i u0j"
    assert out[0]["n_removed_chunks"] == 1 and out[0]["n_chunks"] == 2
    # the 3-doc chunk survives (threshold is > 3 DISTINCT docs)
    for i in (1, 2, 3):
        assert out[i]["clean_text"] == rare, out[i]
        assert out[i]["n_removed_chunks"] == 1
    # all-boilerplate doc -> empty string, still a row
    assert out[4]["clean_text"] == "" and out[4]["n_removed_chunks"] == 1
    # untouched doc round-trips byte-identically
    assert out[5]["clean_text"] == texts[5]
    assert out[5]["n_removed_chunks"] == 0 and out[5]["n_chunks"] == 1
