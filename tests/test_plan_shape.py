"""Physical-plan shape regression tests — the 100 TB design contract.

Correctness tests prove the operators compute the right answer at small
scale; these prove the PLANS are the ones that survive a 1000-executor
cluster reading 100 TB:

- filters and column projections reach the parquet scan (PushedFilters /
  ReadSchema) instead of being applied after a full-table read;
- dimension joins are broadcast-hash (no shuffle of the fact side);
- top-k compiles to TakeOrderedAndProject, not a global sort;
- relational plans stay inside whole-stage codegen (no Python in the
  hot path) and never degrade to a cartesian product.

A regression in any of these is invisible at sf0.01 and fatal at scale,
which is why they are asserted on the plan text, not on timings.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_football_analytics_pipeline_spark.plans import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    """Formatted physical plans of every registered query (built once)."""
    out = {}
    for name, fn in QUERIES.items():
        out[name] = plan_of(fn(spark, SF_SMOKE))
    return out


def test_filter_and_projection_pushdown_reach_parquet(plans):
    plan = plans["s1_scan_filter_project"]
    assert "PushedFilters:" in plan
    assert "LessThan(l_quantity" in plan
    # ReadSchema lists only the 4 referenced columns, not all 11
    read_schema = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_dim_lookup_joins_broadcast(plans):
    for name in ("j2_dim_lookup_left_join", "j6_star_join_agg", "j8_a11_fk_audit"):
        assert "BroadcastHashJoin" in plans[name], name


def test_star_join_broadcasts_every_dim(plans):
    # 4 joins: lineitem⋈orders (large-large) + 3 broadcast dims
    plan = plans["j6_star_join_agg"]
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_is_take_ordered_not_global_sort(plans):
    assert "TakeOrderedAndProject" in plans["a1_grouped_sum_topk"]
    # t5's bottom-k now lives inside t_order_suite's union: the limit
    # can't plan as TakeOrderedAndProject there, but it must still push
    # down as per-partition local limits (merge sees ≤ k rows per task,
    # never the table)
    assert "LocalLimit" in plans["t_order_suite"] or "TakeOrderedAndProject" in plans["t_order_suite"]


def test_aggregates_are_partial_final_hash(plans):
    # partial (map-side) aggregation before the exchange — the shape
    # that keeps a 100 TB groupBy's shuffle proportional to groups,
    # not rows
    plan = plans["q1_pricing_summary"]
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning" in plan


def test_relational_plans_have_no_cartesian_product(plans):
    # a3_a8_global_aggs cross-joins two SINGLE-ROW aggregates into one
    # suite row, text_ngram_suite broadcasts its ONE-ROW vocab-size
    # scalar, events_rollup_suite's gapfill leg broadcasts its ONE-ROW
    # [min,max] bounds aggregate into the grid, and sketch_suite's pcms
    # probe crosses the distinct GROUP KEYS (|groups| rows) with the
    # LITERAL d×|queries| probe table plus the bm25 one-row stats
    # broadcast — constant-size by construction, not data joins
    # ann_cosine_topk's hybrid part carries bm25's one-row corpus-stats
    # broadcast (same class as text_ngram_suite's)
    allowed_constant_cross = {
        "a3_a8_global_aggs", "text_ngram_suite", "events_rollup_suite",
        "sketch_suite", "ann_cosine_topk",
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        if name not in allowed_constant_cross:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_relational_plans_stay_jvm_side(plans):
    """No Python evaluation in plans that are expressible relationally.
    (mapInPandas is the designed fast path for the kernel operators —
    everything else must compile to codegen'd JVM expressions.)"""
    kernel_queries = {
        # Arrow-batched numpy kernels by design
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk", "dedup_clusters",
        "dedup_embedding_cosine", "dedup_embedding_lsh",
        "dedup_minhash_suite", "dedup_ngram_jaccard", "dedup_simhash",
        "mm_decode_suite", "mm_image_near_dup",
        # stratified_sample's partition-local top-k combiner
        "corpus_mixture_suite",
        # span leg's vectorized window-hash kernel (one xxhash64 per
        # token JVM-side, numpy polynomial combine per window)
        "text_ngram_suite",
        # compression-ratio leg: zlib is not Column algebra, so it is
        # an Arrow-batched mapInPandas kernel by design (r7)
        "text_profile",
    }
    for name, plan in plans.items():
        if name in kernel_queries:
            continue
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"{name} fell off the JVM fast path ({marker})"


def test_candidate_generation_never_broadcasts_corpus(plans):
    """Dedup candidate generation must NOT broadcast tables that grow
    with the corpus. minhash/simhash candidate joins are shuffled hash
    joins on the bucket key (AQE-skew-splittable); the embedding LSH
    scores bucket-locally (coarse n_planes-bit buckets) — one
    hash-partitioned exchange on (table, bucket) into a grouped pandas
    kernel, no join at all."""
    for name in ("dedup_minhash_suite", "dedup_simhash"):
        assert "ShuffledHashJoin" in plans[name], name
    assert "FlatMapGroupsInPandas" in plans["dedup_embedding_lsh"]
    assert "hashpartitioning(table" in plans["dedup_embedding_lsh"]
    for name in ("dedup_simhash", "dedup_embedding_lsh"):
        assert "BroadcastHashJoin" not in plans[name], name


def test_no_driver_collect_in_query_bodies():
    """Registered queries must be distributed plans, not driver loops:
    the only permitted `.collect()` in the plan layer is the bounded
    CSV-fixture writer (dimension-table-sized, documented) and the
    bounded-by-construction kernel collects inside operators/ (BLAS
    gram bitmap under its size bound, k-means sample, query sets)."""
    import pathlib

    plans_dir = pathlib.Path(__file__).parent.parent / (
        "etl_football_analytics_pipeline_spark/plans"
    )
    offenders = []
    for path in plans_dir.glob("*.py"):
        src = path.read_text()
        in_allowed = False
        for i, line in enumerate(src.splitlines(), 1):
            if line.startswith("def "):
                in_allowed = line.startswith("def _write_fixture_csvs")
            if ".collect()" in line and not in_allowed:
                offenders.append(f"{path.name}:{i}")
    assert not offenders, f"driver-side collect in query bodies: {offenders}"


def test_relational_plans_use_whole_stage_codegen(spark):
    # codegen spans only appear on the executed (AQE-final) plan, so
    # run the query and inspect queryExecution().executedPlan()
    for name in ("s1_scan_filter_project", "q1_pricing_summary", "j6_star_join_agg"):
        df = QUERIES[name](spark, SF_SMOKE)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        # codegen'd operators carry the `*(n)` stage prefix in the tree
        assert "*(" in executed, name


def test_corpus_suite_plan_shape(plans):
    """The corpus-assembly suite must stay distributed: its packing
    window is value-bucket-partitioned (never SinglePartition), and
    nothing in the suite falls back to a nested-loop join."""
    plan = plans["corpus_mixture_suite"]
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the packing cumsum is windowed
    assert "BroadcastNestedLoopJoin" not in plan


def test_sketch_suite_is_partial_aggregated(plans):
    """Sketches must partial-aggregate map-side: the exchange carries
    one fixed-size sketch per group, not rows (the whole point of the
    tier)."""
    plan = plans["sketch_suite"]
    assert "partial_approx_count_distinct" in plan or "ObjectHashAggregate" in plan
    assert "SinglePartition" not in plan


def test_new_suites_avoid_cartesian_and_nested_loop(plans):
    """The r4 additions keep the join discipline: candidate/merge
    joins are hash joins on keys, never cartesian or nested-loop."""
    for name in (
        "warehouse_history_suite",
        "dq_expectations_suite",
        "fuzzy_match_dedup",
        "doc_chunk_suite",
        "merge_upsert_suite",
        "cast_parse_suite",
        "t_order_suite",
        "w_window_suite",
    ):
        plan = plans[name]
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_doc_chunk_plan_is_shuffle_free(plans):
    """Chunking is embarrassingly parallel and must stay that way —
    no exchange anywhere in the plan."""
    assert "Exchange" not in plans["doc_chunk_suite"]


def test_fuzzy_suite_candidates_are_shuffle_hash(plans):
    assert "ShuffledHashJoin" in plans["fuzzy_match_dedup"]


def test_text_ngram_suite_plan_shape(plans):
    """The LM leg joins the model relationally: vocab size arrives as
    a one-row BROADCAST (never a driver collect at build time), the
    (context, token) joins are shuffle/broadcast hash joins — no
    nested-loop except the single-row vocab cross join — and the
    top-k leg still compiles to TakeOrderedAndProject."""
    plan = plans["text_ngram_suite"]
    assert "TakeOrderedAndProject" in plan
    # the only BroadcastNestedLoopJoin nodes allowed are the two
    # ONE-ROW scalar broadcasts: the LM leg's vocab size and the bm25
    # leg's (N, sum_dl) corpus stats (formatted explain prints each
    # node once in the numbered detail section)
    import re

    bnl_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnl_nodes) <= 2, plan
    assert "CartesianProduct" not in plan


def test_classifier_scoring_is_map_only(spark):
    """The corpus-wide classifier pass (quality_score) must stay a
    map-only plan — broadcast weights, one ArrowEvalPython/mapInPandas
    over the scan, ZERO Exchange: a document's tokens never leave its
    row. This is the pass that actually touches 100 TB."""
    import numpy as np

    from etl_football_analytics_pipeline_spark.operators.classifier import (
        quality_score,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = quality_score(docs, np.zeros(33), "doc_id", "text")
    plan = plan_of(df)
    # the only allowed Exchange is spread()'s round-robin widening of
    # the single-file test corpus (a no-op at real scale); a KEYED
    # shuffle would mean tokens left their row
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_pq_encode_is_map_only(spark):
    """PQ encoding (the 16x corpus compression pass) is map-only:
    codebooks broadcast, vectors never shuffle."""
    import numpy as np

    from etl_football_analytics_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    df = pq_encode(emb, np.zeros((4, 16, 16)), "vec_id", "embedding")
    plan = plan_of(df)
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_salted_topk_is_two_stage_not_global_group_sort(spark):
    """grouped_topk's plan must show TWO Window operators: stage 1
    partitioned by (group, salt) — the spread that keeps any single
    task from sorting a whole group's corpus-sized rows — and stage 2
    by the group alone over the bounded survivors. A regression to one
    group-partitioned window funnels 100 TB/|groups| rows through one
    task."""
    from pyspark.sql import functions as F

    from etl_football_analytics_pipeline_spark.operators.topk import (
        grouped_topk,
    )
    from etl_football_analytics_pipeline_spark.sources.registry import (
        load_table,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = grouped_topk(
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2, plan
    # stage 1's partition spec carries the salt term alongside the group
    assert "spark_partition_id" in plan.lower() or "pmod" in plan.lower(), plan
    # bonus (Spark 4): WindowGroupLimit pushes the k-limit below BOTH
    # exchanges — each map task forwards at most k rows per
    # (group, salt) before any shuffle
    assert "WindowGroupLimit" in plan, plan


def test_shard_shuffle_window_is_shard_local(spark):
    """shard_shuffle's position window must partition by the shard —
    never a global (empty-partition) window, whose single task would
    sort the whole corpus."""
    from etl_football_analytics_pipeline_spark.operators.corpus import (
        shard_shuffle,
    )

    out = shard_shuffle(
        spark.range(1000).withColumnRenamed("id", "doc_id"),
        "doc_id", seed=1, n_shards=16,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the exchange ahead of the window hashes on the shard column...
    assert "hashpartitioning(shard" in plan, plan
    # ...and the window spec itself leads with the shard term (a
    # global-window regression would start with the order key instead)
    assert "windowspecdefinition(shard" in plan, plan


def test_dash_suite_broadcasts_dims_and_rank_pushes_down(plans):
    """The r9 dashboard parts keep the 100 TB shapes: every dim join
    broadcast-hash (never a fact-side shuffle for a tiny dim), no
    sort-merge anywhere, and the recent-k window compiles to
    WindowGroupLimit — rank evaluated with per-partition group limits
    below the exchange, so the shuffle carries ≤ k rows per key, not
    the selected teams' whole history. Catalyst also propagates the
    dim-side c_custkey<=20 pruning across the join onto the ORDERS
    scan as a pushed filter — asserted because losing it would turn
    the recent-form leg into a full fact scan."""
    plan = plans["dash_season_summary"]
    assert "SortMergeJoin" not in plan
    # r10: 2 dims × (home_away, recent, attack leg, defense leg,
    # xg_vs_goals) plus the attack/defense POST-AGG join itself — an
    # aggregated frame is O(groups) rows by construction, so it must
    # broadcast too
    assert plan.count("BroadcastHashJoin") >= 11
    assert "WindowGroupLimit" in plan
    assert "LessThanOrEqual(o_custkey,20)" in plan
    # the xg leg's season filter is a RANGE predicate pushed to the
    # lineitem scan (min/max row-group pruning), never YEAR(x)=k
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_stream_merge_leg_reads_resolved_tree_with_pruned_agg(plans):
    """The stream_merge tier scans the manifest-resolved merged target
    (a parquet scan, not a re-run of the stream) and aggregates with
    map-side partials like every other tier."""
    plan = plans["events_rollup_suite"]
    assert "_trees/v" in plan  # the manifest tree path is in the scan
    assert "partial_count" in plan or "partial_sum" in plan
