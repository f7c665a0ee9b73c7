"""Plan-property pins: pushdown reaches the parquet scan, projections prune
columns, narrow ops add no shuffle — the 100-TB checks from the task brief."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import coord_cols
from metric_search_spark.operators.tiling import tile_assign
from metric_search_spark.plans import (
    count_exchanges,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)

from tests.sparkutil import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_filter_pushdown_reaches_parquet(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").where(F.col("label") == 3)
    pf = pushed_filters(df)
    assert any("label" in f for f in pf), pf


def test_column_pruning(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    schemas = read_schema_columns(df)
    assert schemas and set(schemas[0]) == {"doc_id", "lang"}, schemas


def test_tile_assign_is_narrow(spark):
    """Tile assignment must add NO shuffle: a pure projection."""
    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1) + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2) + 1.0) / 2.0).alias("y"),
    )
    out = tile_assign(df, res=5)
    assert count_exchanges(out) == 0
    assert has_whole_stage_codegen(out)


def test_polyfill_is_shuffle_free(spark):
    """polygon_tiles is polygon-side Column math only: enumerate bbox cells,
    filter by the center test — no Exchange anywhere in the plan."""
    from metric_search_spark.entry_queries import _pip_polys_df
    from metric_search_spark.operators.pip import polygon_tiles

    out = polygon_tiles(_pip_polys_df(spark), res=5)
    assert count_exchanges(out) == 0


def test_cluster_quota_no_single_partition_sort(spark):
    """The quota-clustering global rank must not funnel the table through a
    single-partition window sort (VERDICT r1 item 3): range partition +
    per-partition rank + offsets instead."""
    from metric_search_spark.operators.tiling import cluster_quota
    from metric_search_spark.plans import has_single_partition_exchange

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    center = df.orderBy("id").first()["vec"]
    out = cluster_quota(df, (0.2, 0.6), center)
    # the result is checkpointed (so the operator can release its internal
    # cache — ADVICE r2); the ranking machinery's plan is exposed via
    # _msk_plan for exactly this pin
    plan_df = getattr(out, "_msk_plan", out)
    assert not has_single_partition_exchange(plan_df)
    # the range partition is real (it sits inside the InMemoryRelation /
    # checkpoint boundary, so look at the raw plan text)
    from metric_search_spark.plans.inspect import explain_text

    assert "rangepartitioning" in explain_text(plan_df)


def test_edit_join_no_nested_loop(spark):
    """The edit-distance join must plan as a band equi-join, never a
    BroadcastNestedLoopJoin / cartesian product (VERDICT r1 item 4)."""
    from metric_search_spark.entry_queries import q_edit_join_documents
    from metric_search_spark.plans import has_nested_loop_join

    out = q_edit_join_documents(spark, SF)
    assert not has_nested_loop_join(out)


def test_cell_derivation_codegen(spark):
    """phash→coords decode stays inside whole-stage codegen (no UDF)."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    xc, yc = coord_cols(F.col("o_orderkey") * 1000)
    out = df.select(xc.alias("x"), yc.alias("y"))
    assert has_whole_stage_codegen(out)
    assert count_exchanges(out) == 0


def test_single_partition_detection_not_vacuous(spark):
    """has_single_partition_exchange must actually FIRE on a global window
    sort (it parsed formatted mode before, where 'Exchange' and
    'SinglePartition' sit on different lines — vacuously False forever)."""
    from pyspark.sql import Window

    from metric_search_spark.plans import has_single_partition_exchange

    bad = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .withColumn("rn", F.row_number().over(Window.orderBy("vec_id")))
    )
    assert has_single_partition_exchange(bad)


def test_read_schema_handles_nested_types(spark):
    """Columns AFTER a nested-typed column must survive the ReadSchema
    parse (the old regex stopped at array<double>'s first '>')."""
    from metric_search_spark.plans import read_schema_columns

    df = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "embedding", "label"
    )
    schemas = read_schema_columns(df)
    assert schemas and set(schemas[0]) == {"embedding", "label"}, schemas


def test_tpch_date_filters_push_to_scan(spark):
    # the NTZ-literal predicates must reach the parquet scans (a cast
    # chain silently un-pushes them — the regression this pins)
    from metric_search_spark.entry_queries import (
        q_pricing_summary_lineitem,
        q_regional_revenue_orders,
        q_shipping_priority_orders,
    )

    for q, col in (
        (q_pricing_summary_lineitem, "l_shipdate"),
        (q_shipping_priority_orders, "l_shipdate"),
        (q_regional_revenue_orders, "o_orderdate"),
    ):
        pf = pushed_filters(q(spark, SF))
        assert any(
            col in f and ("LessThan" in f or "GreaterThan" in f) for f in pf
        ), (q.__name__, pf)


def test_pivot_single_scan(spark):
    # explicit value list ⇒ no extra distinct-values job and ONE scan of
    # events in the plan
    from metric_search_spark.entry_queries import q_pivot_events

    plan = (
        q_pivot_events(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")


def test_overlay_join_has_no_nested_loop(spark):
    """overlay_join's candidate stage must be the bbox-tile EQUI-join —
    never a cartesian/NLJ product of subjects x zones."""
    from metric_search_spark.operators.overlay import (
        overlay_join,
        synth_polygons,
    )
    from metric_search_spark.plans import has_nested_loop_join

    subs = spark.createDataFrame(
        synth_polygons(16), "poly_id long, xs array<double>, ys array<double>"
    )
    zones = spark.createDataFrame(
        [(0, [0.2, 0.8, 0.5], [0.2, 0.3, 0.8])],
        "zone_id long, zxs array<double>, zys array<double>",
    )
    out = overlay_join(subs, zones, res=3)
    assert not has_nested_loop_join(out)


def test_keypoint_match_has_no_nested_loop(spark):
    """keypoint_match candidates come from the (band_idx, band_val)
    equi-join; descriptors re-join by id — no all-pairs product."""
    from metric_search_spark.operators.features import keypoint_match
    from metric_search_spark.plans import has_nested_loop_join

    kps = spark.createDataFrame(
        [("a", 0, 4, 4, 9, 7, 11), ("b", 0, 5, 5, 9, 7, 11)],
        "image_id string, kp long, y long, x long, score long,"
        " d0 long, d1 long",
    )
    out = keypoint_match(kps, max_dist=3)
    assert not has_nested_loop_join(out)


def test_emd_histograms_single_corpus_pass(spark):
    """emd_histograms' pair self-join runs over the CHECKPOINTED per-label
    aggregate: exactly one row_number Window (one ranked corpus pass) may
    appear in the executed plan. Without the checkpoint, both join sides
    re-derive the full ranked/limit/histogram pipeline — the r5 plan audit
    found the Window (and its label-hash Exchange) duplicated, a doubled
    corpus pass at 10⁹ rows."""
    from metric_search_spark.entry_queries import q_emd_histograms

    df = q_emd_histograms(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number()") <= 1, plan[:2000]
