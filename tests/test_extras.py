"""Semantics + plan-shape tests for the round-3 extras catalog
(queries_catalog_extras): null-safe join, INTERSECT ALL multiplicity,
overlapping document chunking, and the plan guarantees the docstrings
claim (hash join for eqNullSafe, no Exchange for chunking, broadcast +
no Window for feature scaling).
"""

from __future__ import annotations

from pyspark.sql import Row

from etl_lorettoscarpa_1asfb2jf21_spark.queries_catalog_extras import QUERIES
from tests.test_plans import plan_of


def test_null_safe_join_matches_nulls(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=None), Row(k=None)])
    right = spark.createDataFrame([Row(k=1), Row(k=None), Row(k=2)])
    out = left.join(right, left["k"].eqNullSafe(right["k"]), "inner")
    # 1 matches 1; each left null matches the right null -> 1 + 2 = 3
    assert out.count() == 3
    plain = left.join(right, left["k"] == right["k"], "inner")
    assert plain.count() == 1  # plain equality drops null keys


def test_null_safe_join_plan_stays_hash_join(spark, sf_medium):
    plan = plan_of(QUERIES["j10_null_safe_join"](spark, sf_medium))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_intersect_all_keeps_min_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(1,), (1,), (2,), (2,), (4,)], ["k"])
    rows = sorted(r.k for r in a.intersectAll(b).collect())
    assert rows == [1, 1, 2]  # min(count_a, count_b) per key


def test_chunking_widths_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(200))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    df.createOrReplaceTempView("_chunk_probe")

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r.chunk_idx: r.n_tok
            for r in QUERIES["tp6_chunk_documents"](spark, d).collect()
        }
    # width 128, stride 96 over 200 tokens: starts 0, 96, 192
    assert out == {0: 128, 1: 104, 2: 8}


def test_chunking_is_map_only(spark, sf_medium):
    plan = plan_of(QUERIES["tp6_chunk_documents"](spark, sf_medium))
    assert "Exchange" not in plan


def test_feature_scale_broadcasts_stats_no_window(spark, sf_medium):
    plan = plan_of(QUERIES["ml1_feature_scale"](spark, sf_medium))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
