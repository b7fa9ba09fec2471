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


# ---------------------------------------------------------------------
# x3_unigram_rarity — CCNet-style corpus-frequency buckets
# ---------------------------------------------------------------------

def test_unigram_rarity_buckets_are_ordered_tertiles(spark, sf_medium):
    from etl_lorettoscarpa_1asfb2jf21_spark.queries_catalog_pipeline import QUERIES

    out = QUERIES["x3_unigram_rarity"](spark, sf_medium).toPandas()
    sizes = out["bucket"].value_counts().to_dict()
    n = len(out)
    # ntile(3): bucket sizes differ by at most 1
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    # buckets respect the mean_tf order: every head doc scores >= every
    # tail doc (ties broken inside ntile, so compare strict bounds only)
    assert out.loc[out.bucket == "head", "mean_tf"].min() >= \
        out.loc[out.bucket == "tail", "mean_tf"].max()
    # per-doc token accounting: sum_tf >= n_tokens (every token occurs
    # at least once corpus-wide — namely in this document)
    assert (out["sum_tf"] >= out["n_tokens"]).all()


# ---------------------------------------------------------------------
# tp8_domain_mix — deterministic per-source mixture sampling
# ---------------------------------------------------------------------

def test_domain_mix_rates_and_determinism(spark, sf_medium):
    from etl_lorettoscarpa_1asfb2jf21_spark.queries_catalog_pipeline import QUERIES
    from etl_lorettoscarpa_1asfb2jf21_spark.sources.tables import load_table

    totals = (
        load_table(spark, sf_medium, "documents")
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    out = QUERIES["tp8_domain_mix"](spark, sf_medium).toPandas().set_index("source")
    for src, total in totals.items():
        kept = out.loc[src, "n_kept"]
        if int(src[3:]) % 2 == 0:
            assert kept == total, f"{src}: full-rate source must keep all"
        else:
            # rate 1/2 in exact 65536ths; binomial(25, .5) stays in [3, 22]
            # with probability ~1-4e-5 per source — deterministic anyway
            assert 0 < kept < total, f"{src}: half-rate source must subsample"
    # deterministic: identical digest on re-run (no RNG anywhere)
    again = QUERIES["tp8_domain_mix"](spark, sf_medium).toPandas().set_index("source")
    assert (out["kept_digest"] == again["kept_digest"]).all()
