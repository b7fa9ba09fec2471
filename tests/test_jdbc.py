"""JDBC parity shim tests (SURVEY.md §2 S2/S3 JDBC variants).

The container ships no JDBC driver jar and no database server, so the
network round-trip is skip-gated; URL/option construction — the part that
encodes the reference's env-var contract (app/db.py:20-26) — is tested
unconditionally.
"""

from __future__ import annotations

import pytest

from etl_lorettoscarpa_1asfb2jf21_spark.sources.jdbc import (
    has_jdbc_driver,
    jdbc_properties,
    jdbc_url_from_env,
    read_jdbc,
    write_jdbc,
)


def test_jdbc_url_defaults_match_reference():
    # app/db.py:20-24 defaults: postgres/postgres@localhost:5432/loretto_dw
    assert jdbc_url_from_env({}) == "jdbc:postgresql://localhost:5432/loretto_dw"
    props = jdbc_properties({})
    assert props["user"] == "postgres" and props["password"] == "postgres"


def test_jdbc_url_env_overrides():
    env = {
        "DB_USER": "u",
        "DB_PASSWORD": "s",
        "DB_HOST": "dbhost",
        "DB_PORT": "5433",
        "DB_NAME": "warehouse",
    }
    assert jdbc_url_from_env(env) == "jdbc:postgresql://dbhost:5433/warehouse"
    assert jdbc_properties(env)["user"] == "u"


def test_write_jdbc_rejects_bad_mode(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="overwrite|append"):
        write_jdbc(df, "t", mode="replace")


def test_partitioned_read_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "t", partition_column="id")


def test_jdbc_roundtrip_if_driver_present(spark, tmp_path):
    """Full overwrite/append round-trip — runs only where a Postgres JDBC
    driver AND a reachable server exist (not in this container)."""
    if not has_jdbc_driver(spark):
        pytest.skip("no JDBC driver jar on the classpath")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_jdbc(df, "jdbc_smoke", mode="overwrite")
    write_jdbc(df, "jdbc_smoke", mode="append")
    back = read_jdbc(spark, "jdbc_smoke")
    assert back.count() == 4
