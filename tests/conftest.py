"""Shared pytest fixtures: one SparkSession per test session, temp
warehouse, the sf0.001 tables as temp views."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from datanika_core_spark.session import EngineSession, build_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark = build_spark(
        app_name="datanika_tests",
        shuffle_partitions=8,
        warehouse_dir=str(wh),
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    return EngineSession(spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(engine, sf_dir):
    return engine.load_dir(sf_dir)


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        p = Path(SF_SMOKE) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()
