from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kf_task_fhir_etl_spark.catalog import TPCH_TABLES, table_path
from kf_task_fhir_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("kf_task_fhir_etl_spark-tests")
    yield spark
    spark.stop()


def make_duck(sf_dir: str):
    """DuckDB connection with the driver's pre-registered views."""
    import duckdb

    con = duckdb.connect()
    for name in TPCH_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return make_duck(SF_SMOKE)


def normalize_rows(rows, ndigits: int = 6):
    """Order-insensitive, float-tolerant canonical form for row comparison."""
    out = []
    for row in rows:
        canon = []
        for v in row:
            if isinstance(v, float):
                canon.append(round(v, ndigits))
            else:
                canon.append(v)
        out.append(tuple(canon))
    return sorted(out, key=repr)
