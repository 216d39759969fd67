"""Mimics the driver's correctness gate locally: every registered query runs
on Spark AND its DuckDB oracle at sf0.001, then row-counts, column names, and
values must match (order-insensitive)."""

from __future__ import annotations

import pytest

from kf_task_fhir_etl_spark import queries as q

from .conftest import SF_SMOKE, normalize_rows


def all_query_names():
    return sorted(q.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, spark, duck_smoke):
    fn = q.queries()[name]
    sdf = fn(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    oracle = q.oracle_sql().get(name)
    if oracle is None:
        # driver falls back to rows-only check
        assert len(spark_rows) >= 0
        return

    res = duck_smoke.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    # align column order by name before value compare (driver sorts by name)
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_vals = normalize_rows([tuple(r[i] for i in s_idx) for r in spark_rows])
    d_vals = normalize_rows([tuple(r[i] for i in d_idx) for r in duck_rows])
    mismatches = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
