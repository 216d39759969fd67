"""Registry invariants for the driver contract — pure-Python (no Spark
session): ordering, uniqueness, and the correctness-window rotation policy
stay structurally sound as queries are added."""

from __future__ import annotations

from kf_task_fhir_etl_spark import queries as q

WINDOW = 50  # the driver hash-checks the first 50 registry entries


def test_registry_names_unique_and_oracles_subset():
    names = list(q.queries())
    oracles = q.oracle_sql()
    assert len(names) == len(set(names))
    assert set(oracles) <= set(names)
    # every registry entry carries a DuckDB oracle (q57's sketch gate got
    # its deterministic within-bound oracle in r04)
    assert set(oracles) == set(names)


def test_rotation_lists_are_consistent():
    names = list(q.queries())
    assert set(q._CHECK_FIRST) <= set(names)
    assert set(q._CHECK_LAST) <= set(names)
    assert not set(q._CHECK_FIRST) & set(q._CHECK_LAST)
    # unproven/changed gates must land inside the driver's hash window
    window = set(names[:WINDOW])
    assert set(q._CHECK_FIRST) <= window


def test_every_query_is_callable_and_named_consistently():
    for name, fn in q.queries().items():
        assert callable(fn)
        assert fn.__name__ == name, f"{name} registered under a different function name"
