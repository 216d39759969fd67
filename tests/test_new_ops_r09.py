"""Round-9 operator tests: the incremental_dedup params-validation memo
(VERDICT r08 #7), the k_core handles_out release handle (r08 ADVICE),
weighted SSSP, join-view IVM, and streaming pattern spans (VERDICT r08
#4-#6)."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark import etl
from kf_task_fhir_etl_spark.operators import dedup, graph


# ---------------------------------------------------------------------------
# incremental_dedup params-validation memo (VERDICT r08 #7)
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_CORPUS_ROWS = [(i, f"alpha beta gamma delta {i}") for i in range(20)]
_BATCH_ROWS = [(100, "alpha beta gamma delta 3"), (101, "totally different words here now")]


def _collect_spy(spark, monkeypatch):
    """Count DataFrame.collect calls — incremental_dedup's construction
    path is lazy except the params validation (and the opt-in coverage
    join), so the count isolates exactly the validation reads. Patches
    the CONCRETE class (Spark 4's classic DataFrame overrides collect;
    patching the pyspark.sql.DataFrame base would miss it)."""
    calls = []
    cls = type(spark.range(1))
    orig = cls.collect

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    return calls


def test_params_validation_memoized_for_checkpointed_index(spark, monkeypatch):
    """The SECOND probe of the same prepared (checkpointed) index frame
    must skip the limit(1) params read entirely — the resident-driver
    steady state VERDICT r08 #7 asked for."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    calls = _collect_spy(spark, monkeypatch)
    dedup.incremental_dedup(batch, index, corpus)  # plan construction only
    first_probe = len(calls)
    assert first_probe == 1  # exactly the params validation read
    dedup.incremental_dedup(batch, index, corpus)
    assert len(calls) == first_probe  # memo hit: zero new eager reads
    etl.release_checkpoints([index])


def test_params_validation_not_memoized_for_lazy_index(spark, monkeypatch):
    """A LAZY index could gain a mismatched appended segment between
    probes — its verdict must never be cached (the memo's documented
    gate), so each probe re-runs the one validation read."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus)  # lazy: no checkpoint
    batch = _docs(spark, _BATCH_ROWS)
    calls = _collect_spy(spark, monkeypatch)
    dedup.incremental_dedup(batch, index, corpus)
    dedup.incremental_dedup(batch, index, corpus)
    assert len(calls) == 2  # one validation read per probe, no caching


def test_params_memo_is_per_params_not_per_frame(spark):
    """A memoized pass for one params tag must NOT vouch for different
    probe params against the same frame: the mismatch still raises."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    dedup.incremental_dedup(batch, index, corpus)  # validates h8.b4 params
    with pytest.raises(ValueError, match="probe LSH params"):
        dedup.incremental_dedup(batch, index, corpus, num_hashes=16, bands=8)
    etl.release_checkpoints([index])


def test_memoized_probe_results_unchanged(spark):
    """Memo on/off must be invisible to results: the second (memo-hit)
    probe returns exactly the first probe's survivors."""
    corpus = _docs(spark, _CORPUS_ROWS)
    index = dedup.minhash_index(corpus).localCheckpoint()
    batch = _docs(spark, _BATCH_ROWS)
    r1 = sorted(r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect())
    r2 = sorted(r["doc_id"] for r in dedup.incremental_dedup(batch, index, corpus).collect())
    assert r1 == r2
    assert 101 in r1  # the genuinely-new doc always survives
    assert 100 not in r1  # the near-dup of corpus doc 3 is screened
    etl.release_checkpoints([index])


# ---------------------------------------------------------------------------
# k_core handles_out (r08 ADVICE)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_k_core_handles_out_releases_final_checkpoint(spark):
    """k_core's returned frame aggregates over the final round's edge
    checkpoint; handles_out must hand that checkpoint back so the caller
    can release it AFTER materializing the result (r08 ADVICE — the
    funnel_counts contract). Releasing before reading would fail; the
    correct order works and frees the blocks for real."""
    # 4-clique (core) + a pendant chain that peels away
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11)]
    e = _edges(spark, clique + chain)
    handles: list[DataFrame] = []
    core = graph.k_core(e, k=3, handles_out=handles)
    assert len(handles) == 1
    got = {r["node"]: r["deg"] for r in core.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    etl.release_checkpoints(handles)
    with pytest.raises(Exception):
        handles[0].count()  # blocks gone, truncated lineage → loud failure


def test_k_core_without_handles_matches(spark):
    """handles_out=None keeps the r08 behavior (GC-reclaimed lifetime) and
    identical results."""
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = _edges(spark, clique + [(0, 20)])
    with_h: list[DataFrame] = []
    a = {(r["node"], r["deg"]) for r in graph.k_core(e, 2, handles_out=with_h).collect()}
    b = {(r["node"], r["deg"]) for r in graph.k_core(e, 2).collect()}
    assert a == b and len(a) == 4
    etl.release_checkpoints(with_h)
