"""run_pipeline memo lifecycle (VERDICT r05 #1: the steady-state memo moved
from the q85 gate into etl.run_pipeline so product callers get it; these pin
the semantics the gate-level memo had plus the new explicit block release)."""

from __future__ import annotations

import pytest

from kf_task_fhir_etl_spark import etl
from kf_task_fhir_etl_spark.etl import run_pipeline

from .fixtures import endpoint_tables


@pytest.fixture(autouse=True)
def _clean_memo():
    etl._PIPELINE_MEMO.clear()
    etl._RETIRED_CHECKPOINTS.clear()
    etl._STALE_PARKS.clear()
    yield
    etl._PIPELINE_MEMO.clear()
    etl._RETIRED_CHECKPOINTS.clear()
    etl._STALE_PARKS.clear()


def _counts(out):
    return sorted((r["target"], r["target_id"]) for r in out.collect())


def test_memo_hit_returns_same_object_and_rows(spark):
    tables = endpoint_tables(spark)
    out1 = run_pipeline(tables, single_pass=True, memo_key=("g", "v1"))
    out2 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"))
    assert out2 is out1  # re-served constructed plan, not a rebuild
    assert len(etl._PIPELINE_MEMO) == 1
    assert _counts(out2)  # still executable


def test_memo_version_supersede_releases_and_rebuilds(spark):
    out1 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"))
    rows1 = _counts(out1)
    out2 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v2"))
    assert out2 is not out1
    assert _counts(out2) == rows1
    # v1 evicted; only v2 remains
    keys = list(etl._PIPELINE_MEMO)
    assert len(keys) == 1 and keys[0][2] == "v2"
    # block release is DEFERRED per group (r06 review findings: immediate
    # release could fail a reader served v1 moments before the supersede,
    # and a GLOBAL retirement list could be drained by a concurrent sweep
    # of an unrelated group — q115's two-study pool): the superseded plan
    # must still EXECUTE during the grace window...
    assert _counts(out1) == rows1
    assert len(etl._RETIRED_CHECKPOINTS) == 1
    # ...an UNRELATED group's sweep must NOT drain it...
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g2", "v1"))
    assert len(etl._RETIRED_CHECKPOINTS) == 1
    assert _counts(out1) == rows1
    # ...and only the SAME group's next supersede (v2 → v3) releases v1's
    # blocks, after which re-executing v1 fails loudly (its checkpoint
    # data is gone) — the proof release_checkpoints did more than drop a
    # Python reference. v2's handles take v1's parked place.
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v3"))
    retired_versions = {rk[2] for rk in etl._RETIRED_CHECKPOINTS if rk[1] == "g"}
    assert retired_versions == {"v2"}
    with pytest.raises(Exception):
        out1.count()
    assert _counts(out2) == rows1  # v2 still in its grace window


def test_memo_mode_is_part_of_the_key(spark):
    out_union = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v"))
    out_dict = run_pipeline(endpoint_tables(spark), single_pass=False, memo_key=("g", "v"))
    assert isinstance(out_dict, dict)
    assert len(etl._PIPELINE_MEMO) == 2  # union and dict entries coexist
    # dict mode re-serves the same PLANS but as a fresh dict each time:
    # sharing the mutable container would let one caller's pop/assign
    # poison every later hit (r06 review)
    again = run_pipeline(endpoint_tables(spark), single_pass=False, memo_key=("g", "v"))
    assert again is not out_dict
    assert set(again) == set(out_dict)
    assert all(again[k] is out_dict[k] for k in again)  # shared immutable plans
    # caller mutation must not reach the memo
    again.pop(next(iter(again)))
    third = run_pipeline(endpoint_tables(spark), single_pass=False, memo_key=("g", "v"))
    assert set(third) == set(out_dict)
    assert out_union is not None


def test_memo_requires_checkpointing(spark):
    with pytest.raises(ValueError, match="memo_key requires checkpoint_wide"):
        run_pipeline(endpoint_tables(spark), checkpoint_wide=False, memo_key=("g", "v"))
    with pytest.raises(ValueError, match="memo_key requires checkpoint_wide"):
        run_pipeline(endpoint_tables(spark), cache_wide=True, memo_key=("g", "v"))


def test_memo_concurrent_same_key_single_winner(spark):
    """Two threads racing the same memo key must converge on ONE entry and
    both serve it (the loser's duplicate construction is released)."""
    from concurrent.futures import ThreadPoolExecutor

    tables = [endpoint_tables(spark) for _ in range(2)]
    with ThreadPoolExecutor(max_workers=2) as ex:
        outs = list(
            ex.map(
                lambda t: run_pipeline(t, single_pass=True, memo_key=("race", "v")),
                tables,
            )
        )
    assert outs[0] is outs[1]
    assert len(etl._PIPELINE_MEMO) == 1
    assert _counts(outs[0])


def test_unmemoized_calls_do_not_populate_the_memo(spark):
    run_pipeline(endpoint_tables(spark), single_pass=True)
    assert etl._PIPELINE_MEMO == {}


def test_memo_older_build_seq_cannot_displace_newer_entry(spark):
    """ADVICE r06 ordering guard: a construction with an older memo_seq
    committing AFTER the fresh entry must not displace it — the stale
    build still serves its own caller a working result, parks its blocks
    in the group's retirement list, and the memo keeps serving the fresh
    version; the group's next supersede releases the parked blocks."""
    fresh = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_new"), memo_seq=20
    )
    rows = _counts(fresh)
    stale = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10
    )
    # the stale caller got ITS OWN working construction...
    assert stale is not fresh
    assert _counts(stale) == rows
    # ...but the memo still holds ONLY the fresh entry
    keys = list(etl._PIPELINE_MEMO)
    assert len(keys) == 1 and keys[0][2] == "v_new"
    # a v_new request re-serves the resident fresh plans
    again = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_new"), memo_seq=20
    )
    assert again is fresh
    # the stale build's blocks are parked for grace release in the
    # STALE-park dict, keyed by its own (stale) version — NEVER in the
    # retirement dict, whose same-shaped key may hold a displaced resident
    # entry's grace handles (r07 review, second pass)
    parked = [k for k in etl._STALE_PARKS if k[1] == "g"]
    assert len(parked) == 1 and parked[0][2] == "v_old"
    assert not any(k[1] == "g" and k[2] == "v_old" for k in etl._RETIRED_CHECKPOINTS)
    # the stale construction still executes during its grace window...
    assert _counts(stale) == rows
    # ...survives the group's NEXT genuine supersede (two-phase: merely
    # marked — the displaced-entry grace standard, r07 review 5th pass)...
    run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_next"), memo_seq=30
    )
    assert any(k[2] == "v_old" for k in etl._STALE_PARKS if k[1] == "g")
    assert _counts(stale) == rows  # still executable after one supersede
    # ...and releases at the SECOND supersede
    run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_next2"), memo_seq=40
    )
    assert not any(k[2] == "v_old" for k in etl._STALE_PARKS if k[1] == "g")
    with pytest.raises(Exception):
        stale.count()  # blocks gone — release had teeth


def test_memo_default_seq_orders_construction_starts(spark):
    """Without explicit memo_seq, sequential builds get increasing tickets
    — the second (newer) build displaces the first as before; no behavior
    change on the ordinary path."""
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"))
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v2"))
    keys = list(etl._PIPELINE_MEMO)
    assert len(keys) == 1 and keys[0][2] == "v2"


def test_memo_seq_domain_mixing_raises(spark):
    """Default tickets and caller observation counters are incomparable —
    mixing them within one group must raise, not silently mark every
    default-ticket build stale forever (r07 review)."""
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"), memo_seq=10)
    with pytest.raises(ValueError, match="mixes"):
        run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v2"))


def test_memo_stale_retry_park_is_bounded(spark):
    """Stale parks are bounded at TWO resident generations per key: the
    first park survives one same-key retry (a concurrent racer must not
    free a construction another thread is handing its caller — r07
    review, fifth pass) and releases at the second retry."""
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v_new"), memo_seq=20)
    s1 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10)
    rows = _counts(s1)
    s2 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10)
    parked = [k for k in etl._STALE_PARKS if k[1] == "g" and k[2] == "v_old"]
    assert len(parked) == 1 and len(etl._STALE_PARKS[parked[0]]) == 2
    # one-generation grace: s1 still executes after ONE same-key retry
    assert _counts(s1) == rows
    s3 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10)
    assert len(etl._STALE_PARKS[parked[0]]) == 2  # bounded, not growing
    # the SECOND retry released the first park
    with pytest.raises(Exception):
        s1.count()
    # the newer constructions still execute during their grace windows
    assert _counts(s2) == rows
    assert _counts(s3) == rows


def test_memo_stale_commit_preserves_displaced_entry_grace(spark):
    """The straggler-commits-last scenario (r07 review, second pass): the
    resident v_old entry is displaced by v_new and its handles parked for
    grace; a straggler build of the SAME version v_old then commits as
    stale. Its park must not touch the displaced entry's retirement —
    the displaced plans (served to a reader moments before the
    supersede) must still execute."""
    served = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10
    )
    rows = _counts(served)
    run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_new"), memo_seq=20
    )
    # displaced v_old handles now sit in the retirement dict
    assert any(k[1] == "g" and k[2] == "v_old" for k in etl._RETIRED_CHECKPOINTS)
    # straggler re-commits v_old (older seq) → stale path, own park
    straggler = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v_old"), memo_seq=10
    )
    # the DISPLACED entry's grace window survived the stale park...
    assert any(k[1] == "g" and k[2] == "v_old" for k in etl._RETIRED_CHECKPOINTS)
    assert _counts(served) == rows  # reader's plans still execute
    # ...and the straggler's own construction works too
    assert _counts(straggler) == rows


def test_memo_domain_clash_raises_and_releases_own_construction(spark):
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"), memo_seq=5)
    before = dict(etl._PIPELINE_MEMO)
    with pytest.raises(ValueError, match="mixes"):
        run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v2"))
    # memo and parks unchanged — the clashing build neither entered nor parked
    assert dict(etl._PIPELINE_MEMO) == before
    assert not etl._STALE_PARKS


def test_memo_seq_without_memo_key_rejected(spark):
    with pytest.raises(ValueError, match="memo_seq requires memo_key"):
        run_pipeline(endpoint_tables(spark), single_pass=True, memo_seq=5)


def test_memo_domain_clash_fails_fast_before_construction(spark):
    """The domain pre-check raises at ticket allocation — BEFORE the
    pipeline is constructed — so a misconfigured retry loop does not pay
    a full build per raise (r07 review, eighth pass). Pinned by passing
    endpoint tables that would EXPLODE if transform_study ever ran."""
    from types import SimpleNamespace

    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"), memo_seq=5)
    # a stand-in exposing ONLY .sparkSession: any attempt to construct the
    # pipeline from it would crash with AttributeError, so reaching the
    # ValueError proves the raise happened before construction
    poisoned = {"studies": SimpleNamespace(sparkSession=spark)}
    with pytest.raises(ValueError, match="mixes"):
        run_pipeline(poisoned, single_pass=True, memo_key=("g", "v2"))


def test_memo_stale_parks_capped_group_wide(spark):
    """K distinct stale versions of one group must not pin K
    constructions: beyond the group-wide cap the oldest generation is
    released even before its per-key grace elapses (bounded memory wins
    over grace in a stale-build storm — r07 review, ninth pass)."""
    run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v_new"), memo_seq=100)
    stales = [
        run_pipeline(
            endpoint_tables(spark), single_pass=True, memo_key=("g", f"v{i}"), memo_seq=i
        )
        for i in range(1, 7)  # six distinct stale versions
    ]
    total = sum(
        len(v) for k, v in etl._STALE_PARKS.items() if k[1] == "g"
    )
    assert total <= etl._STALE_PARKS_GROUP_CAP
    # the OLDEST stale constructions were released...
    with pytest.raises(Exception):
        stales[0].count()
    # ...while the newest still executes in its grace window
    assert stales[-1].count() is not None


def test_memo_same_key_re_request_crossing_domains_is_served(spark, monkeypatch):
    """r07 ADVICE: the fail-fast domain pre-check must skip k == full_key,
    mirroring the commit-time loop — a re-request of the SAME resident
    (group, version, mode) is served from the memo at commit regardless of
    ticket domain, so the pre-check raising would make the outcome depend
    on timing. Simulate the only interleaving where the pre-check can see
    the resident same-key entry (inserted between the hit probe and the
    pre-check) by forcing one hit-probe miss."""
    out1 = run_pipeline(
        endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"), memo_seq=7
    )
    rows = _counts(out1)
    monkeypatch.setattr(etl, "memoized_pipeline", lambda *a, **k: None)
    # same key, OTHER (auto) domain: must serve the resident entry via the
    # commit-time setdefault, not raise in the pre-check
    out2 = run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v1"))
    assert _counts(out2) == rows
    assert len(etl._PIPELINE_MEMO) == 1
    # a DIFFERENT key in the other domain still fails fast
    with pytest.raises(ValueError, match="mixes"):
        run_pipeline(endpoint_tables(spark), single_pass=True, memo_key=("g", "v2"))
