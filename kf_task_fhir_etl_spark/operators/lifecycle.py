"""Shared checkpoint-staging helper for multi-consumer operator subplans.

Catalyst re-derives a repeated DataFrame subplan once PER APPEARANCE in a
plan (the repo's measured r06 lesson — q129's three-consumer form scanned
the bloom-pruned frame three times per action), so operators whose
intermediate frames feed several consumers stage them behind a LAZY
localCheckpoint: the first action materializes each frame exactly once,
and the CALLER owns releasing the blocks (``etl.release_checkpoints``)
after its terminal action — the q123/q126/q134 gate lifecycle.

One shared implementation (r07 review, third pass): the identical
closure had been copy-pasted into three operators, the hand-rolled-copy
drift hazard the r06 review flagged for the LogicalRDD reach-through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def staged(df: DataFrame, handles_out: list[DataFrame] | None) -> DataFrame:
    """Lazily checkpoint ``df`` and append the handle for the caller to
    release — or return ``df`` untouched when ``handles_out`` is None
    (one-shot callers who accept per-appearance re-derivation rather
    than holding blocks they cannot release)."""
    if handles_out is None:
        return df
    out = df.localCheckpoint(eager=False)
    handles_out.append(out)
    return out


def prepared(df: DataFrame) -> DataFrame:
    """Materialize a relation once for repeat use: the eagerly
    checkpointed frame, which prepare-aware operators (``bloom_prune``,
    ``cms_estimate``) recognize via the LogicalRDD probe and reuse
    without re-checkpointing. Release with ``etl.release_checkpoints``
    on retirement. (``sketch.prepare_sketch`` AND its private
    ``_is_checkpointed_relation`` probe — which bloom.py currently
    imports across modules — predate this helper and keep their homes
    until the sketch gates rotate back into the check window; migrating
    them now would dirty q121 without a slot. Both move here in r08;
    r07 review, fifth + eighth passes.) Already-checkpointed inputs are
    returned as-is — re-preparing would duplicate the blocks (ninth
    pass), the same probe the consumers use."""
    from kf_task_fhir_etl_spark.operators.sketch import _is_checkpointed_relation

    if _is_checkpointed_relation(df):
        return df
    return df.localCheckpoint(eager=True)
