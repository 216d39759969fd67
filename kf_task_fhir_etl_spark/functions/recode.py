"""Dict-lookup recode — the reference's dominant scalar operator (SURVEY.md §2.7-C1).

The reference encodes ~15 hard-coded ``{source value: coding}`` maps (e.g.
race→OMB coding at ``entity_builders/patient.py:12-77``, the ~60-entry
family-relationship map at ``entity_builders/family_relationship.py:16-307``,
the ~70-entry specimen composition map at ``entity_builders/specimen.py:16-362``)
and applies them per-row in Python.

Spark-first: the maps are *literal data*, so they become either

- an inline ``F.create_map(*literals)[key]`` (constant-folded, codegen'd,
  zero shuffle — right for scalar string→string maps), or
- for struct-valued codings, a chained ``F.when`` (also codegen'd), or
- a broadcast lookup DataFrame + left join when the map is shared across
  many queries and too big to inline.

At 100 TB these all stay map-side: no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def recode(col: Column, mapping: Mapping[str, str], default: Column | str | None = None) -> Column:
    """String→string recode via an inline literal map.

    ``default=None`` reproduces the reference's ``dict.get(val)`` →
    missing-key-yields-null behavior; pass ``default=col`` for
    ``dict.get(val, val)`` passthrough semantics.
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    looked_up = F.create_map(*pairs)[col]
    if default is None:
        return looked_up
    default_col = F.lit(default) if isinstance(default, str) else default
    return F.coalesce(looked_up, default_col)


def recode_coding(col: Column, mapping: Mapping[str, tuple[str, str, str]]) -> Column:
    """value → ``{system, code, display}`` coding struct via a literal
    ``F.when`` chain; unmapped values yield null so the enclosing field is
    absent. The shared form of the coding-map lookups that appear in eight
    reference builders (patient/specimen/disease/phenotype/vital_status/
    proband_status/family_relationship/drs_document_reference)."""
    expr: Column | None = None
    for key, (system, code, display) in mapping.items():
        struct_col = F.struct(
            F.lit(system).alias("system"), F.lit(code).alias("code"), F.lit(display).alias("display")
        )
        expr = F.when(col == key, struct_col) if expr is None else expr.when(col == key, struct_col)
    if expr is None:
        raise ValueError("empty mapping")
    return expr


def recode_coding_array(col: Column, mapping: Mapping[str, tuple[str, str, str]]) -> Column:
    """Single-coding array form (``[coding]`` when mapped, absent otherwise) —
    the ``setdefault("coding", []).append(...)`` pattern."""
    c = recode_coding(col, mapping)
    return F.when(c.isNotNull(), F.array(c))


def recode_struct(col: Column, mapping: Mapping[str, Mapping[str, str]]) -> Column:
    """String→struct recode (e.g. value → FHIR ``coding`` struct) via a
    ``F.when`` chain; unmapped values yield null so the enclosing JSON field
    is absent (reference ``drop_none`` semantics, ``common/utils.py:23-24``)."""
    expr: Column | None = None
    for key, struct_fields in mapping.items():
        struct_col = F.struct(*[F.lit(v).alias(k) for k, v in struct_fields.items()])
        expr = F.when(col == key, struct_col) if expr is None else expr.when(col == key, struct_col)
    if expr is None:
        raise ValueError("empty mapping")
    return expr
