"""Dict-lookup recode — the reference's dominant scalar operator (SURVEY.md §2.7-C1).

The reference encodes ~15 hard-coded ``{source value: coding}`` maps (e.g.
race→OMB coding at ``entity_builders/patient.py:12-77``, the ~60-entry
family-relationship map at ``entity_builders/family_relationship.py:16-307``,
the ~70-entry specimen composition map at ``entity_builders/specimen.py:16-362``)
and applies them per-row in Python.

Spark-first: the maps are *literal data*, so they become an inline literal
``map(...)`` looked up with ``try_element_at`` (constant-folded, codegen'd,
zero shuffle, null on miss), or a broadcast lookup DataFrame + left join when
the map is shared across many queries and too big to inline.

The literal map is built as ONE ``F.expr(...)`` SQL string rather than
chained ``F.when``/``F.create_map(*lits)`` calls: every Column operation is
a driver-side py4j round-trip, and a 70-entry struct-valued when-chain costs
~1.7s of pure plan construction vs ~3ms for the equivalent parsed SQL
(measured; the JVM parses the string once). At 100 TB these all stay
map-side: no shuffle, no Python — and at 70-query driver programs the plan
build stays off the critical path too.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    """A SQL single-quoted string literal (backslash and quote escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _literal_map(entries: Mapping[str, str]) -> Column:
    """``map('k', 'v', ...)`` as one parsed expression."""
    body = ", ".join(f"{_sql_str(k)}, {_sql_str(v)}" for k, v in entries.items())
    return F.expr(f"map({body})")


def recode(col: Column, mapping: Mapping[str, str], default: Column | str | None = None) -> Column:
    """String→string recode via an inline literal map.

    ``default=None`` reproduces the reference's ``dict.get(val)`` →
    missing-key-yields-null behavior; pass ``default=col`` for
    ``dict.get(val, val)`` passthrough semantics.

    ``try_element_at`` (not ``[]``/``element_at``): ANSI mode (Spark 4
    default) makes plain map access raise on a missing key; the reference's
    ``dict.get`` is the try_ form.
    """
    looked_up = F.try_element_at(_literal_map(mapping), col)
    if default is None:
        return looked_up
    default_col = F.lit(default) if isinstance(default, str) else default
    return F.coalesce(looked_up, default_col)


def recode_coding(col: Column, mapping: Mapping[str, tuple[str, str, str]]) -> Column:
    """value → ``{system, code, display}`` coding struct via a literal
    struct-valued map; unmapped values yield null so the enclosing field is
    absent. The shared form of the coding-map lookups that appear in eight
    reference builders (patient/specimen/disease/phenotype/vital_status/
    proband_status/family_relationship/drs_document_reference)."""
    if not mapping:
        raise ValueError("empty mapping")
    body = ", ".join(
        f"{_sql_str(key)}, named_struct("
        f"'system', {_sql_str(system)}, 'code', {_sql_str(code)}, 'display', {_sql_str(display)})"
        for key, (system, code, display) in mapping.items()
    )
    return F.try_element_at(F.expr(f"map({body})"), col)


def recode_coding_array(col: Column, mapping: Mapping[str, tuple[str, str, str]]) -> Column:
    """Single-coding array form (``[coding]`` when mapped, absent otherwise) —
    the ``setdefault("coding", []).append(...)`` pattern."""
    c = recode_coding(col, mapping)
    return F.when(c.isNotNull(), F.array(c))


def recode_struct(col: Column, mapping: Mapping[str, Mapping[str, str]]) -> Column:
    """String→struct recode with caller-chosen field names; unmapped values
    yield null so the enclosing JSON field is absent (reference ``drop_none``
    semantics, ``common/utils.py:23-24``). All entries must share one field
    set — map values in SQL are a single type."""
    if not mapping:
        raise ValueError("empty mapping")
    field_sets = {tuple(fields.keys()) for fields in mapping.values()}
    if len(field_sets) != 1:
        raise ValueError(f"inconsistent struct fields across entries: {field_sets}")
    body = ", ".join(
        f"{_sql_str(key)}, named_struct("
        + ", ".join(f"{_sql_str(k)}, {_sql_str(v)}" for k, v in fields.items())
        + ")"
        for key, fields in mapping.items()
    )
    return F.try_element_at(F.expr(f"map({body})"), col)
