"""Nested-JSON (FHIR resource) assembly primitives — SURVEY.md §2.7 C5-C10.

Every reference entity builder composes a nested dict with *absent-if-null*
fields (the ``setdefault`` + ``drop_none`` pattern, reference
``common/utils.py:23-24``). In Spark that is ``F.struct``/``F.array`` column
expressions serialized with ``F.to_json(..., ignoreNullFields=true)`` — all
JVM-side, whole-stage-codegen'd, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Missing-data sentinel values that suppress coding emission
# (reference ``entity_builders/disease.py:26-35``, ``phenotype.py:26-35``,
# ``drs_document_reference.py:151-160``).
MISSING_DATA_VALUES = (
    "Cannot Collect",
    "No Match",
    "Not Able to Provide",
    "Not Available",
    "Not Applicable",
    "Not Reported",
    "Other",
    "Unknown",
)

# Histopathology variant (reference ``entity_builders/histopathology.py:19-25``).
HISTOPATHOLOGY_MISSING_VALUES = (
    "N/A",
    "Not Applicable",
    "Not Available",
    "Not Reported",
    "Unavailable",
    "Unknown",
)


def not_missing(col: Column, sentinels: tuple[str, ...] = MISSING_DATA_VALUES) -> Column:
    """True when the value is present and not a missing-data sentinel
    (SURVEY.md §2.5-F2)."""
    return col.isNotNull() & ~col.isin(*sentinels)


def try_cast(col: Column, dtype: str) -> Column:
    """Reference builders wrap numeric casts in try/except and *drop the
    field* on failure (e.g. ``int(event_age_days)`` at
    ``entity_builders/disease.py:182``, ``float(volume_ul)`` at
    ``specimen.py:591``). ``try_cast`` reproduces invalid→null (→ absent in
    the serialized JSON), never an error."""
    return col.try_cast(dtype)


def coding(system: str | Column, code: str | Column, display: str | Column | None = None) -> Column:
    """A FHIR ``coding`` struct literal."""
    fields = [
        (F.lit(system) if isinstance(system, str) else system).alias("system"),
        (F.lit(code) if isinstance(code, str) else code).alias("code"),
    ]
    if display is not None:
        fields.append((F.lit(display) if isinstance(display, str) else display).alias("display"))
    return F.struct(*fields)


def codeable_concept(codings: Column | None = None, text: Column | None = None) -> Column:
    """A FHIR ``codeableConcept`` struct; pass null columns for absent parts."""
    fields = []
    if codings is not None:
        fields.append(codings.alias("coding"))
    if text is not None:
        fields.append(text.alias("text"))
    return F.struct(*fields)


_CODING_ARRAY_T = "array<struct<system:string,code:string,display:string>>"
_VCC_T = f"struct<coding:{_CODING_ARRAY_T}>"
_DURATION_T = "struct<value:int,unit:string,system:string,code:string>"


def relative_date_extension(event_age_days: Column) -> Column:
    """The birth-relative-date FHIR extension template the reference repeats
    verbatim in four builders (``disease.py:160-194``, ``phenotype.py:114-148``,
    ``vital_status.py:83-117``, ``specimen.py:552-586``): an ``_recordedDate``/
    ``_effectiveDateTime``/``_collectedDateTime`` element whose inner
    sub-extensions are [event=Birth coding, relationship=after, offset=N days].

    The whole struct is null (→ field absent) when the int cast fails,
    matching the reference's swallowed ``int()`` exception. Heterogeneous
    sub-extension elements share one struct shape with nullable value fields;
    ``to_json(ignoreNullFields)`` drops the unused ones.
    """
    days = try_cast(event_age_days, "int")
    event_elem = F.struct(
        F.lit("event").alias("url"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("http://snomed.info/sct").alias("system"),
                    F.lit("3950001").alias("code"),
                    F.lit("Birth").alias("display"),
                )
            ).alias("coding")
        ).alias("valueCodeableConcept"),
        F.lit(None).cast("string").alias("valueCode"),
        F.lit(None).cast(_DURATION_T).alias("valueDuration"),
    )
    relationship_elem = F.struct(
        F.lit("relationship").alias("url"),
        F.lit(None).cast(_VCC_T).alias("valueCodeableConcept"),
        F.lit("after").alias("valueCode"),
        F.lit(None).cast(_DURATION_T).alias("valueDuration"),
    )
    offset_elem = F.struct(
        F.lit("offset").alias("url"),
        F.lit(None).cast(_VCC_T).alias("valueCodeableConcept"),
        F.lit(None).cast("string").alias("valueCode"),
        F.struct(
            days.alias("value"),
            F.lit("day").alias("unit"),
            F.lit("http://unitsofmeasure.org").alias("system"),
            F.lit("d").alias("code"),
        ).alias("valueDuration"),
    )
    return F.when(
        days.isNotNull(),
        F.struct(
            F.array(
                F.struct(
                    F.array(event_elem, relationship_elem, offset_elem).alias("extension"),
                    F.lit("http://hl7.org/fhir/StructureDefinition/relative-date").alias("url"),
                )
            ).alias("extension")
        ),
    )


def to_resource_json(resource_struct: Column) -> Column:
    """Serialize a resource struct with absent-if-null semantics
    (``drop_none``, reference ``common/utils.py:23-24``)."""
    return F.to_json(resource_struct, {"ignoreNullFields": "true"})


def string_or_null(col: Column) -> Column:
    """Truthiness gate used before emitting optional JSON fields
    (SURVEY.md §2.5-F8): empty string behaves like absent."""
    return F.when(col.isNotNull() & (F.length(F.trim(col)) > 0), F.trim(col))


__all__ = [
    "MISSING_DATA_VALUES",
    "HISTOPATHOLOGY_MISSING_VALUES",
    "not_missing",
    "try_cast",
    "coding",
    "codeable_concept",
    "relative_date_extension",
    "to_resource_json",
    "string_or_null",
]
