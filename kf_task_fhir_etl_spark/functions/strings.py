"""String scalar functions used across builders (SURVEY.md §2.7 C2-C4)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(col: Column, sep: str, index: int) -> Column:
    """``value.split(sep)[index]`` with Python negative-index support.

    Reference call sites: dbGaP accession ``external_id.split(".")[0]``
    (``entity_builders/research_study.py:77``), ``acl.split(".")[1]``
    (``entity_builders/drs_document_reference.py:326-329``),
    ``file_name.split("/")[-1]`` (``drs_document_reference.py:377``).
    ``element_at`` is 1-based and supports negative indices natively.
    """
    parts = F.split(col, sep)
    at = index + 1 if index >= 0 else index
    return F.element_at(parts, at)


def basename(col: Column) -> Column:
    """Last path segment — ``file_name.split("/")[-1]``
    (reference ``drs_document_reference.py:376-377``)."""
    return F.element_at(F.split(col, "/"), -1)


def dbgap_accession(external_id: Column, version: Column) -> Column:
    """Rebuild the versioned dbGaP accession the way the reference does
    (``research_study.py:76-79``): take the base accession before the first
    ``.``, then join with the study version when it looks like ``v<digit+>``."""
    base = split_index(F.trim(external_id), "\\.", 0)
    ver = F.trim(version)
    return F.when(
        base.startswith("phs") & ver.startswith("v"),
        F.concat_ws(".", base, ver),
    ).otherwise(base)
