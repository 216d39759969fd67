"""Normalization operator — Spark equivalent of the reference's ``clean_up_df``.

The reference pipes both output tables through
``kf_lib_data_ingest.common.misc.clean_up_df`` (called at reference
``etl/ingest.py:256-258`` and ``etl/ingest.py:485``), which establishes the
engine's *stringly-typed tabular* model (SURVEY.md §1):

- every cell becomes a trimmed string;
- numerics are down-cast on the way (``1.0`` → ``"1"``, ``1.5`` → ``"1.5"``);
- empty strings / NaN become null;
- exact-duplicate rows are dropped.

Implemented 100% with native column expressions so it stays inside
whole-stage codegen — no UDFs, no pandas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stringify_col(col: Column, dtype: T.DataType) -> Column:
    """Cast one column to the normalized string form.

    Fractional types down-cast to integer strings when the value is whole
    (pandas float→str of ``1.0`` after clean_up_df is ``"1"``); booleans map
    to the literal ``"True"``/``"False"`` strings the reference asserts on
    (reference ``entity_builders/proband_status.py:40``).
    """
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        # try_cast: ANSI mode (Spark 4 default) errors on overflow casts;
        # out-of-long-range doubles must fall through to the plain string form
        as_long = col.try_cast("bigint")
        null_like = col.isNull()
        if not isinstance(dtype, T.DecimalType):
            # clean_up_df nulls NaN; isnan is only defined on float/double
            null_like = null_like | F.isnan(col)
        return F.when(null_like, F.lit(None).cast(T.StringType())).otherwise(
            F.when(
                as_long.isNotNull() & (col == as_long.cast(dtype)), as_long.cast(T.StringType())
            ).otherwise(col.cast(T.StringType()))
        )
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("True")).when(~col, F.lit("False"))
    out = col.cast(T.StringType())
    if isinstance(dtype, T.StringType):
        out = F.trim(out)
    # Empty-after-trim → null (clean_up_df nulls empties).
    return F.when(F.length(out) == 0, F.lit(None).cast(T.StringType())).otherwise(out)


def _stringify_sql(name: str, dtype: T.DataType) -> str:
    """SQL-string twin of :func:`stringify_col` — semantically identical
    (tests/test_properties.py cross-checks them), but parsed JVM-side in one
    shot. Rationale: ``normalize`` runs over 100+-column wide tables and
    every Column method is a driver-side py4j round-trip; ~10 calls/column ×
    100 columns × every pipeline/narrow query adds whole seconds of pure
    plan-construction time (cProfile: 39k round-trips in q85). One
    ``selectExpr`` keeps the identical expression tree at ~zero driver cost."""
    c = f"`{name}`"
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        back = dtype.simpleString()
        null_like = f"{c} IS NULL" if isinstance(dtype, T.DecimalType) else f"{c} IS NULL OR isnan({c})"
        return (
            f"CASE WHEN {null_like} THEN CAST(NULL AS STRING) "
            f"WHEN TRY_CAST({c} AS BIGINT) IS NOT NULL AND {c} = CAST(TRY_CAST({c} AS BIGINT) AS {back}) "
            f"THEN CAST(TRY_CAST({c} AS BIGINT) AS STRING) "
            f"ELSE CAST({c} AS STRING) END AS {c}"
        )
    if isinstance(dtype, T.BooleanType):
        return f"CASE WHEN {c} THEN 'True' WHEN NOT {c} THEN 'False' END AS {c}"
    out = f"TRIM(CAST({c} AS STRING))" if isinstance(dtype, T.StringType) else f"CAST({c} AS STRING)"
    return f"NULLIF({out}, '') AS {c}"


def normalize(df: DataFrame, drop_duplicates: bool = True) -> DataFrame:
    """Apply the full clean_up_df semantics to every column.

    ``dropDuplicates()`` at the end collapses the redundancy introduced by the
    outer-join fan-out (reference ``etl/ingest.py:485``). On a cluster this is
    a hash-repartition on all columns; Spark plans it as a partial (map-side)
    aggregate first, so the shuffle only carries distinct rows.
    """
    out = df.selectExpr(*[_stringify_sql(f.name, f.dataType) for f in df.schema.fields])
    if drop_duplicates:
        out = out.dropDuplicates()
    return out
