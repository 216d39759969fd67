from kf_task_fhir_etl_spark.functions.normalize import normalize, stringify_col
from kf_task_fhir_etl_spark.functions.recode import recode, recode_struct
from kf_task_fhir_etl_spark.functions.strings import (
    basename,
    dbgap_accession,
    split_index,
)
from kf_task_fhir_etl_spark.functions.json_build import (
    coding,
    codeable_concept,
    not_missing,
    relative_date_extension,
    to_resource_json,
    try_cast,
)

__all__ = [
    "normalize",
    "stringify_col",
    "recode",
    "recode_struct",
    "basename",
    "dbgap_accession",
    "split_index",
    "coding",
    "codeable_concept",
    "not_missing",
    "relative_date_extension",
    "to_resource_json",
    "try_cast",
]
