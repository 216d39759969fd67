"""Driver-gated FHIR pipeline queries.

These put the REAL reference-parity pipeline — concept renames, the
full-outer cascade, normalize, and the Patient builder with its JSON
assembly — under the driver's DuckDB correctness gate, by deterministically
mapping TPC-H tables into Dataservice endpoint tables:

- ``region``   → studies      (kf_id = 'SD_'||r_regionkey)
- ``customer`` ⋈ ``nation`` → participants (kf_id = 'PT_'||c_custkey,
  study via nation's region; race/ethnicity/gender derived deterministically
  from mktsegment/custkey so every recode path is exercised and non-null)

The oracles replicate the same mapping in SQL. For resource JSON the DuckDB
side emits the same struct then strips the null-valued optional fields that
Spark's ``to_json(ignoreNullFields)`` omits (three fixed
``replace(...,'"field":null',...)`` rewrites — safe because the controlled
values can never contain those substrings).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders import patient as patient_builder
from kf_task_fhir_etl_spark.catalog import cached_table, load_table
from kf_task_fhir_etl_spark.plans.transform import transform_study
from kf_task_fhir_etl_spark.queries import register

# Observation tickets for the memo ordering guard (run_pipeline's
# memo_seq): drawn AT THE MOMENT a gate reads its content fingerprint, so
# versions are ordered by OBSERVATION, not by when construction reaches
# run_pipeline — the observe-then-build gap here is ~0.9 s of endpoint-
# table plan construction (SCALE.md), wide enough for an in-place data
# regeneration to invert commit order (r07 review, eighth pass; the exact
# inversion run_pipeline's docstring routes to memo_seq). One shared
# counter is monotonic for every group it serves.
_MEMO_OBS_SEQ = itertools.count(1)

# deterministic attribute derivations (mirrored in the SQL oracles)
_RACE_BY_SEGMENT = {
    "AUTOMOBILE": "White",
    "BUILDING": "Asian",
    "FURNITURE": "Black or African American",
    "MACHINERY": "Native Hawaiian or Other Pacific Islander",
    "HOUSEHOLD": "American Indian or Alaska Native",
}
_GENDERS = ("Male", "Female", "Unknown")
_ETHNICITIES = ("Hispanic or Latino", "Not Hispanic or Latino")


def _endpoint_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # cached_table (not load_table): the FHIR gates re-derive endpoint
    # tables from the same few base parquets over and over — the memo skips
    # the per-read schema-inference job (a measurable slice of q85's cold
    # wall). cached_table fingerprint-checks its files per call, so an
    # in-place regeneration re-probes instead of serving pre-regeneration
    # file listings (see catalog.cached_table).
    region = cached_table(spark, sf_dir, "region")
    nation = cached_table(spark, sf_dir, "nation")
    customer = cached_table(spark, sf_dir, "customer")

    studies = region.select(
        F.concat(F.lit("SD_"), F.col("r_regionkey")).alias("kf_id"),
        F.col("r_name").alias("name"),
        F.concat(F.lit("reg-"), F.col("r_regionkey")).alias("external_id"),
        F.lit("True").alias("visible"),
    )

    race = None
    for seg, val in _RACE_BY_SEGMENT.items():
        race = (
            F.when(F.col("c_mktsegment") == seg, F.lit(val))
            if race is None
            else race.when(F.col("c_mktsegment") == seg, F.lit(val))
        )
    gender = (
        F.when(F.col("c_custkey") % 3 == 0, _GENDERS[0])
        .when(F.col("c_custkey") % 3 == 1, _GENDERS[1])
        .otherwise(_GENDERS[2])
    )
    ethnicity = F.when(F.col("c_custkey") % 2 == 0, _ETHNICITIES[0]).otherwise(_ETHNICITIES[1])

    participants = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            F.concat(F.lit("PT_"), F.col("c_custkey")).alias("kf_id"),
            F.concat(F.lit("SD_"), F.col("n_regionkey")).alias("study_id"),
            F.concat(F.lit("cust-"), F.col("c_custkey")).alias("external_id"),
            race.alias("race"),
            ethnicity.alias("ethnicity"),
            gender.alias("gender"),
            F.when(F.col("c_custkey") % 2 == 0, "True").otherwise("False").alias("is_proband"),
            F.lit("Homo Sapiens").alias("species"),
            F.lit("True").alias("visible"),
        )
    )
    return {"studies": studies, "participants": participants}


_ORACLE_ENDPOINTS = """
    WITH studies AS (
      SELECT 'SD_' || r_regionkey AS "STUDY|TARGET_SERVICE_ID",
             r_name AS "STUDY|NAME",
             'reg-' || r_regionkey AS "STUDY|ID",
             'True' AS "STUDY|VISIBLE"
      FROM region
    ), participants AS (
      SELECT 'PT_' || c_custkey AS "PARTICIPANT|TARGET_SERVICE_ID",
             'SD_' || n_regionkey AS "STUDY|TARGET_SERVICE_ID",
             'cust-' || c_custkey AS "PARTICIPANT|ID",
             CASE c_mktsegment
               WHEN 'AUTOMOBILE' THEN 'White'
               WHEN 'BUILDING' THEN 'Asian'
               WHEN 'FURNITURE' THEN 'Black or African American'
               WHEN 'MACHINERY' THEN 'Native Hawaiian or Other Pacific Islander'
               WHEN 'HOUSEHOLD' THEN 'American Indian or Alaska Native'
             END AS "PARTICIPANT|RACE",
             CASE WHEN c_custkey % 2 = 0 THEN 'Hispanic or Latino'
                  ELSE 'Not Hispanic or Latino' END AS "PARTICIPANT|ETHNICITY",
             CASE WHEN c_custkey % 3 = 0 THEN 'Male'
                  WHEN c_custkey % 3 = 1 THEN 'Female'
                  ELSE 'Unknown' END AS "PARTICIPANT|GENDER",
             CASE WHEN c_custkey % 2 = 0 THEN 'True' ELSE 'False' END AS "PARTICIPANT|IS_PROBAND",
             'Homo Sapiens' AS "PARTICIPANT|SPECIES",
             'True' AS "PARTICIPANT|VISIBLE"
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), wide AS (
      SELECT DISTINCT * FROM studies FULL OUTER JOIN participants USING ("STUDY|TARGET_SERVICE_ID")
    )
"""


@register(
    "q23_fhir_transform_cascade",
    oracle=_ORACLE_ENDPOINTS
    + """
    SELECT "STUDY|TARGET_SERVICE_ID", "STUDY|NAME", "PARTICIPANT|TARGET_SERVICE_ID",
           "PARTICIPANT|GENDER", "PARTICIPANT|RACE"
    FROM wide
    ORDER BY "PARTICIPANT|TARGET_SERVICE_ID"
    """,
)
def q23_fhir_transform_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual transform stage (rename maps + J2 outer join + normalize)
    over TPC-H-derived endpoint tables."""
    result = transform_study(_endpoint_tables(spark, sf_dir))
    wide = result.tables["default"]
    return wide.select(
        "STUDY|TARGET_SERVICE_ID",
        "STUDY|NAME",
        "PARTICIPANT|TARGET_SERVICE_ID",
        "PARTICIPANT|GENDER",
        "PARTICIPANT|RACE",
    ).orderBy("PARTICIPANT|TARGET_SERVICE_ID")


_OMB = "urn:oid:2.16.840.1.113883.6.238"
_RACE_CODE = {
    "White": "2106-3",
    "Asian": "2028-9",
    "Black or African American": "2054-5",
    "Native Hawaiian or Other Pacific Islander": "2076-8",
    "American Indian or Alaska Native": "1002-5",
}


def _race_code_sql() -> str:
    cases = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _RACE_CODE.items())
    return f'CASE "PARTICIPANT|RACE" {cases} END'


@register(
    "q24_fhir_patient_resources",
    oracle=_ORACLE_ENDPOINTS
    + f"""
    SELECT md5('patient' || '|' || "PARTICIPANT|TARGET_SERVICE_ID") AS target_id,
      replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'Patient',
          id := md5('patient' || '|' || "PARTICIPANT|TARGET_SERVICE_ID"),
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/Patient'],
            tag := [struct_pack(code := "STUDY|TARGET_SERVICE_ID")]),
          identifier := [
            struct_pack(use := 'official',
                        system := 'https://kf-api-dataservice.kidsfirstdrc.org/participants/'::VARCHAR,
                        value := "PARTICIPANT|TARGET_SERVICE_ID"),
            struct_pack(use := 'secondary', system := NULL::VARCHAR, value := "PARTICIPANT|ID")],
          extension := [
            struct_pack(
              url := 'http://hl7.org/fhir/us/core/StructureDefinition/us-core-race',
              extension := [
                struct_pack(url := 'text', valueString := "PARTICIPANT|RACE",
                            valueCoding := NULL::STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)),
                struct_pack(url := 'ombCategory', valueString := NULL::VARCHAR,
                            valueCoding := struct_pack(system := '{_OMB}'::VARCHAR,
                                                       code := ({_race_code_sql()})::VARCHAR,
                                                       display := "PARTICIPANT|RACE"))]),
            struct_pack(
              url := 'http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity',
              extension := [
                struct_pack(url := 'text', valueString := "PARTICIPANT|ETHNICITY",
                            valueCoding := NULL::STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)),
                struct_pack(url := 'ombCategory', valueString := NULL::VARCHAR,
                            valueCoding := struct_pack(system := '{_OMB}'::VARCHAR,
                                                       code := (CASE "PARTICIPANT|ETHNICITY"
                                                                 WHEN 'Hispanic or Latino' THEN '2135-2'
                                                                 WHEN 'Not Hispanic or Latino' THEN '2186-5'
                                                                END)::VARCHAR,
                                                       display := "PARTICIPANT|ETHNICITY"))])],
          gender := CASE "PARTICIPANT|GENDER" WHEN 'Male' THEN 'male'
                    WHEN 'Female' THEN 'female' WHEN 'Unknown' THEN 'unknown' END
        )),
        ',"valueCoding":null', ''),
        '"valueString":null,', ''),
        '"system":null,', '') AS resource_json
    FROM wide
    WHERE "PARTICIPANT|TARGET_SERVICE_ID" IS NOT NULL
    ORDER BY target_id
    """,
)
def q24_fhir_patient_resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Patient builder (patient.py parity: meta tag, double
    identifier, US-Core race+ethnicity extensions with OMB codings, gender
    recode, ignoreNullFields JSON) over the transform output."""
    result = transform_study(_endpoint_tables(spark, sf_dir))
    wide = result.tables["default"]
    return patient_builder.build(wide).select("target_id", "resource_json").orderBy("target_id")


def _diagnosis_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Endpoint tables with a fan-out child: diagnoses ← orders (≈10 per
    participant), exercising sentinel skips and swallowed casts."""
    orders = load_table(spark, sf_dir, "orders")
    diagnoses = orders.select(
        F.concat(F.lit("DG_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.col("o_orderpriority").alias("source_text_diagnosis"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("not-a-number"))
        .otherwise((F.col("o_orderkey") % 3650).cast("string"))
        .alias("age_at_event_days"),
        F.when(F.col("o_orderstatus") == "O", F.lit("MONDO:0005072"))
        .when(F.col("o_orderstatus") == "P", F.lit("Not Reported"))  # sentinel → no coding
        .alias("mondo_id_diagnosis"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["diagnoses"] = diagnoses
    return tables


@register(
    "q25_fhir_disease_narrow",
    oracle=_ORACLE_ENDPOINTS.rstrip()
    + """
    , diagnoses AS (
      SELECT 'DG_' || o_orderkey AS dg_id,
             'PT_' || o_custkey AS pt_id,
             o_orderpriority AS name,
             CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-number'
                  ELSE (o_orderkey % 3650)::VARCHAR END AS age_raw,
             CASE WHEN o_orderstatus = 'O' THEN 'MONDO:0005072'
                  WHEN o_orderstatus = 'P' THEN 'Not Reported' END AS mondo_raw
      FROM orders)
    SELECT md5('disease' || '|' || dg_id) AS target_id,
           'Patient/' || md5('patient' || '|' || pt_id) AS subject_ref,
           name,
           CASE WHEN mondo_raw IS NOT NULL AND mondo_raw NOT IN
                ('Cannot Collect','No Match','Not Able to Provide','Not Available',
                 'Not Applicable','Not Reported','Other','Unknown')
                THEN mondo_raw END AS mondo_code,
           TRY_CAST(age_raw AS INTEGER) AS age_days
    FROM diagnoses
    ORDER BY target_id
    """,
)
def q25_fhir_disease_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Disease builder over the NARROW path (per-entity minimal
    joins, plans/narrow.py) — gates sentinel-skipped codings, swallowed age
    casts, and inline Patient references, extracted back out of the emitted
    resource JSON."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_diagnosis_tables(spark, sf_dir), only={"Disease"})
    disease = out["Disease"]
    j = F.col("resource_json")
    return disease.select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.code.text").alias("name"),
        F.get_json_object(j, "$.code.coding[0].code").alias("mondo_code"),
        F.get_json_object(
            j, "$._recordedDate.extension[0].extension[2].valueDuration.value"
        ).cast("int").alias("age_days"),
    ).orderBy("target_id")


@register(
    "q26_fhir_family_groups",
    oracle=_ORACLE_ENDPOINTS.rstrip()
    + """
    SELECT md5('family' || '|' || 'FM_' || c_nationkey) AS target_id,
           'person' AS group_type,
           COUNT(DISTINCT c_custkey) AS quantity,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(LIST_SORT(LIST(DISTINCT 'PT_' || c_custkey)),
                            p -> 'Patient/' || md5('patient' || '|' || p)), ',') AS member_refs
    FROM customer
    GROUP BY c_nationkey
    ORDER BY target_id
    """,
)
def q26_fhir_family_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Family (Group) builder — the A1 group-and-collect
    aggregation (family.py:28-47): participants grouped into family Groups
    with sorted member Patient references, run on the narrow path and
    extracted back out of the emitted JSON."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    tables = _endpoint_tables(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    tables["families"] = nation.select(
        F.concat(F.lit("FM_"), F.col("n_nationkey")).alias("kf_id"),
        F.concat(F.lit("fam-"), F.col("n_nationkey")).alias("external_id"),
        F.lit("True").alias("visible"),
    )
    # participants gain a family: their nation
    tables["participants"] = tables["participants"].drop("family_id").join(
        customer.select(
            F.concat(F.lit("PT_"), F.col("c_custkey")).alias("kf_id"),
            F.concat(F.lit("FM_"), F.col("c_nationkey")).alias("family_id"),
        ),
        on=["kf_id"],
    )
    out = build_resources_narrow(tables, only={"Family"})
    j = F.col("resource_json")
    members = F.transform(
        F.from_json(
            F.get_json_object(j, "$.member"),
            "array<struct<entity:struct<reference:string>,inactive:boolean>>",
        ),
        lambda m: m.getField("entity").getField("reference"),
    )
    return out["Family"].select(
        "target_id",
        F.get_json_object(j, "$.type").alias("group_type"),
        F.get_json_object(j, "$.quantity").cast("long").alias("quantity"),
        F.array_join(members, ",").alias("member_refs"),
    ).orderBy("target_id")


@register(
    "q30_fhir_vital_status_json",
    oracle=_ORACLE_ENDPOINTS.rstrip()
    + """
    , outcomes AS (
      SELECT 'OC_' || o_orderkey AS oc_id,
             'PT_' || o_custkey AS pt_id,
             CASE WHEN o_orderkey % 2 = 0 THEN 'Alive' ELSE 'Deceased' END AS vital_status,
             CASE WHEN o_orderkey % 5 = 0 THEN 'bad-age'
                  ELSE (o_orderkey % 30000)::VARCHAR END AS age_raw,
             (SELECT "STUDY|TARGET_SERVICE_ID" FROM participants p
              WHERE p."PARTICIPANT|TARGET_SERVICE_ID" = 'PT_' || o_custkey) AS study_id
      FROM orders)
    SELECT md5('vital_status' || '|' || oc_id) AS target_id,
      replace(replace(replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'Observation',
          id := md5('vital_status' || '|' || oc_id),
          meta := struct_pack(
            profile := ['https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/vital-status'],
            tag := [struct_pack(code := study_id)]),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/outcomes/'::VARCHAR,
            value := oc_id)],
          status := 'final',
          code := struct_pack(
            coding := [struct_pack(system := 'http://snomed.info/sct',
                                   code := '263493007', display := 'Clinical status (attribute)')],
            text := 'Clinical status'),
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id)),
          "_effectiveDateTime" := CASE WHEN TRY_CAST(age_raw AS INTEGER) IS NOT NULL THEN
            struct_pack(extension := [struct_pack(
              extension := [
                struct_pack(url := 'event',
                  valueCodeableConcept := struct_pack(coding := [struct_pack(
                    system := 'http://snomed.info/sct', code := '3950001', display := 'Birth')]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'relationship',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := 'after'::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'offset',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := struct_pack(value := TRY_CAST(age_raw AS INTEGER),
                                               unit := 'day', system := 'http://unitsofmeasure.org', code := 'd'))],
              url := 'http://hl7.org/fhir/StructureDefinition/relative-date')])
          END,
          valueCodeableConcept := struct_pack(
            coding := [CASE WHEN vital_status = 'Alive'
              THEN struct_pack(system := 'http://snomed.info/sct', code := '438949009', display := 'Alive (finding)')
              ELSE struct_pack(system := 'http://snomed.info/sct', code := '419099009', display := 'Dead (finding)')
            END],
            text := vital_status)
        )),
        ',"_effectiveDateTime":null', ''),
        ',"valueDuration":null', ''),
        ',"valueCode":null', ''),
        '"valueCodeableConcept":null,', ''),
        '"valueString":null,', '') AS resource_json
    FROM outcomes
    ORDER BY target_id
    """,
)
def q30_fhir_vital_status_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual VitalStatus builder emitting byte-identical resource JSON —
    full parity for the C6 birth-relative-date extension template
    (vital_status.py:83-117), swallowed casts included."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    outcomes = orders.select(
        F.concat(F.lit("OC_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(F.col("o_orderkey") % 2 == 0, "Alive").otherwise("Deceased").alias("vital_status"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("bad-age"))
        .otherwise((F.col("o_orderkey") % 30000).cast("string"))
        .alias("age_at_event_days"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["outcomes"] = outcomes
    out = build_resources_narrow(tables, only={"VitalStatus"})
    return out["VitalStatus"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q27_fhir_specimen_narrow",
    oracle=_ORACLE_ENDPOINTS.rstrip()
    + """
    , biospecimens AS (
      SELECT 'BS_' || o_orderkey AS bs_id,
             'PT_' || o_custkey AS pt_id,
             CASE o_orderkey % 4 WHEN 0 THEN 'Blood' WHEN 1 THEN 'Saliva'
               WHEN 2 THEN 'Tissue FFPE' ELSE 'Mystery Goo' END AS composition,
             CASE o_orderkey % 3 WHEN 0 THEN 'DNA' WHEN 1 THEN 'RNA' ELSE 'Other' END AS analyte,
             CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-volume'
                  ELSE (o_totalprice)::VARCHAR END AS volume_raw,
             CASE o_orderkey % 3 WHEN 0 THEN 'UBERON:0002101'
               WHEN 1 THEN 'EFO:0000001' ELSE 'XYZ:9' END AS uberon_raw
      FROM orders)
    , coded AS (
      SELECT *,
             CASE composition WHEN 'Blood' THEN 'C17610' WHEN 'Saliva' THEN 'C174119'
               WHEN 'Tissue FFPE' THEN 'C172265' END AS comp_code,
             CASE analyte WHEN 'DNA' THEN 'OBI:0001051' WHEN 'RNA' THEN 'OBI:0000880' END AS an_code
      FROM biospecimens)
    SELECT md5('specimen' || '|' || bs_id) AS target_id,
           'Patient/' || md5('patient' || '|' || pt_id) AS subject_ref,
           -- type.coding is [composition?, analyte?] compacted: position 0/1
           -- depend on which lookups hit (specimen.py:542-545)
           COALESCE(comp_code, an_code) AS composition_code,
           CASE WHEN comp_code IS NOT NULL THEN an_code END AS analyte_code,
           ROUND(TRY_CAST(volume_raw AS DOUBLE), 2) AS volume_ul,
           CASE WHEN uberon_raw LIKE 'UBERON:%' THEN 'http://purl.obolibrary.org/obo/uberon.owl'
                WHEN uberon_raw LIKE 'EFO:%' THEN 'http://www.ebi.ac.uk/efo/efo.owl'
           END AS uberon_system
    FROM coded
    ORDER BY target_id
    """,
)
def q27_fhir_specimen_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Specimen builder on the narrow path — gates the ~70-entry
    composition map, the analyte map, float-volume swallowed casts, and the
    UBERON:/EFO: prefix-dispatched body-site coding (specimen.py:16-435,
    589-629), extracted from the emitted JSON."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(F.col("o_orderkey") % 4 == 0, "Blood")
        .when(F.col("o_orderkey") % 4 == 1, "Saliva")
        .when(F.col("o_orderkey") % 4 == 2, "Tissue FFPE")
        .otherwise("Mystery Goo")
        .alias("composition"),
        F.when(F.col("o_orderkey") % 3 == 0, "DNA")
        .when(F.col("o_orderkey") % 3 == 1, "RNA")
        .otherwise("Other")
        .alias("analyte_type"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("not-a-volume"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("volume_ul"),
        F.when(F.col("o_orderkey") % 3 == 0, "UBERON:0002101")
        .when(F.col("o_orderkey") % 3 == 1, "EFO:0000001")
        .otherwise("XYZ:9")
        .alias("uberon_id_anatomical_site"),
        F.lit("SC_DGDDMBVV").alias("sequencing_center_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["biospecimens"] = biospecimens
    out = build_resources_narrow(tables, only={"Specimen"})
    j = F.col("resource_json")
    return out["Specimen"].select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.type.coding[0].code").alias("composition_code"),
        F.get_json_object(j, "$.type.coding[1].code").alias("analyte_code"),
        F.round(
            F.get_json_object(j, "$.collection.quantity.value").cast("double"), 2
        ).alias("volume_ul"),
        F.get_json_object(j, "$.collection.bodySite.coding[0].system").alias("uberon_system"),
    ).orderBy("target_id")


def _drs_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Endpoint tables for the DRSDocumentReference gate: biospecimens from
    orders, genomic files from part, links from lineitem — a real
    many-to-many. Participants are pinned to ONE study so every genomic file
    groups under a single (study, file) key: ``finalize`` dedupes by
    target_id, and a file spanning studies would make the surviving row
    nondeterministic (unoracleable)."""
    region = load_table(spark, sf_dir, "region")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")

    studies = region.select(
        F.concat(F.lit("SD_"), F.col("r_regionkey")).alias("kf_id"),
        F.col("r_name").alias("name"),
        F.lit("True").alias("visible"),
    )
    participants = customer.select(
        F.concat(F.lit("PT_"), F.col("c_custkey")).alias("kf_id"),
        F.lit("SD_0").alias("study_id"),
        F.lit("True").alias("visible"),
    )
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.lit("True").alias("visible"),
    )
    genomic_files = part.select(
        F.concat(F.lit("GF_"), F.col("p_partkey")).alias("kf_id"),
        F.when(F.col("p_partkey") % 4 == 0, "Aligned Reads")
        .when(F.col("p_partkey") % 4 == 1, "gVCF")
        .when(F.col("p_partkey") % 4 == 2, "Simple Nucleotide Variations")
        .otherwise("Unmapped Kind")
        .alias("data_type"),
        F.when(F.col("p_partkey") % 4 == 0, "cram")
        .when(F.col("p_partkey") % 4 == 1, "gvcf")
        .when(F.col("p_partkey") % 4 == 2, "tbi")
        .otherwise("txt")
        .alias("file_format"),
        F.when(F.col("p_partkey") % 3 == 0, "True")
        .when(F.col("p_partkey") % 3 == 1, "False")
        .alias("controlled_access"),
        F.concat(F.lit("did-"), F.col("p_partkey")).alias("latest_did"),
        F.lit("True").alias("visible"),
    )
    links = lineitem.select(
        F.concat(F.lit("BGF_"), F.col("l_orderkey"), F.lit("_"), F.col("l_partkey")).alias("kf_id"),
        F.concat(F.lit("BS_"), F.col("l_orderkey")).alias("biospecimen_id"),
        F.concat(F.lit("GF_"), F.col("l_partkey")).alias("genomic_file_id"),
        F.lit("True").alias("visible"),
    ).dropDuplicates(["biospecimen_id", "genomic_file_id"])
    return {
        "studies": studies,
        "participants": participants,
        "biospecimens": biospecimens,
        "genomic-files": genomic_files,
        "biospecimen-genomic-files": links,
    }


@register(
    "q31_fhir_drs_document_reference",
    oracle="""
    WITH links AS (
      SELECT DISTINCT 'BS_' || l_orderkey AS bs, 'GF_' || l_partkey AS gf,
             'PT_' || o_custkey AS pt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), gfs AS (
      SELECT 'GF_' || p_partkey AS gf,
             CASE p_partkey % 4 WHEN 0 THEN 'Aligned Reads' WHEN 1 THEN 'gVCF'
               WHEN 2 THEN 'Simple Nucleotide Variations' ELSE 'Unmapped Kind' END AS data_type0,
             CASE p_partkey % 4 WHEN 0 THEN 'cram' WHEN 1 THEN 'gvcf'
               WHEN 2 THEN 'tbi' ELSE 'txt' END AS fmt,
             CASE p_partkey % 3 WHEN 0 THEN 'True' WHEN 1 THEN 'False' END AS ca,
             'did-' || p_partkey AS did
      FROM part
    ), agg AS (
      SELECT gf, list_sort(list(DISTINCT pt)) AS pts, list_sort(list(DISTINCT bs)) AS bss
      FROM links GROUP BY gf
    ), rec AS (
      SELECT g.gf, g.fmt, g.ca, g.did, a.pts, a.bss,
             CASE WHEN g.data_type0 = 'Simple Nucleotide Variations' AND g.fmt = 'tbi'
                  THEN g.data_type0 || ' Index' ELSE g.data_type0 END AS dt
      FROM gfs g LEFT JOIN agg a USING (gf)
    )
    SELECT md5('drs_document_reference' || '|' || gf) AS target_id,
           CASE WHEN len(pts) = 1
                THEN 'Patient/' || md5('patient' || '|' || pts[1]) END AS subject_ref,
           -- the imputed ' Index' type is NOT in the reference's coding map
           -- (drs_document_reference.py:31-107): text-only concept
           CASE dt WHEN 'Aligned Reads' THEN 'Aligned-Reads' WHEN 'gVCF' THEN 'gVCF'
           END AS dt_code,
           dt AS dt_text,
           CASE ca WHEN 'True' THEN 'controlled' WHEN 'False' THEN 'registered' END AS access_code,
           CASE ca WHEN 'True' THEN 'true' WHEN 'False' THEN 'false' END AS access_text,
           fmt AS fmt_display,
           'drs://data.kidsfirstdrc.org/' || did AS url,
           CASE WHEN dt NOT IN ('Aligned Reads Index','gVCF Index',
                                'Simple Nucleotide Variations Index',
                                'Somatic Structural Variations Index','Variant Calls Index')
                 AND len(bss) > 0
                THEN array_to_string(list_transform(bss,
                       b -> 'Specimen/' || md5('specimen' || '|' || b)), ',') END AS related_refs
    FROM rec
    ORDER BY target_id
    """,
)
def q31_fhir_drs_document_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual DRSDocumentReference builder on the narrow path — gates the
    A2 dynamic-key aggregation (collect-distinct participants/biospecimens),
    the single-subject gate, the tbi ' Index' data-type imputation, the
    securityLabel access coding, attachment URL assembly, and the index-type
    context.related exclusion (drs_document_reference.py:170-406)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_drs_tables(spark, sf_dir), only={"DRSDocumentReference"})
    j = F.col("resource_json")
    related = F.transform(
        F.from_json(
            F.get_json_object(j, "$.context.related"), "array<struct<reference:string>>"
        ),
        lambda r: r.getField("reference"),
    )
    return out["DRSDocumentReference"].select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.type.coding[0].code").alias("dt_code"),
        F.get_json_object(j, "$.type.text").alias("dt_text"),
        F.get_json_object(j, "$.securityLabel[0].coding[0].code").alias("access_code"),
        F.get_json_object(j, "$.securityLabel[0].text").alias("access_text"),
        F.get_json_object(j, "$.content[0].format.display").alias("fmt_display"),
        F.get_json_object(j, "$.content[0].attachment.url").alias("url"),
        F.array_join(related, ",").alias("related_refs"),
    ).orderBy("target_id")


@register(
    "q32_fhir_family_relationship",
    oracle="""
    WITH frs AS (
      SELECT 'FR_' || o_orderkey AS fr_id,
             'PT_' || o_custkey AS p1,
             'PX_' || o_custkey AS p2,
             CASE o_orderkey % 6 WHEN 0 THEN 'Father' WHEN 1 THEN 'Mother'
               WHEN 2 THEN 'Brother' WHEN 3 THEN 'Aunt'
               WHEN 4 THEN 'Alien Buddy' END AS relation
      FROM orders)
    SELECT md5('family_relationship' || '|' || fr_id) AS target_id,
           'Patient/' || md5('patient' || '|' || p1) AS subject_ref,
           'Patient/' || md5('patient' || '|' || p2) AS focus_ref,
           relation AS rel_text,
           CASE relation WHEN 'Father' THEN 'FTH' WHEN 'Mother' THEN 'MTH'
             WHEN 'Brother' THEN 'BRO' WHEN 'Aunt' THEN 'AUNT' END AS rel_code
    FROM frs
    ORDER BY target_id
    """,
)
def q32_fhir_family_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual FamilyRelationship builder — the separate (non-wide) FR
    table, double Patient reference resolution, and the ~60-entry
    relationship→v3-RoleCode recode incl. unmapped (text-only concept) and
    null (absent concept) relations (family_relationship.py:16-307,376-391)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    frs = orders.select(
        F.concat(F.lit("FR_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant1_id"),
        F.concat(F.lit("PX_"), F.col("o_custkey")).alias("participant2_id"),
        F.when(F.col("o_orderkey") % 6 == 0, "Father")
        .when(F.col("o_orderkey") % 6 == 1, "Mother")
        .when(F.col("o_orderkey") % 6 == 2, "Brother")
        .when(F.col("o_orderkey") % 6 == 3, "Aunt")
        .when(F.col("o_orderkey") % 6 == 4, "Alien Buddy")
        .alias("participant1_to_participant2_relation"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["family-relationships"] = frs
    out = build_resources_narrow(tables, only={"FamilyRelationship"})
    j = F.col("resource_json")
    return out["FamilyRelationship"].select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.focus[0].reference").alias("focus_ref"),
        F.get_json_object(j, "$.valueCodeableConcept.text").alias("rel_text"),
        F.get_json_object(j, "$.valueCodeableConcept.coding[0].code").alias("rel_code"),
    ).orderBy("target_id")


@register(
    "q33_fhir_research_study",
    oracle="""
    WITH studies AS (
      SELECT r_regionkey AS r, r_name AS name,
             CASE WHEN r_regionkey % 2 = 0
                  THEN 'phs00' || r_regionkey || '.a.b' ELSE 'reg-' || r_regionkey END AS ext_id,
             'v' || r_regionkey AS version,
             CASE r_regionkey % 5 WHEN 0 THEN 'CANCER' WHEN 1 THEN 'BIRTHDEFECT'
               WHEN 2 THEN 'CANCERANDBIRTHDEFECT' WHEN 3 THEN 'COVID19'
               ELSE 'MYSTERY' END AS domain,
             CASE WHEN r_regionkey % 2 = 0 THEN 'KF' END AS program,
             'SC' || r_regionkey AS short_code
      FROM region)
    SELECT md5('research_study' || '|' || 'SD_' || r) AS target_id,
           name AS title,
           CASE WHEN ext_id LIKE 'phs%'
                THEN 'phs00' || r || '.v' || r END AS phs_acc,
           domain AS category_text,
           CASE domain WHEN 'CANCER' THEN '86049000' WHEN 'BIRTHDEFECT' THEN '276720006'
             WHEN 'CANCERANDBIRTHDEFECT' THEN '86049000' WHEN 'COVID19' THEN '840539006'
           END AS cat_code0,
           CASE domain WHEN 'CANCERANDBIRTHDEFECT' THEN '276720006' END AS cat_code1,
           COALESCE(program, short_code) AS kw0_code,
           CASE WHEN program IS NOT NULL THEN short_code END AS kw1_code
    FROM studies
    ORDER BY target_id
    """,
)
def q33_fhir_research_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual ResearchStudy builder — dbGaP accession rebuild for
    phs-prefixed IDs (F3 prefix predicate + C2 split/join), the composite
    CANCERANDBIRTHDEFECT double coding, unmapped-domain text-only category,
    and program/short-code keyword compaction (research_study.py:14-30,76-119)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    region = load_table(spark, sf_dir, "region")
    studies = region.select(
        F.concat(F.lit("SD_"), F.col("r_regionkey")).alias("kf_id"),
        F.col("r_name").alias("name"),
        F.when(
            F.col("r_regionkey") % 2 == 0,
            F.concat(F.lit("phs00"), F.col("r_regionkey"), F.lit(".a.b")),
        )
        .otherwise(F.concat(F.lit("reg-"), F.col("r_regionkey")))
        .alias("external_id"),
        F.concat(F.lit("v"), F.col("r_regionkey")).alias("version"),
        F.when(F.col("r_regionkey") % 5 == 0, "CANCER")
        .when(F.col("r_regionkey") % 5 == 1, "BIRTHDEFECT")
        .when(F.col("r_regionkey") % 5 == 2, "CANCERANDBIRTHDEFECT")
        .when(F.col("r_regionkey") % 5 == 3, "COVID19")
        .otherwise("MYSTERY")
        .alias("domain"),
        F.when(F.col("r_regionkey") % 2 == 0, "KF").alias("program"),
        F.concat(F.lit("SC"), F.col("r_regionkey")).alias("short_code"),
        F.lit("True").alias("visible"),
    )
    out = build_resources_narrow({"studies": studies}, only={"ResearchStudy"})
    j = F.col("resource_json")
    return out["ResearchStudy"].select(
        "target_id",
        F.get_json_object(j, "$.title").alias("title"),
        F.get_json_object(j, "$.identifier[1].value").alias("phs_acc"),
        F.get_json_object(j, "$.category[0].text").alias("category_text"),
        F.get_json_object(j, "$.category[0].coding[0].code").alias("cat_code0"),
        F.get_json_object(j, "$.category[0].coding[1].code").alias("cat_code1"),
        F.get_json_object(j, "$.keyword[0].coding[0].code").alias("kw0_code"),
        F.get_json_object(j, "$.keyword[1].coding[0].code").alias("kw1_code"),
    ).orderBy("target_id")


@register(
    "q34_fhir_proband_status",
    oracle="""
    WITH participants AS (
      SELECT 'PT_' || c_custkey AS pt_id,
             CASE WHEN c_custkey % 2 = 0 THEN 'True' ELSE 'False' END AS proband
      FROM customer)
    SELECT md5('proband_status' || '|' || 'http://snomed.info/sct|85900004' || '|' ||
               'Patient/' || md5('patient' || '|' || pt_id)) AS target_id,
           'Patient/' || md5('patient' || '|' || pt_id) AS subject_ref,
           CASE proband WHEN 'True' THEN 'Y' ELSE 'N' END AS value_code,
           proband AS value_text,
           'true' AS identifier_value
    FROM participants
    ORDER BY target_id
    """,
)
def q34_fhir_proband_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual ProbandStatus builder — the composite code+subject surrogate
    key (proband_status.py:36-45), the F7 domain assert as an isin filter, the
    Y/N value coding (C10), and the reproduced ``bool("False") is True``
    identifier bug (proband_status.py:63)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_endpoint_tables(spark, sf_dir), only={"ProbandStatus"})
    j = F.col("resource_json")
    return out["ProbandStatus"].select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.valueCodeableConcept.coding[0].code").alias("value_code"),
        F.get_json_object(j, "$.valueCodeableConcept.text").alias("value_text"),
        F.get_json_object(j, "$.identifier[0].value").alias("identifier_value"),
    ).orderBy("target_id")


@register(
    "q35_fhir_histopathology",
    oracle="""
    WITH base AS (
      SELECT 'BD_' || o_orderkey AS bd_id,
             'DG_' || o_orderkey AS dg_id,
             'BS_' || o_orderkey AS bs_id,
             'PT_' || o_custkey AS pt_id,
             CASE o_orderkey % 4 WHEN 0 THEN 'Primary Tumor' WHEN 1 THEN 'Metastatic'
               WHEN 2 THEN 'Not Reported' END AS descriptor
      FROM orders)
    SELECT md5('histopathology' || '|' || bd_id) AS target_id,
           'Patient/' || md5('patient' || '|' || pt_id) AS subject_ref,
           'Condition/' || md5('disease' || '|' || dg_id) AS focus_ref,
           'Specimen/' || md5('specimen' || '|' || bs_id) AS specimen_ref,
           CASE WHEN descriptor IS NOT NULL AND descriptor NOT IN
                ('N/A','Not Applicable','Not Available','Not Reported','Unavailable','Unknown')
                THEN descriptor END AS vcc_text
    FROM base
    ORDER BY target_id
    """,
)
def q35_fhir_histopathology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual Histopathology builder — the 3-way Patient/Condition/
    Specimen reference resolution, the biospecimen-diagnosis link join, and
    the variant missing-data sentinel set on the tumor descriptor
    (histopathology.py:19-25,91-117)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    diagnoses = orders.select(
        F.concat(F.lit("DG_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.lit("True").alias("visible"),
    )
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(F.col("o_orderkey") % 4 == 0, "Primary Tumor")
        .when(F.col("o_orderkey") % 4 == 1, "Metastatic")
        .when(F.col("o_orderkey") % 4 == 2, "Not Reported")
        .alias("source_text_tumor_descriptor"),
        F.lit("True").alias("visible"),
    )
    bds = orders.select(
        F.concat(F.lit("BD_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("DG_"), F.col("o_orderkey")).alias("diagnosis_id"),
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("biospecimen_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["diagnoses"] = diagnoses
    tables["biospecimens"] = biospecimens
    tables["biospecimen-diagnoses"] = bds
    out = build_resources_narrow(tables, only={"Histopathology"})
    j = F.col("resource_json")
    return out["Histopathology"].select(
        "target_id",
        F.get_json_object(j, "$.subject.reference").alias("subject_ref"),
        F.get_json_object(j, "$.focus[0].reference").alias("focus_ref"),
        F.get_json_object(j, "$.specimen.reference").alias("specimen_ref"),
        F.get_json_object(j, "$.valueCodeableConcept.text").alias("vcc_text"),
    ).orderBy("target_id")


_PT_REF = "'Patient/' || md5('patient' || '|' || pt_id)"


@register(
    "q74_fhir_proband_status_json",
    oracle=f"""
    WITH participants AS (
      SELECT 'PT_' || c_custkey AS pt_id,
             'SD_' || n_regionkey AS study_id,
             CASE WHEN c_custkey % 2 = 0 THEN 'True' ELSE 'False' END AS proband
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    SELECT md5('proband_status' || '|' || 'http://snomed.info/sct|85900004' || '|' ||
               {_PT_REF}) AS target_id,
      to_json(struct_pack(
        resourceType := 'Observation',
        id := md5('proband_status' || '|' || 'http://snomed.info/sct|85900004' || '|' ||
                  {_PT_REF}),
        meta := struct_pack(
          profile := ['http://hl7.org/fhir/StructureDefinition/Observation'],
          tag := [struct_pack(code := study_id)]),
        identifier := [struct_pack(
          use := 'official',
          system := 'https://kf-api-dataservice.kidsfirstdrc.org/participants?is_proband=',
          value := true)],
        status := 'final',
        code := struct_pack(
          coding := [struct_pack(system := 'http://snomed.info/sct', code := '85900004',
                                 display := 'Proband (finding)')],
          text := 'Proband status'),
        subject := struct_pack(reference := {_PT_REF}),
        valueCodeableConcept := struct_pack(
          coding := [CASE WHEN proband = 'True'
            THEN struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v2-0136',
                             code := 'Y', display := 'Yes')
            ELSE struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v2-0136',
                             code := 'N', display := 'No') END],
          text := proband)
      )) AS resource_json
    FROM participants
    ORDER BY target_id
    """,
)
def q74_fhir_proband_status_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProbandStatus emitting byte-identical resource JSON (third full-JSON
    builder gate after q24/q30): composite code+subject surrogate id, the
    reproduced ``bool("False") is True`` identifier (JSON literal ``true``
    for both probands and non-probands), and the Y/N SNOMED value coding —
    every byte oracled, not just extracted fields."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_endpoint_tables(spark, sf_dir), only={"ProbandStatus"})
    return out["ProbandStatus"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q75_fhir_family_json",
    oracle="""
    WITH members AS (
      SELECT 'FM_' || c_nationkey AS fam_id,
             'SD_' || n_regionkey AS study_id,
             'fam-' || c_nationkey AS external_id,
             list_sort(list(DISTINCT 'PT_' || c_custkey)) AS pts
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_nationkey, n_regionkey)
    SELECT md5('family' || '|' || fam_id) AS target_id,
      replace(
        to_json(struct_pack(
          resourceType := 'Group',
          id := md5('family' || '|' || fam_id),
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/Group'],
            tag := [struct_pack(code := study_id)]),
          identifier := [
            struct_pack(use := 'official',
                        system := 'https://kf-api-dataservice.kidsfirstdrc.org/families/'::VARCHAR,
                        value := fam_id),
            struct_pack(use := 'secondary', system := NULL::VARCHAR, value := external_id)],
          type := 'person',
          actual := true,
          code := struct_pack(coding := [struct_pack(
            system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode',
            code := 'FAMMEMB', display := 'family member')]),
          quantity := len(pts),
          member := list_transform(pts, p -> struct_pack(
            entity := struct_pack(reference := 'Patient/' || md5('patient' || '|' || p)),
            inactive := false))
        )),
        '"system":null,', '') AS resource_json
    FROM members
    ORDER BY target_id
    """,
)
def q75_fhir_family_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family (Group) emitting byte-identical resource JSON (fourth
    full-JSON builder gate): the A1 group-and-collect with sorted member
    references, double identifier with null-system stripping, species→type
    recode, and the size-gated quantity/member pair — the whole aggregated
    resource oracled byte-for-byte, extending q26's field-extraction gate."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    tables = _endpoint_tables(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    tables["families"] = nation.select(
        F.concat(F.lit("FM_"), F.col("n_nationkey")).alias("kf_id"),
        F.concat(F.lit("fam-"), F.col("n_nationkey")).alias("external_id"),
        F.lit("True").alias("visible"),
    )
    tables["participants"] = tables["participants"].join(
        customer.select(
            F.concat(F.lit("PT_"), F.col("c_custkey")).alias("kf_id"),
            F.concat(F.lit("FM_"), F.col("c_nationkey")).alias("family_id"),
        ),
        on=["kf_id"],
    )
    out = build_resources_narrow(tables, only={"Family"})
    return out["Family"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q85_fhir_full_pipeline",
    oracle="""
    SELECT * FROM (
      SELECT 'Disease' AS resource_type,
             (SELECT COUNT(*) FROM customer) AS n,
             (SELECT COUNT(*) FROM customer) AS n_ids
      UNION ALL SELECT 'DRSDocumentReference',
             (SELECT COUNT(DISTINCT c_custkey % 500) FROM customer),
             (SELECT COUNT(DISTINCT c_custkey % 500) FROM customer)
      UNION ALL SELECT 'Family',
             (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
             (SELECT COUNT(DISTINCT c_nationkey) FROM customer)
      UNION ALL SELECT 'FamilyRelationship',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'Histopathology',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'Organization',
             (SELECT COUNT(*) FROM supplier), (SELECT COUNT(*) FROM supplier)
      UNION ALL SELECT 'Patient',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'Phenotype',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'Practitioner',
             (SELECT COUNT(*) FROM supplier), (SELECT COUNT(*) FROM supplier)
      UNION ALL SELECT 'PractitionerRole',
             (SELECT COUNT(*) FROM supplier), (SELECT COUNT(*) FROM supplier)
      UNION ALL SELECT 'ProbandStatus',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'ResearchStudy',
             (SELECT COUNT(*) FROM region), (SELECT COUNT(*) FROM region)
      UNION ALL SELECT 'ResearchSubject',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'SequencingCenter', 3, 3
      UNION ALL SELECT 'Specimen',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
      UNION ALL SELECT 'VitalStatus',
             (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM customer)
    ) ORDER BY resource_type
    """,
)


def q85_fhir_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE reference pipeline in one gate: a kitchen-sink study with
    all 14 endpoint tables present runs ``etl.run_pipeline`` — the WIDE
    full-outer cascade (J1-J12), concept padding, and every one of the 16
    builders in the fixed dependency order — and the gate checks one row
    per resource type: emitted count + distinct target-id count (equal ⇔
    finalize's dedup found no surrogate-id collisions). Entities are keyed
    1:1 per participant so the wide fan-out stays linear (the combinatorial
    multi-child explosion is the documented reason the narrow path exists;
    this gate proves the wide ORCHESTRATION, the per-builder bytes are
    q24/q30/q74-q84). Construction is memoized through
    ``etl.run_pipeline(memo_key=...)`` (r06: the memo moved from this gate
    into the product API so every caller gets the resident-driver steady
    state): first call per (session, data fingerprint) pays full
    construction — the cold run, reported separately by bench.py —
    subsequent calls re-execute only the distributed work (fused scan,
    dedupe, aggregate) against the live checkpoint. The correctness gate is
    valid either way (same plan cold or warm); eviction + block release
    live in etl.py where all memo policy now resides."""
    from kf_task_fhir_etl_spark.catalog import cached_table, content_fingerprint
    from kf_task_fhir_etl_spark.etl import memoized_pipeline, run_pipeline

    fingerprint = content_fingerprint(sf_dir, ["customer", "supplier", "nation", "region"])
    obs_seq = next(_MEMO_OBS_SEQ)  # observation ticket, taken WITH the fingerprint
    # warm path: a stat-only probe BEFORE any endpoint-table construction —
    # run_pipeline's own hit check sits after the caller has already built
    # ~15 table plans it would never read (r06 review)
    hit = memoized_pipeline(spark, (f"q85:{sf_dir}", fingerprint), single_pass=True)
    if hit is not None:
        return _q85_counts(hit)

    customer = cached_table(spark, sf_dir, "customer")
    supplier = cached_table(spark, sf_dir, "supplier")
    c = F.col("c_custkey")
    s = F.col("s_suppkey")
    tables = _endpoint_tables(spark, sf_dir)
    tables["investigators"] = supplier.select(
        F.concat(F.lit("IV_"), s).alias("kf_id"),
        F.concat(F.lit("inv-"), s).alias("external_id"),
        F.col("s_name").alias("name"),
        F.lit("Inst").alias("institution"),
        F.lit("True").alias("visible"),
    )
    tables["families"] = cached_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("FM_"), F.col("n_nationkey")).alias("kf_id"),
        F.concat(F.lit("fam-"), F.col("n_nationkey")).alias("external_id"),
        F.lit("True").alias("visible"),
    )
    tables["participants"] = tables["participants"].join(
        customer.select(
            F.concat(F.lit("PT_"), c).alias("kf_id"),
            F.concat(F.lit("FM_"), F.col("c_nationkey")).alias("family_id"),
        ),
        on=["kf_id"],
    )
    tables["family-relationships"] = customer.select(
        F.concat(F.lit("FR_"), c).alias("kf_id"),
        F.concat(F.lit("PT_"), c).alias("participant1_id"),
        F.concat(F.lit("PX_"), c).alias("participant2_id"),
        F.lit("Mother").alias("participant1_to_participant2_relation"),
        F.lit("True").alias("visible"),
    )
    tables["diagnoses"] = customer.select(
        F.concat(F.lit("DG_"), c).alias("kf_id"),
        F.concat(F.lit("PT_"), c).alias("participant_id"),
        F.lit("dx").alias("source_text_diagnosis"),
        F.lit("100").alias("age_at_event_days"),
        F.lit("True").alias("visible"),
    )
    tables["phenotypes"] = customer.select(
        F.concat(F.lit("PH_"), c).alias("kf_id"),
        F.concat(F.lit("PT_"), c).alias("participant_id"),
        F.lit("px").alias("source_text_phenotype"),
        F.lit("Positive").alias("observed"),
        F.lit("True").alias("visible"),
    )
    tables["outcomes"] = customer.select(
        F.concat(F.lit("OC_"), c).alias("kf_id"),
        F.concat(F.lit("PT_"), c).alias("participant_id"),
        F.lit("Alive").alias("vital_status"),
        F.lit("True").alias("visible"),
    )
    tables["biospecimens"] = customer.select(
        F.concat(F.lit("BS_"), c).alias("kf_id"),
        F.concat(F.lit("PT_"), c).alias("participant_id"),
        F.lit("Blood").alias("composition"),
        F.when(c % 3 == 0, "SC_DGDDMBVV")
        .when(c % 3 == 1, "SC_X1N69WJM")
        .otherwise("SC_K52V7463")
        .alias("sequencing_center_id"),
        F.lit("True").alias("visible"),
    )
    tables["biospecimen-diagnoses"] = customer.select(
        F.concat(F.lit("BD_"), c).alias("kf_id"),
        F.concat(F.lit("DG_"), c).alias("diagnosis_id"),
        F.concat(F.lit("BS_"), c).alias("biospecimen_id"),
        F.lit("True").alias("visible"),
    )
    tables["genomic-files"] = customer.select(
        F.concat(F.lit("GF_"), (c % 500)).alias("kf_id"),
        F.lit("gVCF").alias("data_type"),
        F.lit("gvcf").alias("file_format"),
        F.lit("True").alias("visible"),
    ).dropDuplicates(["kf_id"])
    tables["biospecimen-genomic-files"] = customer.select(
        F.concat(F.lit("BGF_"), c).alias("kf_id"),
        F.concat(F.lit("BS_"), c).alias("biospecimen_id"),
        F.concat(F.lit("GF_"), (c % 500)).alias("genomic_file_id"),
        F.lit("True").alias("visible"),
    )
    # the fused one-scan build (etl.build_resources_union); per-builder
    # bytes stay gated by q74-q84, fused ≡ classic pinned in
    # tests/test_builders.py::test_single_pass_union_equals_classic_dict
    out = run_pipeline(
        tables,
        single_pass=True,
        memo_key=(f"q85:{sf_dir}", fingerprint),
        memo_seq=obs_seq,
    )
    return _q85_counts(out)


def _q85_counts(out: DataFrame) -> DataFrame:
    """q85's gate aggregation — one shared tail for the cold and memoized
    branches so the output shape cannot diverge between them."""
    return (
        out.groupBy(F.col("target").alias("resource_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("target_id").alias("n_ids"))
        .orderBy("resource_type")
    )


_RS_SNOMED = "http://snomed.info/sct"
_RS_CANCER = (
    f"struct_pack(system := '{_RS_SNOMED}', code := '86049000', "
    "display := 'Malignant neoplasm, primary (morphologic abnormality)')"
)
_RS_BIRTH = (
    f"struct_pack(system := '{_RS_SNOMED}', code := '276720006', "
    "display := 'Dysmorphism (disorder)')"
)
_RS_COVID = (
    f"struct_pack(system := '{_RS_SNOMED}', code := '840539006', "
    "display := 'Disease caused by Severe acute respiratory syndrome coronavirus 2')"
)


@register(
    "q76_fhir_research_study_json",
    oracle=f"""
    WITH studies AS (
      SELECT r_regionkey AS r, r_name AS name,
             CASE WHEN r_regionkey % 2 = 0
                  THEN 'phs00' || r_regionkey || '.a.b' ELSE 'reg-' || r_regionkey END AS ext_id,
             CASE r_regionkey % 5 WHEN 0 THEN 'CANCER' WHEN 1 THEN 'BIRTHDEFECT'
               WHEN 2 THEN 'CANCERANDBIRTHDEFECT' WHEN 3 THEN 'COVID19'
               ELSE 'MYSTERY' END AS domain,
             CASE WHEN r_regionkey % 2 = 0 THEN 'KF' END AS program,
             'SC' || r_regionkey AS short_code
      FROM region)
    SELECT md5('research_study' || '|' || 'SD_' || r) AS target_id,
      replace(
        to_json(struct_pack(
          resourceType := 'ResearchStudy',
          id := md5('research_study' || '|' || 'SD_' || r),
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/ResearchStudy'],
            tag := [struct_pack(code := 'SD_' || r)]),
          identifier := CASE WHEN ext_id LIKE 'phs%' THEN
              [struct_pack(use := 'official',
                 system := 'https://kf-api-dataservice.kidsfirstdrc.org/studies/'::VARCHAR,
                 value := 'SD_' || r),
               struct_pack(use := 'secondary',
                 system := 'https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi?study_id='::VARCHAR,
                 value := 'phs00' || r || '.v' || r)]
            ELSE
              [struct_pack(use := 'official',
                 system := 'https://kf-api-dataservice.kidsfirstdrc.org/studies/'::VARCHAR,
                 value := 'SD_' || r)] END,
          status := 'completed',
          title := name,
          category := [struct_pack(
            coding := CASE domain
              WHEN 'CANCER' THEN [{_RS_CANCER}]
              WHEN 'BIRTHDEFECT' THEN [{_RS_BIRTH}]
              WHEN 'COVID19' THEN [{_RS_COVID}]
              WHEN 'CANCERANDBIRTHDEFECT' THEN [{_RS_CANCER}, {_RS_BIRTH}]
              ELSE NULL END,
            text := domain)],
          keyword := CASE WHEN program IS NOT NULL
            THEN [struct_pack(coding := [struct_pack(code := program)]),
                  struct_pack(coding := [struct_pack(code := short_code)])]
            ELSE [struct_pack(coding := [struct_pack(code := short_code)])] END
        )),
        '"coding":null,', '') AS resource_json
    FROM studies
    ORDER BY target_id
    """,
)
def q76_fhir_research_study_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResearchStudy emitting byte-identical resource JSON (fifth full-JSON
    builder gate): dbGaP accession rebuild gated on the phs prefix, the
    composite CANCERANDBIRTHDEFECT double coding, unmapped-domain text-only
    category (null coding stripped), and program/short-code keyword
    compaction — supersedes q33's field extraction with whole-resource
    bytes."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    region = load_table(spark, sf_dir, "region")
    studies = region.select(
        F.concat(F.lit("SD_"), F.col("r_regionkey")).alias("kf_id"),
        F.col("r_name").alias("name"),
        F.when(
            F.col("r_regionkey") % 2 == 0,
            F.concat(F.lit("phs00"), F.col("r_regionkey"), F.lit(".a.b")),
        )
        .otherwise(F.concat(F.lit("reg-"), F.col("r_regionkey")))
        .alias("external_id"),
        F.concat(F.lit("v"), F.col("r_regionkey")).alias("version"),
        F.when(F.col("r_regionkey") % 5 == 0, "CANCER")
        .when(F.col("r_regionkey") % 5 == 1, "BIRTHDEFECT")
        .when(F.col("r_regionkey") % 5 == 2, "CANCERANDBIRTHDEFECT")
        .when(F.col("r_regionkey") % 5 == 3, "COVID19")
        .otherwise("MYSTERY")
        .alias("domain"),
        F.when(F.col("r_regionkey") % 2 == 0, "KF").alias("program"),
        F.concat(F.lit("SC"), F.col("r_regionkey")).alias("short_code"),
        F.lit("True").alias("visible"),
    )
    out = build_resources_narrow({"studies": studies}, only={"ResearchStudy"})
    return out["ResearchStudy"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q77_fhir_disease_json",
    oracle="""
    WITH diagnoses AS (
      SELECT 'DG_' || o_orderkey AS dg_id,
             'PT_' || o_custkey AS pt_id,
             o_orderpriority AS name,
             CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-number'
                  ELSE (o_orderkey % 3650)::VARCHAR END AS age_raw,
             CASE WHEN o_orderstatus = 'O' THEN 'MONDO:0005072'
                  WHEN o_orderstatus = 'P' THEN 'Not Reported' END AS mondo_raw,
             (SELECT 'SD_' || n_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = o_custkey) AS study_id
      FROM orders)
    SELECT md5('disease' || '|' || dg_id) AS target_id,
      replace(replace(replace(replace(replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'Condition',
          id := md5('disease' || '|' || dg_id),
          meta := struct_pack(
            profile := ['https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/disease'],
            tag := [struct_pack(code := study_id)]),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/diagnoses/'::VARCHAR,
            value := dg_id)],
          clinicalStatus := struct_pack(
            coding := [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/condition-clinical',
                                   code := 'active', display := 'Active')],
            text := 'Active'),
          category := [struct_pack(coding := [struct_pack(
            system := 'http://terminology.hl7.org/CodeSystem/condition-category',
            code := 'encounter-diagnosis', display := 'Encounter Diagnosis')])],
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id)),
          verificationStatus := NULL::JSON,
          code := struct_pack(
            coding := CASE WHEN mondo_raw IS NOT NULL AND mondo_raw NOT IN
                ('Cannot Collect','No Match','Not Able to Provide','Not Available',
                 'Not Applicable','Not Reported','Other','Unknown')
              THEN [struct_pack(system := 'http://purl.obolibrary.org/obo/mondo.owl',
                                code := mondo_raw)] END,
            text := name),
          bodySite := NULL::JSON,
          "_recordedDate" := CASE WHEN TRY_CAST(age_raw AS INTEGER) IS NOT NULL THEN
            struct_pack(extension := [struct_pack(
              extension := [
                struct_pack(url := 'event',
                  valueCodeableConcept := struct_pack(coding := [struct_pack(
                    system := 'http://snomed.info/sct', code := '3950001', display := 'Birth')]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'relationship',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := 'after'::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'offset',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := struct_pack(value := TRY_CAST(age_raw AS INTEGER),
                                               unit := 'day', system := 'http://unitsofmeasure.org', code := 'd'))],
              url := 'http://hl7.org/fhir/StructureDefinition/relative-date')])
          END
        )),
        ',"_recordedDate":null', ''),
        ',"bodySite":null', ''),
        '"verificationStatus":null,', ''),
        ',"valueDuration":null', ''),
        ',"valueCode":null', ''),
        '"valueCodeableConcept":null,', ''),
        '"coding":null,', '') AS resource_json
    FROM diagnoses
    ORDER BY target_id
    """,
)
def q77_fhir_disease_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disease (Condition) emitting byte-identical resource JSON (sixth
    full-JSON builder gate): ontology coding gated by missing-data
    sentinels, constant clinicalStatus/category blocks, and the C6
    birth-relative `_recordedDate` extension with swallowed age casts —
    whole-resource bytes extending q25's field extraction."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_diagnosis_tables(spark, sf_dir), only={"Disease"})
    return out["Disease"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q78_fhir_family_relationship_json",
    oracle="""
    WITH frs AS (
      SELECT 'FR_' || o_orderkey AS fr_id,
             'PT_' || o_custkey AS p1,
             'PX_' || o_custkey AS p2,
             CASE o_orderkey % 6 WHEN 0 THEN 'Father' WHEN 1 THEN 'Mother'
               WHEN 2 THEN 'Brother' WHEN 3 THEN 'Aunt'
               WHEN 4 THEN 'Alien Buddy' END AS relation
      FROM orders)
    SELECT md5('family_relationship' || '|' || fr_id) AS target_id,
      replace(replace(
        to_json(struct_pack(
          resourceType := 'Observation',
          id := md5('family_relationship' || '|' || fr_id),
          meta := struct_pack(
            profile := ['https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/family-relationship']),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/family-relationships/'::VARCHAR,
            value := fr_id)],
          status := 'final',
          code := struct_pack(
            coding := [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode',
                                   code := 'FAMMEMB', display := 'family member')],
            text := 'Family Relationship'),
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || p1)),
          focus := [struct_pack(reference := 'Patient/' || md5('patient' || '|' || p2))],
          valueCodeableConcept := CASE WHEN relation IS NOT NULL THEN struct_pack(
            coding := CASE relation
              WHEN 'Father' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode', code := 'FTH', display := 'father')]
              WHEN 'Mother' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode', code := 'MTH', display := 'mother')]
              WHEN 'Brother' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode', code := 'BRO', display := 'brother')]
              WHEN 'Aunt' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/v3-RoleCode', code := 'AUNT', display := 'aunt')]
              ELSE NULL END,
            text := relation) END
        )),
        ',"valueCodeableConcept":null', ''),
        '"coding":null,', '') AS resource_json
    FROM frs
    ORDER BY target_id
    """,
)
def q78_fhir_family_relationship_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FamilyRelationship emitting byte-identical resource JSON (seventh
    full-JSON builder gate): the separate (non-wide) FR table, double
    Patient reference resolution, the v3-RoleCode recode with unmapped →
    text-only and null → absent concept, and the deliberately tag-less meta
    (the reference reads a column its own rename map never produces —
    documented deviation) — whole-resource bytes extending q32."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    frs = orders.select(
        F.concat(F.lit("FR_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant1_id"),
        F.concat(F.lit("PX_"), F.col("o_custkey")).alias("participant2_id"),
        F.when(F.col("o_orderkey") % 6 == 0, "Father")
        .when(F.col("o_orderkey") % 6 == 1, "Mother")
        .when(F.col("o_orderkey") % 6 == 2, "Brother")
        .when(F.col("o_orderkey") % 6 == 3, "Aunt")
        .when(F.col("o_orderkey") % 6 == 4, "Alien Buddy")
        .alias("participant1_to_participant2_relation"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["family-relationships"] = frs
    out = build_resources_narrow(tables, only={"FamilyRelationship"})
    return out["FamilyRelationship"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q79_fhir_histopathology_json",
    oracle="""
    WITH base AS (
      SELECT 'BD_' || o_orderkey AS bd_id,
             'DG_' || o_orderkey AS dg_id,
             'BS_' || o_orderkey AS bs_id,
             'PT_' || o_custkey AS pt_id,
             CASE o_orderkey % 4 WHEN 0 THEN 'Primary Tumor' WHEN 1 THEN 'Metastatic'
               WHEN 2 THEN 'Not Reported' END AS descriptor,
             (SELECT 'SD_' || n_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = o_custkey) AS study_id
      FROM orders)
    SELECT md5('histopathology' || '|' || bd_id) AS target_id,
      replace(
        to_json(struct_pack(
          resourceType := 'Observation',
          id := md5('histopathology' || '|' || bd_id),
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/Observation'],
            tag := [struct_pack(code := study_id)]),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimen-diagnoses/'::VARCHAR,
            value := bd_id)],
          status := 'final',
          category := [struct_pack(
            coding := [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/observation-category',
                                   code := 'laboratory', display := 'Laboratory')],
            text := 'Histopathology')],
          code := struct_pack(
            coding := [struct_pack(system := 'http://snomed.info/sct',
                                   code := '250537006', display := 'Histopathology finding (finding)')],
            text := 'Histopathology'),
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id)),
          focus := [struct_pack(reference := 'Condition/' || md5('disease' || '|' || dg_id))],
          specimen := struct_pack(reference := 'Specimen/' || md5('specimen' || '|' || bs_id)),
          valueCodeableConcept := CASE WHEN descriptor IS NOT NULL AND descriptor NOT IN
              ('N/A','Not Applicable','Not Available','Not Reported','Unavailable','Unknown')
            THEN struct_pack(text := descriptor) END
        )),
        ',"valueCodeableConcept":null', '') AS resource_json
    FROM base
    ORDER BY target_id
    """,
)
def q79_fhir_histopathology_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histopathology emitting byte-identical resource JSON (eighth
    full-JSON builder gate): the 3-way Patient/Condition/Specimen reference
    resolution through the biospecimen-diagnosis link join, the laboratory
    category block, and the variant missing-data sentinel set on the tumor
    descriptor (text-only concept) — whole-resource bytes extending q35."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    diagnoses = orders.select(
        F.concat(F.lit("DG_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.lit("True").alias("visible"),
    )
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(F.col("o_orderkey") % 4 == 0, "Primary Tumor")
        .when(F.col("o_orderkey") % 4 == 1, "Metastatic")
        .when(F.col("o_orderkey") % 4 == 2, "Not Reported")
        .alias("source_text_tumor_descriptor"),
        F.lit("True").alias("visible"),
    )
    bds = orders.select(
        F.concat(F.lit("BD_"), F.col("o_orderkey")).alias("kf_id"),
        F.concat(F.lit("DG_"), F.col("o_orderkey")).alias("diagnosis_id"),
        F.concat(F.lit("BS_"), F.col("o_orderkey")).alias("biospecimen_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["diagnoses"] = diagnoses
    tables["biospecimens"] = biospecimens
    tables["biospecimen-diagnoses"] = bds
    out = build_resources_narrow(tables, only={"Histopathology"})
    return out["Histopathology"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q80_fhir_phenotype_json",
    oracle="""
    WITH phens AS (
      SELECT 'PH_' || o_orderkey AS ph_id,
             'PT_' || o_custkey AS pt_id,
             o_orderpriority AS name,
             CASE o_orderkey % 3 WHEN 0 THEN 'Positive' WHEN 1 THEN 'Negative' END AS observed,
             CASE o_orderkey % 4 WHEN 0 THEN 'HP:0001250' WHEN 1 THEN 'Not Reported' END AS hpo_raw,
             CASE WHEN o_orderkey % 5 = 0 THEN '271594007' END AS snomed_raw,
             CASE WHEN o_orderkey % 7 = 0 THEN 'bad-age'
                  ELSE (o_orderkey % 3650)::VARCHAR END AS age_raw,
             (SELECT 'SD_' || n_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = o_custkey) AS study_id
      FROM orders)
    SELECT md5('phenotype' || '|' || ph_id) AS target_id,
      replace(replace(replace(replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'Condition',
          id := md5('phenotype' || '|' || ph_id),
          meta := struct_pack(
            profile := ['https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/phenotype'],
            tag := [struct_pack(code := study_id)]),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/phenotypes/'::VARCHAR,
            value := ph_id)],
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id)),
          verificationStatus := struct_pack(
            coding := CASE observed
              WHEN 'Positive' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/condition-ver-status',
                                                code := 'confirmed', display := 'Confirmed')]
              WHEN 'Negative' THEN [struct_pack(system := 'http://terminology.hl7.org/CodeSystem/condition-ver-status',
                                                code := 'refuted', display := 'Refuted')]
              ELSE NULL END,
            text := observed),
          code := struct_pack(
            coding := CASE
              WHEN hpo_raw = 'HP:0001250' AND snomed_raw IS NOT NULL
                THEN [struct_pack(system := 'http://purl.obolibrary.org/obo/hp.owl', code := hpo_raw),
                      struct_pack(system := 'http://snomed.info/sct', code := snomed_raw)]
              WHEN hpo_raw = 'HP:0001250'
                THEN [struct_pack(system := 'http://purl.obolibrary.org/obo/hp.owl', code := hpo_raw)]
              WHEN snomed_raw IS NOT NULL
                THEN [struct_pack(system := 'http://snomed.info/sct', code := snomed_raw)]
              ELSE NULL END,
            text := name),
          "_recordedDate" := CASE WHEN TRY_CAST(age_raw AS INTEGER) IS NOT NULL THEN
            struct_pack(extension := [struct_pack(
              extension := [
                struct_pack(url := 'event',
                  valueCodeableConcept := struct_pack(coding := [struct_pack(
                    system := 'http://snomed.info/sct', code := '3950001', display := 'Birth')]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'relationship',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := 'after'::VARCHAR,
                  valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                struct_pack(url := 'offset',
                  valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                  valueCode := NULL::VARCHAR,
                  valueDuration := struct_pack(value := TRY_CAST(age_raw AS INTEGER),
                                               unit := 'day', system := 'http://unitsofmeasure.org', code := 'd'))],
              url := 'http://hl7.org/fhir/StructureDefinition/relative-date')])
          END
        )),
        ',"_recordedDate":null', ''),
        ',"valueDuration":null', ''),
        ',"valueCode":null', ''),
        '"valueCodeableConcept":null,', ''),
        '"coding":null,', ''),
        '"text":null', '') AS resource_json
    FROM phens
    ORDER BY target_id
    """,
)
def q80_fhir_phenotype_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phenotype (Condition) emitting byte-identical resource JSON (ninth
    full-JSON builder gate): the Positive/Negative→confirmed/refuted
    verification recode emitted UNCONDITIONALLY (null observed serializes
    the reference's bare `{}` concept), HPO + SNOMED codings behind
    missing-data sentinels (both/either/neither variants), and the
    birth-relative `_recordedDate` extension."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    phenotypes = orders.select(
        F.concat(F.lit("PH_"), k).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.col("o_orderpriority").alias("source_text_phenotype"),
        F.when(k % 3 == 0, "Positive").when(k % 3 == 1, "Negative").alias("observed"),
        F.when(k % 4 == 0, "HP:0001250").when(k % 4 == 1, "Not Reported").alias("hpo_id_phenotype"),
        F.when(k % 5 == 0, "271594007").alias("snomed_id_phenotype"),
        F.when(k % 7 == 0, F.lit("bad-age")).otherwise((k % 3650).cast("string")).alias("age_at_event_days"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["phenotypes"] = phenotypes
    out = build_resources_narrow(tables, only={"Phenotype"})
    return out["Phenotype"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q81_fhir_research_subject_json",
    oracle="""
    WITH participants AS (
      SELECT 'PT_' || c_custkey AS pt_id,
             'SD_' || n_regionkey AS study_id,
             'cust-' || c_custkey AS external_id
      FROM customer JOIN nation ON c_nationkey = n_nationkey),
    keyed AS (
      SELECT *,
        md5('research_subject' || '|' ||
            'ResearchStudy/' || md5('research_study' || '|' || study_id) || '|' ||
            'Patient/' || md5('patient' || '|' || pt_id)) AS rs_id
      FROM participants)
    SELECT rs_id AS target_id,
      replace(
        to_json(struct_pack(
          resourceType := 'ResearchSubject',
          id := rs_id,
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/ResearchSubject'],
            tag := [struct_pack(code := study_id)]),
          identifier := [
            struct_pack(use := 'official',
              system := 'https://kf-api-dataservice.kidsfirstdrc.org/participants/'::VARCHAR,
              value := pt_id),
            struct_pack(use := 'secondary', system := NULL::VARCHAR, value := external_id)],
          status := 'off-study',
          study := struct_pack(reference := 'ResearchStudy/' || md5('research_study' || '|' || study_id)),
          individual := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id))
        )),
        '"system":null,', '') AS resource_json
    FROM keyed
    ORDER BY target_id
    """,
)
def q81_fhir_research_subject_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResearchSubject emitting byte-identical resource JSON (tenth
    full-JSON builder gate): the composite study+individual surrogate key
    built from the inline reference strings themselves — the purest
    demonstration that deterministic IDs replace the reference's
    re-entrant target-ID lookups (research_subject.py:24-31)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(_endpoint_tables(spark, sf_dir), only={"ResearchSubject"})
    return out["ResearchSubject"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q82_fhir_reference_entities_json",
    oracle="""
    WITH inv AS (
      SELECT 'IV_' || s_suppkey AS iv,
             'inv-' || s_suppkey AS ext,
             CASE WHEN s_suppkey % 3 <> 0 THEN s_name END AS pname,
             CASE WHEN s_suppkey % 2 = 0 THEN 'Institute ' || (s_suppkey % 7) END AS inst
      FROM supplier),
    prac AS (
      SELECT md5('practitioner' || '|' || iv) AS target_id,
        replace(replace(
          to_json(struct_pack(
            resourceType := 'Practitioner',
            id := md5('practitioner' || '|' || iv),
            meta := struct_pack(profile := ['http://hl7.org/fhir/StructureDefinition/Practitioner']),
            identifier := [
              struct_pack(use := 'official',
                system := 'https://kf-api-dataservice.kidsfirstdrc.org/investigators/'::VARCHAR,
                value := iv),
              struct_pack(use := 'secondary', system := NULL::VARCHAR, value := ext)],
            active := true,
            name := CASE WHEN pname IS NOT NULL THEN [struct_pack(text := pname)] END
          )),
          '"system":null,', ''), ',"name":null', '') AS resource_json
      FROM inv),
    org AS (
      SELECT md5('organization' || '|' || iv) AS target_id,
        replace(
          to_json(struct_pack(
            resourceType := 'Organization',
            id := md5('organization' || '|' || iv),
            meta := struct_pack(profile := ['http://hl7.org/fhir/StructureDefinition/Organization']),
            identifier := [struct_pack(use := 'official',
              system := 'https://kf-api-dataservice.kidsfirstdrc.org/investigators/'::VARCHAR,
              value := iv)],
            active := true,
            name := inst
          )),
          ',"name":null', '') AS resource_json
      FROM inv),
    role AS (
      SELECT md5('practitioner_role' || '|' ||
                 'Practitioner/' || md5('practitioner' || '|' || iv) || '|' ||
                 'Organization/' || md5('organization' || '|' || iv)) AS target_id,
        replace(
          to_json(struct_pack(
            resourceType := 'PractitionerRole',
            id := md5('practitioner_role' || '|' ||
                      'Practitioner/' || md5('practitioner' || '|' || iv) || '|' ||
                      'Organization/' || md5('organization' || '|' || iv)),
            meta := struct_pack(profile := ['http://hl7.org/fhir/StructureDefinition/PractitionerRole']),
            identifier := [
              struct_pack(use := 'official',
                system := 'https://kf-api-dataservice.kidsfirstdrc.org/investigators/'::VARCHAR,
                value := iv),
              struct_pack(use := 'secondary', system := NULL::VARCHAR, value := ext)],
            active := true,
            practitioner := struct_pack(reference := 'Practitioner/' || md5('practitioner' || '|' || iv)),
            organization := struct_pack(reference := 'Organization/' || md5('organization' || '|' || iv)),
            code := [struct_pack(coding := [struct_pack(
              system := 'http://terminology.hl7.org/CodeSystem/practitioner-role',
              code := 'researcher', display := 'Researcher')])]
          )),
          '"system":null,', '') AS resource_json
      FROM inv),
    scs AS (
      SELECT DISTINCT
        CASE o_orderkey % 6 WHEN 0 THEN 'SC_DGDDMBVV' WHEN 1 THEN 'SC_X1N69WJM'
          WHEN 2 THEN 'SC_K52V7463' WHEN 3 THEN 'SC_WWEQ9HFY'
          WHEN 4 THEN 'SC_FN7NH453' ELSE 'SC_UNKNOWN' END AS sc
      FROM orders),
    seqc AS (
      SELECT md5('sequencing_center' || '|' || sc) AS target_id,
        replace(
          to_json(struct_pack(
            resourceType := 'Organization',
            id := md5('sequencing_center' || '|' || sc),
            meta := struct_pack(profile := ['http://hl7.org/fhir/StructureDefinition/Organization']),
            identifier := [struct_pack(use := 'official',
              system := 'https://kf-api-dataservice.kidsfirstdrc.org/sequencing-centers/'::VARCHAR,
              value := sc)],
            name := CASE sc WHEN 'SC_DGDDMBVV' THEN 'Broad Institute'
              WHEN 'SC_X1N69WJM' THEN 'Baylor College of Medicine'
              WHEN 'SC_K52V7463' THEN 'Washington University'
              WHEN 'SC_WWEQ9HFY' THEN 'HudsonAlpha Institute for Biotechnology'
              WHEN 'SC_FN7NH453' THEN 'St Jude Children''s Research Hospital' END
          )),
          ',"name":null', '') AS resource_json
      FROM scs)
    SELECT * FROM prac UNION ALL SELECT * FROM org
    UNION ALL SELECT * FROM role UNION ALL SELECT * FROM seqc
    ORDER BY target_id
    """,
)
def q82_fhir_reference_entities_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four reference-entity builders emitting byte-identical resource
    JSON in one gate: Practitioner (optional name array), Organization
    (nullable institution name), PractitionerRole (composite
    practitioner+organization surrogate key, double inline references,
    researcher coding), and SequencingCenter (KF_ID→name recode with
    unmapped → nameless Organization, deduped by finalize from the
    biospecimen fan-out). With these, 14 of the 16 builders are held to
    whole-resource byte parity."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    supplier = load_table(spark, sf_dir, "supplier")
    s = F.col("s_suppkey")
    investigators = supplier.select(
        F.concat(F.lit("IV_"), s).alias("kf_id"),
        F.concat(F.lit("inv-"), s).alias("external_id"),
        F.when(s % 3 != 0, F.col("s_name")).alias("name"),
        F.when(s % 2 == 0, F.concat(F.lit("Institute "), (s % 7).cast("string"))).alias("institution"),
        F.lit("True").alias("visible"),
    )
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), k).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(k % 6 == 0, "SC_DGDDMBVV")
        .when(k % 6 == 1, "SC_X1N69WJM")
        .when(k % 6 == 2, "SC_K52V7463")
        .when(k % 6 == 3, "SC_WWEQ9HFY")
        .when(k % 6 == 4, "SC_FN7NH453")
        .otherwise("SC_UNKNOWN")
        .alias("sequencing_center_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["investigators"] = investigators
    tables["biospecimens"] = biospecimens
    out = build_resources_narrow(
        tables, only={"Practitioner", "Organization", "PractitionerRole", "SequencingCenter"}
    )
    union = None
    for target in ("Practitioner", "Organization", "PractitionerRole", "SequencingCenter"):
        part = out[target].select("target_id", "resource_json")
        union = part if union is None else union.unionByName(part)
    return union.orderBy("target_id")


@register(
    "q83_fhir_specimen_json",
    oracle="""
    WITH m AS (
      SELECT o_orderkey AS k,
             'BS_' || o_orderkey AS bs_id,
             'PT_' || o_custkey AS pt_id,
             CASE WHEN o_orderkey % 8 = 0 THEN 'GRU' END AS consent,
             CASE WHEN o_orderkey % 8 IN (0, 1) THEN 'phs-c1' END AS dbgap,
             CASE WHEN o_orderkey % 2 = 0 THEN 'samp-' || o_orderkey END AS sample_id,
             CASE WHEN o_orderkey % 3 = 0 THEN 'aliq-' || o_orderkey END AS aliquot_id,
             CASE WHEN o_orderkey % 2 = 0 THEN 'Tumor Tissue' END AS tissue_text,
             CASE o_orderkey % 4 WHEN 0 THEN 'Blood' WHEN 1 THEN 'Saliva'
               WHEN 2 THEN 'Tissue FFPE' ELSE 'Mystery Goo' END AS comp,
             CASE o_orderkey % 3 WHEN 0 THEN 'DNA' WHEN 1 THEN 'RNA' ELSE 'Other' END AS analyte,
             CASE WHEN o_orderkey % 5 = 0 THEN 'NCIT:C14165'
                  WHEN o_orderkey % 5 = 1 THEN 'Tumor' END AS ncit_tissue,
             CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
                  ELSE (o_orderkey % 3650)::VARCHAR END AS age_raw,
             CASE WHEN o_orderkey % 6 = 0 THEN 'not-a-volume'
                  ELSE (o_totalprice)::VARCHAR END AS vol_raw,
             CASE WHEN o_orderkey % 7 = 0 THEN 'Blood Draw'
                  WHEN o_orderkey % 7 = 1 THEN 'Strange Harvest' END AS method_text,
             CASE WHEN o_orderkey % 3 = 0 THEN 'Brain' END AS site_text,
             CASE o_orderkey % 3 WHEN 0 THEN 'UBERON:0002101'
               WHEN 1 THEN 'EFO:0000001' ELSE 'XYZ:9' END AS uberon,
             CASE WHEN o_orderkey % 4 = 0 THEN 'NCIT:C12439'
                  WHEN o_orderkey % 4 = 1 THEN 'C12439' END AS ncit_site,
             (SELECT 'SD_' || n_regionkey FROM customer JOIN nation ON c_nationkey = n_nationkey
              WHERE c_custkey = o_custkey) AS study_id
      FROM orders),
    coded AS (
      SELECT *,
        CASE comp WHEN 'Blood' THEN struct_pack(system := 'http://purl.obolibrary.org/obo/ncit.owl', code := 'C17610', display := 'Blood Sample')
          WHEN 'Saliva' THEN struct_pack(system := 'http://purl.obolibrary.org/obo/ncit.owl', code := 'C174119', display := 'Saliva Sample')
          WHEN 'Tissue FFPE' THEN struct_pack(system := 'http://purl.obolibrary.org/obo/ncit.owl', code := 'C172265', display := 'Formalin-Fixed Paraffin-Embedded Tissue Sample')
          ELSE NULL END AS comp_coding,
        CASE analyte WHEN 'DNA' THEN struct_pack(system := 'http://purl.obolibrary.org/obo/obi.owl', code := 'OBI:0001051', display := 'DNA extract')
          WHEN 'RNA' THEN struct_pack(system := 'http://purl.obolibrary.org/obo/obi.owl', code := 'OBI:0000880', display := 'RNA extract')
          ELSE NULL END AS an_coding
      FROM m)
    SELECT md5('specimen' || '|' || bs_id) AS target_id,
      replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'Specimen',
          id := md5('specimen' || '|' || bs_id),
          meta := struct_pack(
            profile := ['http://hl7.org/fhir/StructureDefinition/Specimen'],
            tag := [struct_pack(code := study_id)],
            security := CASE
              WHEN consent IS NOT NULL AND dbgap IS NOT NULL THEN
                [struct_pack(system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?consent_type=', code := consent),
                 struct_pack(system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?dbgap_consent_code=', code := dbgap)]
              WHEN dbgap IS NOT NULL THEN
                [struct_pack(system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?dbgap_consent_code=', code := dbgap)]
              ELSE NULL END),
          identifier := CASE
            WHEN sample_id IS NOT NULL AND aliquot_id IS NOT NULL THEN
              [struct_pack(use := 'official', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens/', value := bs_id),
               struct_pack(use := 'secondary', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?external_sample_id=', value := sample_id),
               struct_pack(use := 'secondary', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?external_aliquot_id=', value := aliquot_id)]
            WHEN sample_id IS NOT NULL THEN
              [struct_pack(use := 'official', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens/', value := bs_id),
               struct_pack(use := 'secondary', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?external_sample_id=', value := sample_id)]
            WHEN aliquot_id IS NOT NULL THEN
              [struct_pack(use := 'official', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens/', value := bs_id),
               struct_pack(use := 'secondary', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens?external_aliquot_id=', value := aliquot_id)]
            ELSE
              [struct_pack(use := 'official', system := 'https://kf-api-dataservice.kidsfirstdrc.org/biospecimens/', value := bs_id)]
            END,
          status := 'unavailable',
          subject := struct_pack(reference := 'Patient/' || md5('patient' || '|' || pt_id)),
          type := CASE WHEN tissue_text IS NOT NULL
                        OR ncit_tissue LIKE 'NCIT:%' OR comp_coding IS NOT NULL OR an_coding IS NOT NULL
            THEN struct_pack(
              text := tissue_text,
              coding := list_filter([
                CASE WHEN ncit_tissue LIKE 'NCIT:%'
                  THEN struct_pack(system := 'http://purl.obolibrary.org/obo/ncit.owl'::VARCHAR,
                                   code := ncit_tissue, display := NULL::VARCHAR) END,
                comp_coding, an_coding], x -> x IS NOT NULL)) END,
          collection := struct_pack(
            "_collectedDateTime" := CASE WHEN TRY_CAST(age_raw AS INTEGER) IS NOT NULL THEN
              struct_pack(extension := [struct_pack(
                extension := [
                  struct_pack(url := 'event',
                    valueCodeableConcept := struct_pack(coding := [struct_pack(
                      system := 'http://snomed.info/sct', code := '3950001', display := 'Birth')]),
                    valueCode := NULL::VARCHAR,
                    valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                  struct_pack(url := 'relationship',
                    valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                    valueCode := 'after'::VARCHAR,
                    valueDuration := NULL::STRUCT(value INTEGER, unit VARCHAR, system VARCHAR, code VARCHAR)),
                  struct_pack(url := 'offset',
                    valueCodeableConcept := NULL::STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]),
                    valueCode := NULL::VARCHAR,
                    valueDuration := struct_pack(value := TRY_CAST(age_raw AS INTEGER),
                                                 unit := 'day', system := 'http://unitsofmeasure.org', code := 'd'))],
                url := 'http://hl7.org/fhir/StructureDefinition/relative-date')])
            END,
            quantity := CASE WHEN TRY_CAST(vol_raw AS DOUBLE) IS NOT NULL THEN
              struct_pack(value := TRY_CAST(vol_raw AS DOUBLE), unit := 'microliters',
                          system := 'http://unitsofmeasure.org', code := 'uL') END,
            method := CASE WHEN method_text IS NOT NULL THEN struct_pack(
              coding := CASE WHEN method_text = 'Blood Draw'
                THEN [struct_pack(system := 'http://snomed.info/sct', code := '396540005',
                                  display := 'Phlebotomy (procedure)')] END,
              text := method_text) END,
            bodySite := struct_pack(
              text := site_text,
              coding := list_filter([
                struct_pack(
                  system := CASE WHEN uberon LIKE 'UBERON:%' THEN 'http://purl.obolibrary.org/obo/uberon.owl'
                                 WHEN uberon LIKE 'EFO:%' THEN 'http://www.ebi.ac.uk/efo/efo.owl' END,
                  code := uberon),
                CASE WHEN ncit_site LIKE 'NCIT:%'
                  THEN struct_pack(system := 'http://purl.obolibrary.org/obo/ncit.owl'::VARCHAR, code := ncit_site) END
              ], x -> x IS NOT NULL))
          )
        )),
        ',"security":null', ''),
        '"_collectedDateTime":null,', ''),
        ',"quantity":null', ''),
        ',"method":null', ''),
        ',"type":null', ''),
        '"text":null,', ''),
        '"coding":null,', ''),
        '"system":null,', ''),
        ',"valueDuration":null', ''),
        ',"valueCode":null', ''),
        '"valueCodeableConcept":null,', ''),
        ',"display":null', ''),
        -- when every earlier collection field was stripped, the next null
        -- field sits at struct start (leading-brace position): second pass
        '"quantity":null,', ''),
        '"method":null,', '') AS resource_json
    FROM coded
    ORDER BY target_id
    """,
)
def q83_fhir_specimen_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Specimen — the largest builder — emitting byte-identical resource
    JSON (fifteenth builder at byte parity): conditional meta.security
    consent labels, the 1-to-3-element identifier array, the compacted
    [NCIT-tissue, composition, analyte] type codings, float volume quantity
    with swallowed casts, SNOMED collection method with unmapped → text
    only, prefix-dispatched bodySite systems (incl. the system-less
    unprefixed-uberon coding), and the birth-relative `_collectedDateTime`
    extension — every conditional branch of the reference's biggest
    resource exercised and byte-checked."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), k).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(k % 8 == 0, "GRU").alias("consent_type"),
        F.when((k % 8 == 0) | (k % 8 == 1), "phs-c1").alias("dbgap_consent_code"),
        F.when(k % 2 == 0, F.concat(F.lit("samp-"), k)).alias("external_sample_id"),
        F.when(k % 3 == 0, F.concat(F.lit("aliq-"), k)).alias("external_aliquot_id"),
        F.when(k % 2 == 0, "Tumor Tissue").alias("source_text_tissue_type"),
        F.when(k % 4 == 0, "Blood")
        .when(k % 4 == 1, "Saliva")
        .when(k % 4 == 2, "Tissue FFPE")
        .otherwise("Mystery Goo")
        .alias("composition"),
        F.when(k % 3 == 0, "DNA").when(k % 3 == 1, "RNA").otherwise("Other").alias("analyte_type"),
        F.when(k % 5 == 0, "NCIT:C14165").when(k % 5 == 1, "Tumor").alias("ncit_id_tissue_type"),
        F.when(k % 7 == 0, F.lit("not-a-number")).otherwise((k % 3650).cast("string")).alias("age_at_event_days"),
        F.when(k % 6 == 0, F.lit("not-a-volume")).otherwise(F.col("o_totalprice").cast("string")).alias("volume_ul"),
        F.when(k % 7 == 0, "Blood Draw").when(k % 7 == 1, "Strange Harvest").alias("method_of_smaple_procurement"),
        F.when(k % 3 == 0, "Brain").alias("source_text_anatomical_site"),
        F.when(k % 3 == 0, "UBERON:0002101")
        .when(k % 3 == 1, "EFO:0000001")
        .otherwise("XYZ:9")
        .alias("uberon_id_anatomical_site"),
        F.when(k % 4 == 0, "NCIT:C12439").when(k % 4 == 1, "C12439").alias("ncit_id_anatomical_site"),
        F.lit("SC_DGDDMBVV").alias("sequencing_center_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["biospecimens"] = biospecimens
    out = build_resources_narrow(tables, only={"Specimen"})
    return out["Specimen"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q84_fhir_drs_json",
    oracle="""
    WITH links AS (
      SELECT DISTINCT 'BS_' || l_orderkey AS bs, 'GF_' || l_partkey AS gf,
             'PT_' || o_custkey AS pt
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), agg AS (
      SELECT gf, list_sort(list(DISTINCT pt)) AS pts, list_sort(list(DISTINCT bs)) AS bss
      FROM links GROUP BY gf
    ), m AS (
      SELECT p_partkey AS k, 'GF_' || p_partkey AS gf,
        CASE WHEN p_partkey % 5 = 0 THEN true WHEN p_partkey % 5 = 1 THEN false
             WHEN p_partkey % 3 = 0 THEN true WHEN p_partkey % 3 = 1 THEN false END AS controlled,
        CASE WHEN p_partkey % 2 = 0 THEN 'Variant Calls'
             WHEN p_partkey % 4 = 1 THEN 'gVCF' ELSE 'Unmapped Kind' END AS dt,
        CASE p_partkey % 4 WHEN 0 THEN 'cram' WHEN 1 THEN 'gvcf'
          WHEN 2 THEN 'tbi' ELSE 'txt' END AS fmt,
        CASE WHEN p_partkey % 5 = 0 THEN 'meta-did-' || p_partkey ELSE 'did-' || p_partkey END AS did,
        CASE WHEN p_partkey % 5 <> 0 THEN p_partkey * 1000 + 17 END AS size_val,
        CASE WHEN p_partkey % 6 = 0 THEN 'f_' || p_partkey || '.cram'
             WHEN p_partkey % 6 = 1 THEN 'plain_' || p_partkey END AS title,
        CASE WHEN p_partkey % 7 = 0 THEN NULL
             WHEN p_partkey % 3 = 0 THEN [struct_pack(hk := 'etag', hv := md5('e' || p_partkey)),
                                          struct_pack(hk := 'md5', hv := md5('h' || p_partkey))]
             ELSE [struct_pack(hk := 'md5', hv := md5('h' || p_partkey))] END AS hash_list,
        CASE p_partkey % 4 WHEN 0 THEN ['phs000123.c1', 'open'] WHEN 1 THEN ['SD_ONLY']
          WHEN 2 THEN [] ELSE NULL END AS acl_list
      FROM part
    ), rec AS (
      SELECT m.*, a.pts, a.bss FROM m LEFT JOIN agg a ON a.gf = m.gf
    )
    SELECT md5('drs_document_reference' || '|' || gf) AS target_id,
      replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
        to_json(struct_pack(
          resourceType := 'DocumentReference',
          id := md5('drs_document_reference' || '|' || gf),
          meta := struct_pack(
            profile := ['https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/drs-document-reference'],
            tag := [struct_pack(code := CASE WHEN pts IS NOT NULL THEN 'SD_0' END)]),
          identifier := [struct_pack(use := 'official',
            system := 'https://kf-api-dataservice.kidsfirstdrc.org/genomic-files/'::VARCHAR,
            value := gf)],
          status := 'current',
          docStatus := 'final',
          type := struct_pack(
            coding := CASE dt
              WHEN 'Variant Calls' THEN [struct_pack(system := 'https://includedcc.org/fhir/code-systems/data_types',
                                                     code := 'Variant-Calls', display := 'Variant Calls')]
              WHEN 'gVCF' THEN [struct_pack(system := 'https://includedcc.org/fhir/code-systems/data_types',
                                            code := 'gVCF', display := 'gVCF')]
              ELSE NULL END,
            text := dt),
          subject := NULL::JSON,
          securityLabel := list_concat(
            [struct_pack(
              coding := CASE WHEN controlled THEN
                  [struct_pack(system := 'https://includedcc.org/fhir/code-systems/data_access_types'::VARCHAR,
                               code := 'controlled'::VARCHAR, display := 'Controlled'::VARCHAR)]
                WHEN NOT controlled THEN
                  [struct_pack(system := 'https://includedcc.org/fhir/code-systems/data_access_types'::VARCHAR,
                               code := 'registered'::VARCHAR, display := 'Registered'::VARCHAR)]
                ELSE NULL END,
              text := CASE WHEN controlled THEN 'true' WHEN NOT controlled THEN 'false' END)],
            list_transform(COALESCE(acl_list, []), a -> struct_pack(
              coding := CASE WHEN len(string_split(a, '.')) > 1
                THEN [struct_pack(system := NULL::VARCHAR, code := string_split(a, '.')[2],
                                  display := NULL::VARCHAR)] ELSE NULL END,
              text := a))),
          content := [struct_pack(
            format := struct_pack(display := fmt),
            attachment := struct_pack(
              extension := CASE WHEN size_val IS NOT NULL OR hash_list IS NOT NULL THEN
                list_concat(
                  CASE WHEN size_val IS NOT NULL THEN
                    [struct_pack(url := 'https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/file-size'::VARCHAR,
                                 valueDecimal := size_val,
                                 valueCodeableConcept := NULL::STRUCT(coding STRUCT(display VARCHAR)[], "text" VARCHAR))]
                    ELSE [] END,
                  list_transform(COALESCE(hash_list, []), h -> struct_pack(
                    url := 'https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/hashes'::VARCHAR,
                    valueDecimal := NULL::BIGINT,
                    valueCodeableConcept := struct_pack(coding := [struct_pack(display := h.hk)],
                                                        "text" := h.hv))))
                END,
              url := 'drs://data.kidsfirstdrc.org/' || did,
              title := title))],
          context := CASE WHEN len(bss) > 0 THEN struct_pack(
            related := list_transform(bss, b -> struct_pack(
              reference := 'Specimen/' || md5('specimen' || '|' || b)))) END
        )),
        ',"subject":null', ''),
        ',"context":null', ''),
        '"extension":null,', ''),
        ',"title":null', ''),
        ',"valueDecimal":null', ''),
        ',"valueCodeableConcept":null', ''),
        '"coding":null,', ''),
        '"system":null,', ''),
        ',"display":null', ''),
        '"code":null', ''),
        '"text":null', '') AS resource_json
    FROM rec
    ORDER BY target_id
    """,
)
def q84_fhir_drs_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRSDocumentReference — the most intricate builder — emitting
    byte-identical resource JSON with the S7 metadata prefetch joined in
    (sixteenth and final builder at byte parity: every entity builder is
    now held to whole-resource bytes). Covers the A2 aggregation with
    sorted participant/biospecimen sets, metadata-over-wide coalesces, the
    unconditional access securityLabel (bare `{}` when access unknown) plus
    dot-split acl labels, the size valueDecimal + sorted hashes extension
    array, DRS url/title assembly, and context.related Specimen refs."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    empty_map = F.expr("map()").cast("map<string,string>")
    metadata = part.select(
        F.concat(F.lit("GF_"), ks).alias("genomic_file_id"),
        F.when(k % 5 == 0, F.lit(True)).when(k % 5 == 1, F.lit(False)).alias("controlled_access"),
        F.when(k % 2 == 0, F.lit("Variant Calls")).alias("data_type"),
        F.lit(None).cast("string").alias("file_format"),
        F.when(k % 5 == 0, F.concat(F.lit("meta-did-"), ks)).alias("latest_did"),
        F.when(k % 4 == 0, F.array(F.lit("phs000123.c1"), F.lit("open")))
        .when(k % 4 == 1, F.array(F.lit("SD_ONLY")))
        .when(k % 4 == 2, F.array().cast("array<string>"))
        .alias("acl"),
        F.when(k % 5 != 0, (k * 1000 + 17).cast("long")).alias("size"),
        F.when(k % 7 == 0, F.lit(None).cast("map<string,string>"))
        .otherwise(
            F.map_concat(
                F.create_map(F.lit("md5"), F.md5(F.concat(F.lit("h"), ks))),
                F.when(k % 3 == 0, F.create_map(F.lit("etag"), F.md5(F.concat(F.lit("e"), ks)))).otherwise(
                    empty_map
                ),
            )
        )
        .alias("hashes"),
        F.when(k % 6 == 0, F.concat(F.lit("dir/sub/f_"), ks, F.lit(".cram")))
        .when(k % 6 == 1, F.concat(F.lit("plain_"), ks))
        .alias("file_name"),
    )
    out = build_resources_narrow(
        _drs_tables(spark, sf_dir), metadata=metadata, only={"DRSDocumentReference"}
    )
    return out["DRSDocumentReference"].select("target_id", "resource_json").orderBy("target_id")


@register(
    "q64_fhir_drs_metadata_hashes",
    oracle="""
    WITH ks AS (SELECT p_partkey AS k FROM part),
    m AS (
      SELECT k,
        CASE WHEN k % 5 = 0 THEN true WHEN k % 5 = 1 THEN false
             WHEN k % 3 = 0 THEN true WHEN k % 3 = 1 THEN false END AS controlled,
        CASE WHEN k % 2 = 0 THEN 'Variant Calls'
             WHEN k % 4 = 1 THEN 'gVCF' ELSE 'Unmapped Kind' END AS dt_text,
        CASE WHEN k % 5 = 0 THEN 'meta-did-' || k ELSE 'did-' || k END AS did,
        CASE WHEN k % 5 <> 0 THEN k * 1000 + 17 END AS size_val,
        CASE WHEN k % 6 = 0 THEN 'f_' || k || '.cram'
             WHEN k % 6 = 1 THEN 'plain_' || k END AS title,
        CASE WHEN k % 7 = 0 THEN ''
             WHEN k % 3 = 0 THEN 'etag:' || md5('e' || k) || ',md5:' || md5('h' || k)
             ELSE 'md5:' || md5('h' || k) END AS hash_str,
        CASE k % 4 WHEN 0 THEN 'phs000123.c1,open' WHEN 1 THEN 'SD_ONLY' ELSE '' END AS acl_texts,
        CASE k % 4 WHEN 0 THEN 'c1,~' WHEN 1 THEN '~' ELSE '' END AS acl_codes
      FROM ks)
    SELECT md5('drs_document_reference' || '|' || 'GF_' || k) AS target_id,
           dt_text,
           'drs://data.kidsfirstdrc.org/' || did AS url,
           title,
           size_val,
           hash_str,
           (CASE WHEN size_val IS NOT NULL THEN 1 ELSE 0 END)
             + (CASE WHEN k % 7 = 0 THEN 0 WHEN k % 3 = 0 THEN 2 ELSE 1 END) AS n_ext,
           CASE WHEN controlled THEN 'true' WHEN NOT controlled THEN 'false' END AS access_text,
           acl_texts, acl_codes
    FROM m
    ORDER BY target_id
    """,
)
def q64_fhir_drs_metadata_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 gate: the DRS builder run WITH a prefetched S7 metadata table —
    hashes-map → extension-array iteration (sorted by hash key), the size
    valueDecimal extension, acl → securityLabel entries with dot-split
    codes, metadata-over-wide per-field coalesces, and file_name → title
    basename (reference drs_document_reference.py:224-243,315-386) —
    everything extracted back out of the emitted JSON. VERDICT r01 flagged
    C8 as pytest-only; this is its driver gate."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    empty_map = F.expr("map()").cast("map<string,string>")
    metadata = part.select(
        F.concat(F.lit("GF_"), ks).alias("genomic_file_id"),
        F.when(k % 5 == 0, F.lit(True)).when(k % 5 == 1, F.lit(False)).alias("controlled_access"),
        F.when(k % 2 == 0, F.lit("Variant Calls")).alias("data_type"),
        F.lit(None).cast("string").alias("file_format"),
        F.when(k % 5 == 0, F.concat(F.lit("meta-did-"), ks)).alias("latest_did"),
        F.when(k % 4 == 0, F.array(F.lit("phs000123.c1"), F.lit("open")))
        .when(k % 4 == 1, F.array(F.lit("SD_ONLY")))
        .when(k % 4 == 2, F.array().cast("array<string>"))
        .alias("acl"),
        F.when(k % 5 != 0, (k * 1000 + 17).cast("long")).alias("size"),
        F.when(k % 7 == 0, F.lit(None).cast("map<string,string>"))
        .otherwise(
            F.map_concat(
                F.create_map(F.lit("md5"), F.md5(F.concat(F.lit("h"), ks))),
                F.when(k % 3 == 0, F.create_map(F.lit("etag"), F.md5(F.concat(F.lit("e"), ks)))).otherwise(
                    empty_map
                ),
            )
        )
        .alias("hashes"),
        F.when(k % 6 == 0, F.concat(F.lit("dir/sub/f_"), ks, F.lit(".cram")))
        .when(k % 6 == 1, F.concat(F.lit("plain_"), ks))
        .alias("file_name"),
    )
    out = build_resources_narrow(
        _drs_tables(spark, sf_dir), metadata=metadata, only={"DRSDocumentReference"}
    )
    j = F.col("resource_json")
    _EXT_T = (
        "array<struct<url:string,valueDecimal:bigint,"
        "valueCodeableConcept:struct<coding:array<struct<display:string>>,text:string>>>"
    )
    exts = F.from_json(F.get_json_object(j, "$.content[0].attachment.extension"), _EXT_T)
    hash_exts = F.filter(exts, lambda e: e.getField("valueCodeableConcept").isNotNull())
    _SL_T = "array<struct<coding:array<struct<system:string,code:string,display:string>>,text:string>>"
    sl = F.from_json(F.get_json_object(j, "$.securityLabel"), _SL_T)
    acl_entries = F.slice(sl, 2, 100000)
    return out["DRSDocumentReference"].select(
        "target_id",
        F.get_json_object(j, "$.type.text").alias("dt_text"),
        F.get_json_object(j, "$.content[0].attachment.url").alias("url"),
        F.get_json_object(j, "$.content[0].attachment.title").alias("title"),
        F.try_element_at(F.filter(exts, lambda e: e.getField("valueDecimal").isNotNull()), F.lit(1))
        .getField("valueDecimal")
        .alias("size_val"),
        F.coalesce(
            F.array_join(
                F.transform(
                    hash_exts,
                    lambda e: F.concat(
                        F.element_at(
                            e.getField("valueCodeableConcept").getField("coding"), 1
                        ).getField("display"),
                        F.lit(":"),
                        e.getField("valueCodeableConcept").getField("text"),
                    ),
                ),
                ",",
            ),
            F.lit(""),  # extension absent entirely (no size, no hashes) → ''
        ).alias("hash_str"),
        F.coalesce(F.size(exts), F.lit(0)).cast("long").alias("n_ext"),
        F.get_json_object(j, "$.securityLabel[0].text").alias("access_text"),
        F.array_join(F.transform(acl_entries, lambda e: e.getField("text")), ",").alias("acl_texts"),
        F.array_join(
            F.transform(
                acl_entries,
                lambda e: F.coalesce(
                    F.element_at(e.getField("coding"), 1).getField("code"), F.lit("~")
                ),
            ),
            ",",
        ).alias("acl_codes"),
    ).orderBy("target_id")


@register(
    "q65_fhir_specimen_bodysite_dispatch",
    oracle="""
    WITH ks AS (SELECT o_orderkey AS k FROM orders),
    m AS (
      SELECT k,
        CASE WHEN k % 4 = 0 THEN 'NCIT:C12439' WHEN k % 4 = 1 THEN 'C12439' END AS ncit_site,
        CASE WHEN k % 6 = 0 THEN 'UBERON:0000955' END AS uberon_site,
        CASE WHEN k % 3 = 0 THEN 'Brain' END AS site_text,
        CASE WHEN k % 5 = 0 THEN 'NCIT:C14165' WHEN k % 5 = 1 THEN 'Tumor' END AS ncit_tissue,
        CASE WHEN k % 2 = 0 THEN 'Tumor Tissue' END AS tissue_text,
        CASE WHEN k % 7 = 0 THEN 'Blood Draw' WHEN k % 7 = 1 THEN 'Strange Harvest' END AS method_text,
        CASE WHEN k % 8 = 0 THEN 'GRU' END AS consent,
        CASE WHEN k % 8 IN (0, 1) THEN 'phs-c1' END AS dbgap
      FROM ks)
    SELECT md5('specimen' || '|' || 'BS_' || k) AS target_id,
           CASE WHEN uberon_site IS NOT NULL THEN 'http://purl.obolibrary.org/obo/uberon.owl'
                WHEN ncit_site = 'NCIT:C12439' THEN 'http://purl.obolibrary.org/obo/ncit.owl'
           END AS bs_sys0,
           CASE WHEN uberon_site IS NOT NULL THEN uberon_site
                WHEN ncit_site = 'NCIT:C12439' THEN ncit_site END AS bs_code0,
           CASE WHEN uberon_site IS NOT NULL AND ncit_site = 'NCIT:C12439'
                THEN ncit_site END AS bs_code1,
           CASE WHEN site_text IS NOT NULL OR uberon_site IS NOT NULL
                     OR ncit_site = 'NCIT:C12439'
                THEN site_text END AS bs_text,
           CASE WHEN ncit_tissue = 'NCIT:C14165' THEN ncit_tissue END AS type_code0,
           CASE WHEN tissue_text IS NOT NULL OR ncit_tissue = 'NCIT:C14165'
                THEN tissue_text END AS type_text,
           CASE WHEN method_text = 'Blood Draw' THEN '396540005' END AS method_code,
           method_text,
           COALESCE(consent, dbgap) AS sec0_code,
           CASE WHEN consent IS NOT NULL THEN dbgap END AS sec1_code
    FROM m
    ORDER BY target_id
    """,
)
def q65_fhir_specimen_bodysite_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 gate: the Specimen builder's NCIT: prefix-dispatched bodySite
    coding (alongside the UBERON branch q27 covers), the unprefixed-value
    drop, the NCIT tissue-type type.coding, the SNOMED collection-method
    recode with unmapped → text-only, and the conditional meta.security
    consent labels (specimen.py:497-511,531-547,600-629). VERDICT r01
    flagged F4's NCIT branch as pytest-only; this is its driver gate."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    biospecimens = orders.select(
        F.concat(F.lit("BS_"), k).alias("kf_id"),
        F.concat(F.lit("PT_"), F.col("o_custkey")).alias("participant_id"),
        F.when(k % 4 == 0, "NCIT:C12439").when(k % 4 == 1, "C12439").alias("ncit_id_anatomical_site"),
        F.when(k % 6 == 0, "UBERON:0000955").alias("uberon_id_anatomical_site"),
        F.when(k % 3 == 0, "Brain").alias("source_text_anatomical_site"),
        F.when(k % 5 == 0, "NCIT:C14165").when(k % 5 == 1, "Tumor").alias("ncit_id_tissue_type"),
        F.when(k % 2 == 0, "Tumor Tissue").alias("source_text_tissue_type"),
        F.when(k % 7 == 0, "Blood Draw")
        .when(k % 7 == 1, "Strange Harvest")
        .alias("method_of_smaple_procurement"),
        F.when(k % 8 == 0, "GRU").alias("consent_type"),
        F.when((k % 8 == 0) | (k % 8 == 1), "phs-c1").alias("dbgap_consent_code"),
        F.lit("SC_DGDDMBVV").alias("sequencing_center_id"),
        F.lit("True").alias("visible"),
    )
    tables = _endpoint_tables(spark, sf_dir)
    tables["biospecimens"] = biospecimens
    out = build_resources_narrow(tables, only={"Specimen"})
    j = F.col("resource_json")
    return out["Specimen"].select(
        "target_id",
        F.get_json_object(j, "$.collection.bodySite.coding[0].system").alias("bs_sys0"),
        F.get_json_object(j, "$.collection.bodySite.coding[0].code").alias("bs_code0"),
        F.get_json_object(j, "$.collection.bodySite.coding[1].code").alias("bs_code1"),
        F.get_json_object(j, "$.collection.bodySite.text").alias("bs_text"),
        F.get_json_object(j, "$.type.coding[0].code").alias("type_code0"),
        F.get_json_object(j, "$.type.text").alias("type_text"),
        F.get_json_object(j, "$.collection.method.coding[0].code").alias("method_code"),
        F.get_json_object(j, "$.collection.method.text").alias("method_text"),
        F.get_json_object(j, "$.meta.security[0].code").alias("sec0_code"),
        F.get_json_object(j, "$.meta.security[1].code").alias("sec1_code"),
    ).orderBy("target_id")


@register(
    "q115_multi_study_pipeline",
    oracle="""
    WITH e AS (SELECT COUNT(*) AS n FROM customer WHERE c_custkey % 2 = 0),
         o AS (SELECT COUNT(*) AS n FROM customer WHERE c_custkey % 2 = 1),
         r AS (SELECT COUNT(*) AS n FROM region)
    SELECT * FROM (
      SELECT 'A' AS study, 'Disease' AS resource_type,
             (SELECT n FROM e) AS n, (SELECT n FROM e) AS n_ids
      UNION ALL SELECT 'A', 'Patient', (SELECT n FROM e), (SELECT n FROM e)
      UNION ALL SELECT 'A', 'ProbandStatus', (SELECT n FROM e), (SELECT n FROM e)
      UNION ALL SELECT 'A', 'ResearchStudy', (SELECT n FROM r), (SELECT n FROM r)
      UNION ALL SELECT 'A', 'ResearchSubject', (SELECT n FROM e), (SELECT n FROM e)
      UNION ALL SELECT 'B', 'Patient', (SELECT n FROM o), (SELECT n FROM o)
      UNION ALL SELECT 'B', 'Phenotype', (SELECT n FROM o), (SELECT n FROM o)
      UNION ALL SELECT 'B', 'ProbandStatus', (SELECT n FROM o), (SELECT n FROM o)
      UNION ALL SELECT 'B', 'ResearchStudy', (SELECT n FROM r), (SELECT n FROM r)
      UNION ALL SELECT 'B', 'ResearchSubject', (SELECT n FROM o), (SELECT n FROM o)
      UNION ALL SELECT 'B', 'VitalStatus', (SELECT n FROM o), (SELECT n FROM o)
    ) ORDER BY study, resource_type
    """,
)
def q115_multi_study_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-study scale-out gate (S9/§2.9): TWO studies with DIFFERENT
    endpoint-table subsets (study A: participants+diagnoses on the even
    custkeys; study B: participants+phenotypes+outcomes on the odd) run
    through ``etl.run_pipeline`` concurrently on a thread pool in ONE
    Spark job — the deployment shape of the reference's per-study Ingest
    driver fanned out across a cluster. The union of per-(study, resource)
    counts is hash-checked: the presence-conditional cascade must pick a
    different target set per study (Disease only in A; Phenotype and
    VitalStatus only in B), the two builds must not bleed rows into each
    other, and distinct-target-id counts must equal emitted counts. The
    thread-pool ≡ sequential equivalence itself is pinned in
    tests/test_transform.py; this gate proves it end-to-end under the
    driver's oracle. Each study's constructed pipeline is memoized through
    ``etl.run_pipeline(memo_key=...)`` (r06) — repeat calls re-serve both
    studies' checkpointed plans, the same steady state q85 models."""
    from concurrent.futures import ThreadPoolExecutor

    from kf_task_fhir_etl_spark.catalog import content_fingerprint
    from kf_task_fhir_etl_spark.etl import memoized_pipeline, run_pipeline

    fingerprint = content_fingerprint(sf_dir, ["customer", "nation", "region"])
    obs_seq = next(_MEMO_OBS_SEQ)  # observation ticket, taken WITH the fingerprint
    c = F.col("c_custkey")
    key_of = F.split(F.col("kf_id"), "_").getItem(1).cast("long")

    # base endpoint plans are built lazily, once, and ONLY on a memo miss —
    # warm invocations must not pay table construction just to reach a hit
    # (r06 review); the lock serializes the two cold study threads
    import threading

    _shared: dict[str, object] = {}
    _shared_lock = threading.Lock()

    def shared_tables():
        with _shared_lock:
            if "base" not in _shared:
                _shared["base"] = _endpoint_tables(spark, sf_dir)
                _shared["customer"] = cached_table(spark, sf_dir, "customer")
        return _shared["base"], _shared["customer"]

    def study_tables(parity: int) -> dict[str, DataFrame]:
        base, customer = shared_tables()
        t = {
            "studies": base["studies"],
            "participants": base["participants"].filter(key_of % 2 == parity),
        }
        cust = customer.filter(c % 2 == parity)
        if parity == 0:  # study A: diagnoses only
            t["diagnoses"] = cust.select(
                F.concat(F.lit("DG_"), c).alias("kf_id"),
                F.concat(F.lit("PT_"), c).alias("participant_id"),
                F.lit("dx").alias("source_text_diagnosis"),
                F.lit("100").alias("age_at_event_days"),
                F.lit("True").alias("visible"),
            )
        else:  # study B: phenotypes + outcomes
            t["phenotypes"] = cust.select(
                F.concat(F.lit("PH_"), c).alias("kf_id"),
                F.concat(F.lit("PT_"), c).alias("participant_id"),
                F.lit("px").alias("source_text_phenotype"),
                F.lit("Positive").alias("observed"),
                F.lit("True").alias("visible"),
            )
            t["outcomes"] = cust.select(
                F.concat(F.lit("OC_"), c).alias("kf_id"),
                F.concat(F.lit("PT_"), c).alias("participant_id"),
                F.lit("Alive").alias("vital_status"),
                F.lit("True").alias("visible"),
            )
        return t

    def run_study(p: int):
        key = (f"q115:{sf_dir}:study{p}", fingerprint)
        hit = memoized_pipeline(spark, key)
        if hit is not None:
            return hit
        return run_pipeline(study_tables(p), memo_key=key, memo_seq=obs_seq)

    with ThreadPoolExecutor(max_workers=2) as ex:
        out_a, out_b = ex.map(run_study, (0, 1))

    union = None
    for study, out in (("A", out_a), ("B", out_b)):
        for target, df in out.items():
            part = df.agg(
                F.count(F.lit(1)).alias("n"), F.countDistinct("target_id").alias("n_ids")
            ).select(
                F.lit(study).alias("study"), F.lit(target).alias("resource_type"), "n", "n_ids"
            )
            union = part if union is None else union.unionByName(part)
    return union.orderBy("study", "resource_type")


# ---------------------------------------------------------------------------
# q124 — multi-target narrow orchestration (one call, three builders)
# ---------------------------------------------------------------------------


def _q124_oracle() -> str:
    """Compose the multi-target oracle from the already-registered singleton
    oracles (q24 Patient, q74 ProbandStatus, q81 ResearchSubject) — each
    wrapped as a subquery and tagged with its resource type. Reuse
    guarantees the expected bytes are IDENTICAL to the singleton gates':
    the narrow orchestration must reproduce, in one call, exactly what each
    per-target gate proves in isolation (and q24's oracle was written
    against the WIDE path, so matching it is the wide ≡ narrow equality
    statement under the driver oracle, VERDICT r04 item #6)."""
    from kf_task_fhir_etl_spark.queries import ORACLES

    parts = [
        f"SELECT '{rt}' AS resource_type, target_id, resource_json FROM ({ORACLES[name]})"
        for rt, name in [
            ("Patient", "q24_fhir_patient_resources"),
            ("ProbandStatus", "q74_fhir_proband_status_json"),
            ("ResearchSubject", "q81_fhir_research_subject_json"),
        ]
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY resource_type, target_id"


@register("q124_narrow_multi_target", oracle=_q124_oracle())
def q124_narrow_multi_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The narrow orchestration end-to-end (plans/narrow.py::
    build_resources_narrow) with THREE targets in ONE call — gating the
    multi-target dict flow itself (target selection, per-target input
    construction, fixed build order), not just each builder in isolation.
    Every emitted resource byte must equal the singleton gates' expected
    JSON (the oracle literally reuses their SQL), so a narrow-input
    regression — a dropped parent attribute, a wrong join key, a target
    built from another target's input — fails the value hash on whole
    resources. Patient's expected bytes come from q24's WIDE-path oracle,
    making wide ≡ narrow resource equality a driver-gated property rather
    than a pytest-only pin. Three builders share one scan of the two
    endpoint tables; row counts stay O(entity) throughout (the narrow
    path's 100 TB contract — the wide fan-out never materializes)."""
    from kf_task_fhir_etl_spark.plans.narrow import build_resources_narrow

    out = build_resources_narrow(
        _endpoint_tables(spark, sf_dir),
        only={"Patient", "ProbandStatus", "ResearchSubject"},
    )
    union = None
    for target in ("Patient", "ProbandStatus", "ResearchSubject"):
        part = out[target].select(
            F.lit(target).alias("resource_type"), "target_id", "resource_json"
        )
        union = part if union is None else union.unionByName(part)
    return union.orderBy("resource_type", "target_id")
