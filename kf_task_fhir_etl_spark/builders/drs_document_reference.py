"""DRSDocumentReference builder — reference
``entity_builders/drs_document_reference.py:163-412``.

Three reference behaviors re-expressed Spark-first:

1. **A2 aggregation** (``transform_records_list``, ``drs_document_reference.py:170-206``):
   group by (study, genomic file [, sequencing experiment]) collecting the
   distinct participant and biospecimen lists → one ``groupBy().agg()`` with
   ``sort_array(collect_set(...))`` for determinism.
2. **Indexd metadata** (``drs_document_reference.py:224-243``): the reference
   does a per-row REST GET inside the builder — the engine takes a
   *prefetched metadata DataFrame* (see ``sources.rest``) and broadcast-joins
   it once; absent metadata falls back to the genomic-file columns already in
   the wide table. Never a per-row call.
3. **Inline references**: subject only when exactly one participant
   (``drs_document_reference.py:304-313``), per-biospecimen Specimen refs in
   ``context.related`` unless the (post-imputation) data type is an index
   type (``drs_document_reference.py:388-406``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.builders.base import (
    DATASERVICE,
    col,
    drs_document_reference_id,
    finalize,
    identifiers,
    meta,
    patient_id_from,
    specimen_id,
    surrogate_id,
)
from kf_task_fhir_etl_spark.functions.json_build import not_missing, string_or_null, try_cast
from kf_task_fhir_etl_spark.functions.recode import recode_coding

CLASS_NAME = "drs_document_reference"
API_PATH = "DocumentReference"

STATUS_CODE = "current"
DOC_STATUS_CODE = "final"
DRS_HOSTNAME = "drs://data.kidsfirstdrc.org"

_DT_SYSTEM = "https://includedcc.org/fhir/code-systems/data_types"
# data_type → (code, display); reference ``drs_document_reference.py:31-107``
TYPE_CODING = {
    "Aligned Reads": ("Aligned-Reads", "Aligned Reads"),
    "Aligned Reads Index": ("Aligned-Reads-Index", "Aligned Reads Index"),
    "Annotated Gene Fusion": ("Annotated-Gene-Fusion", "Annotated Gene Fusion"),
    "Gene Expression Quantification": ("Gene-Expression-Quantifications", "Gene Expression Quantifications"),
    "Gene Fusions": ("Gene-Fusions", "Gene Fusions"),
    "Isoform Expression Quantifications": ("Isoform-Expression-Quantifications", "Isoform Expression Quantifications"),
    "gVCF": ("gVCF", "gVCF"),
    "gVCF Index": ("gVCF-Index", "gVCF Index"),
    "Raw Gene Fusion": ("Raw-Gene-Fusions", "Raw Gene Fusions"),
    "Simple Nucleotide Variations": ("Simple-Nucleotide-Variations", "Simple Nucleotide Variations"),
    "Somatic Copy Number Variation": ("Somatic-Copy-Number-Variations", "Somatic Copy Number Variations"),
    "Somatic Copy Number Variations": ("Somatic-Copy-Number-Variations", "Somatic Copy Number Variations"),
    "Somatic Structural Variations": ("Somatic-Structural-Variations", "Somatic Structural Variations"),
    "Variant Calls": ("Variant-Calls", "Variant Calls"),
    "Variant Calls Index": ("Variant-Calls-Index", "Variant Calls Index"),
}

_ES_SYSTEM = "https://includedcc.org/fhir/code-systems/experimental_strategies"
EXPERIMENTAL_STRATEGY_CODING = {
    "RNA-Seq": (_ES_SYSTEM, "RNA-Seq", "RNA-Seq"),
    "WGS": (_ES_SYSTEM, "WGS", "Whole Genome Sequencing"),
}

_DC_SYSTEM = "https://includedcc.org/fhir/code-systems/data_categories"
DATA_CATEGORY_CODING = {
    "RNA-Seq": (_DC_SYSTEM, "Transcriptomics", "Transcriptomics"),
    "WGS": (_DC_SYSTEM, "Genomics", "Genomics"),
}

_DA_SYSTEM = "https://includedcc.org/fhir/code-systems/data_access_types"

# index data types excluded from context.related (drs_document_reference.py:388-395)
INDEX_DATA_TYPES = (
    "Aligned Reads Index",
    "gVCF Index",
    "Simple Nucleotide Variations Index",
    "Somatic Structural Variations Index",
    "Variant Calls Index",
)

METADATA_COLUMNS = (
    "genomic_file_id controlled_access data_type file_format latest_did acl size hashes file_name"
).split()


_lookup = recode_coding


def _type_coding(data_type: Column) -> Column:
    return recode_coding(data_type, {k: (_DT_SYSTEM, c, d) for k, (c, d) in TYPE_CODING.items()})


def aggregate_records(wide: DataFrame) -> DataFrame:
    """A2: one record per (study, genomic file [, sequencing experiment]) with
    collected participant/biospecimen lists — ``transform_records_list``
    (``drs_document_reference.py:170-206``). The grouping key widens
    dynamically when sequencing experiments were joined."""
    keys = [
        col("STUDY|TARGET_SERVICE_ID").alias("study_id"),
        col("GENOMIC_FILE|TARGET_SERVICE_ID").alias("genomic_file_id"),
    ]
    aggs = [
        F.sort_array(F.collect_set(col("PARTICIPANT|TARGET_SERVICE_ID"))).alias("participant_ids"),
        F.sort_array(F.collect_set(col("BIOSPECIMEN|TARGET_SERVICE_ID"))).alias("biospecimen_ids"),
    ]
    if "SEQUENCING|TARGET_SERVICE_ID" in wide.columns:
        keys.append(col("SEQUENCING|TARGET_SERVICE_ID").alias("sequencing_id"))
    # STRATEGY only exists when sequencing-experiments itself was joined — the
    # link table alone (J11 without J12) contributes just the TSID, so the two
    # presence checks are independent.
    if "SEQUENCING|STRATEGY" in wide.columns:
        aggs.append(F.min(col("SEQUENCING|STRATEGY")).alias("strategy"))
    else:
        aggs.append(F.min(F.lit(None).cast("string")).alias("strategy"))
    # wide-table genomic-file attributes ride along (first value per file)
    for src, alias in (
        ("GENOMIC_FILE|DATA_TYPE", "wide_data_type"),
        ("GENOMIC_FILE|FILE_FORMAT", "wide_file_format"),
        ("GENOMIC_FILE|LATEST_DID", "wide_latest_did"),
        ("GENOMIC_FILE|CONTROLLED_ACCESS", "wide_controlled_access"),
    ):
        aggs.append(F.min(col(src)).alias(alias) if src in wide.columns else F.min(F.lit(None).cast("string")).alias(alias))
    return (
        wide.filter(col("GENOMIC_FILE|TARGET_SERVICE_ID").isNotNull())
        .groupBy(*keys)
        .agg(*aggs)
    )


def build(wide: DataFrame, metadata: DataFrame | None = None) -> DataFrame:
    records = aggregate_records(wide)

    # wide-table fallbacks (normalized strings; see aggregate_records)
    wide_controlled_access = F.when(F.col("wide_controlled_access") == "True", F.lit(True)).when(
        F.col("wide_controlled_access") == "False", F.lit(False)
    )
    if metadata is not None:
        # S7 as a prefetch-join: metadata is tiny relative to the fact side →
        # broadcast; schema per FIXTURES.md §15. Files absent from the
        # metadata table fall back per-field to the wide-table genomic-file
        # columns (the docstring contract) instead of going all-null.
        records = records.join(F.broadcast(metadata), on=["genomic_file_id"], how="left")
        controlled_access = F.coalesce(F.col("controlled_access"), wide_controlled_access)
        data_type0 = F.coalesce(F.col("data_type"), F.col("wide_data_type"))
        file_format = F.coalesce(F.col("file_format"), F.col("wide_file_format"))
        latest_did = F.coalesce(F.col("latest_did"), F.col("wide_latest_did"))
        acl = F.col("acl")
        size = F.col("size").cast("string")
        hashes = F.col("hashes")
        file_name = F.col("file_name")
    else:
        # fallback: genomic-file columns already in the wide table;
        # acl/size/hashes/file_name unavailable without the S7 scan
        controlled_access = wide_controlled_access
        data_type0 = F.col("wide_data_type")
        file_format = F.col("wide_file_format")
        latest_did = F.col("wide_latest_did")
        acl = F.lit(None).cast("array<string>")
        size = F.lit(None).cast("string")
        hashes = F.lit(None).cast("map<string,string>")
        file_name = F.lit(None).cast("string")

    gf_id = F.col("genomic_file_id")
    strategy = string_or_null(F.col("strategy"))

    # TEMPORARY data_type imputation (drs_document_reference.py:246-254)
    data_type = F.when(
        data_type0.isin("Simple Nucleotide Variations", "Somatic Structural Variations")
        & (file_format == "tbi"),
        F.concat(data_type0, F.lit(" Index")),
    ).otherwise(data_type0)

    type_coding = _type_coding(data_type)
    doc_type = F.when(
        data_type.isNotNull(),
        F.struct(
            F.when(type_coding.isNotNull(), F.array(type_coding)).alias("coding"),
            data_type.alias("text"),
        ),
    )

    es_coding = _lookup(strategy, EXPERIMENTAL_STRATEGY_CODING)
    dc_coding = _lookup(strategy, DATA_CATEGORY_CODING)
    category = F.when(
        strategy.isNotNull(),
        F.array(
            F.struct(
                F.when(es_coding.isNotNull(), F.array(es_coding)).alias("coding"),
                strategy.alias("text"),
            ),
            F.struct(
                F.when(dc_coding.isNotNull(), F.array(dc_coding)).alias("coding"),
                strategy.alias("text"),
            ),
        ),
    )

    # subject only for single-participant files (drs_document_reference.py:304-313)
    subject = F.when(
        F.size(F.col("participant_ids")) == 1,
        F.struct(
            F.concat(F.lit("Patient/"), patient_id_from(F.element_at(F.col("participant_ids"), 1))).alias(
                "reference"
            )
        ),
    )

    # securityLabel: access coding + one entry per acl
    # (drs_document_reference.py:315-332). The access entry is appended
    # UNCONDITIONALLY in the reference (`{"text": controlled_access}` at
    # 316-322, even when controlled_access is None) — so a null-access file
    # deliberately serializes a bare `{}` element here, matching what the
    # reference emits after FHIR-server null-stripping.
    _SL_CODING_T = "array<struct<system:string,code:string,display:string>>"
    access_coding = (
        F.when(
            controlled_access == True,  # noqa: E712 — Column comparison
            F.array(
                F.struct(
                    F.lit(_DA_SYSTEM).alias("system"), F.lit("controlled").alias("code"), F.lit("Controlled").alias("display")
                )
            ),
        )
        .when(
            controlled_access == False,  # noqa: E712
            F.array(
                F.struct(
                    F.lit(_DA_SYSTEM).alias("system"), F.lit("registered").alias("code"), F.lit("Registered").alias("display")
                )
            ),
        )
        .cast(_SL_CODING_T)
    )
    access_label = F.struct(access_coding.alias("coding"), controlled_access.cast("string").alias("text"))
    acl_labels = F.transform(
        F.coalesce(acl, F.array().cast("array<string>")),
        lambda a: F.struct(
            F.when(
                F.size(F.split(a, "\\.")) > 1,
                F.array(
                    F.struct(
                        F.lit(None).cast("string").alias("system"),
                        F.element_at(F.split(a, "\\."), 2).alias("code"),
                        F.lit(None).cast("string").alias("display"),
                    )
                ),
            ).alias("coding"),
            a.alias("text"),
        ),
    )
    security_label = F.concat(F.array(access_label), acl_labels)

    # content.attachment (drs_document_reference.py:334-386)
    _EXT_VCC_T = "struct<coding:array<struct<display:string>>,text:string>"
    size_ext = F.when(
        try_cast(size, "bigint").isNotNull(),
        F.struct(
            F.lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/file-size").alias("url"),
            try_cast(size, "bigint").alias("valueDecimal"),
            F.lit(None).cast(_EXT_VCC_T).alias("valueCodeableConcept"),
        ),
    )
    hash_exts = F.transform(
        F.array_sort(F.map_entries(F.coalesce(hashes, F.expr("map()").cast("map<string,string>")))),
        lambda e: F.struct(
            F.lit("https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/hashes").alias("url"),
            F.lit(None).cast("bigint").alias("valueDecimal"),
            F.struct(
                F.array(F.struct(e.getField("key").alias("display"))).alias("coding"),
                e.getField("value").alias("text"),
            ).alias("valueCodeableConcept"),
        ),
    )
    attachment_ext = F.concat(F.filter(F.array(size_ext), lambda x: x.isNotNull()), hash_exts)
    attachment = F.when(
        (F.size(attachment_ext) > 0) | latest_did.isNotNull() | file_name.isNotNull(),
        F.struct(
            F.when(F.size(attachment_ext) > 0, attachment_ext).alias("extension"),
            F.when(latest_did.isNotNull(), F.concat(F.lit(f"{DRS_HOSTNAME}/"), latest_did)).alias("url"),
            F.when(file_name.isNotNull(), F.element_at(F.split(file_name, "/"), -1)).alias("title"),
        ),
    )
    fmt = F.when(not_missing(file_format), F.struct(file_format.alias("display")))
    content = F.when(
        fmt.isNotNull() | attachment.isNotNull(),
        F.array(F.struct(fmt.alias("format"), attachment.alias("attachment"))),
    )

    # context.related unless an index type (drs_document_reference.py:388-406)
    related = F.transform(
        F.col("biospecimen_ids"),
        lambda b: F.struct(F.concat(F.lit("Specimen/"), specimen_id(from_col=b)).alias("reference")),
    )
    context = F.when(
        ~F.coalesce(data_type.isin(*INDEX_DATA_TYPES), F.lit(False)) & (F.size(related) > 0),
        F.struct(related.alias("related")),
    )

    target_id = surrogate_id("drs_document_reference", gf_id)
    resource = F.struct(
        F.lit(API_PATH).alias("resourceType"),
        target_id.alias("id"),
        meta(
            "https://nih-ncpi.github.io/ncpi-fhir-ig/StructureDefinition/drs-document-reference",
            F.col("study_id"),
        ).alias("meta"),
        identifiers(f"{DATASERVICE}/genomic-files/", gf_id).alias("identifier"),
        F.lit(STATUS_CODE).alias("status"),
        F.lit(DOC_STATUS_CODE).alias("docStatus"),
        doc_type.alias("type"),
        category.alias("category"),
        subject.alias("subject"),
        security_label.alias("securityLabel"),
        content.alias("content"),
        context.alias("context"),
    )
    return finalize(
        records.select(target_id.alias("target_id"), resource.alias("resource")),
        API_PATH,
    )
