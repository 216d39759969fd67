"""Narrow-path builder inputs: per-entity minimal joins instead of the wide
table.

The wide table (J1-J12) multiplies row counts: diagnoses × phenotypes ×
outcomes × biospecimens × files per participant (SURVEY.md §4 flags this as
the 100 TB risk; the reference deflates it back with clean_up_df's dedupe).
Since every builder reads only its own entity's columns plus a few parent
attributes, each builder can instead consume a *minimal* join of 1-3 endpoint
tables — row counts stay O(entity), the fan-out never materializes, and every
join key is the child's foreign key (no cross products at all).

Equivalence with the wide path holds because entity attributes are
functionally dependent on the entity key: the wide table's fan-out rows are
exact duplicates from each builder's column view, which ``finalize``'s
``dropDuplicates(target_id)`` collapses. ``tests/test_narrow.py`` asserts
resource-level equality of both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kf_task_fhir_etl_spark.functions.normalize import normalize
from kf_task_fhir_etl_spark.plans.mappings import rename_to_concepts
from kf_task_fhir_etl_spark.plans.transform import ALL_TARGETS, transform_study


def narrow_builder_inputs(
    endpoint_tables: dict[str, DataFrame], only: set[str] | None = None
) -> dict[str, DataFrame]:
    """{target_name: minimal normalized input table}. Only targets whose
    endpoint tables are present appear (the same presence-conditional rules
    as the wide cascade).

    ``only`` restricts which targets' input plans are CONSTRUCTED at all.
    Building a DataFrame plan is driver-side work (every column expression is
    a py4j round-trip; the Specimen builder alone chains ~130 literal map
    entries) — measured ~5s to construct all 16 builder plans vs <1s for one.
    Execution laziness does not help with that; this does."""

    def get(endpoint: str) -> DataFrame | None:
        df = endpoint_tables.get(endpoint)
        return rename_to_concepts(df, endpoint) if df is not None else None

    studies = get("studies")
    investigators = get("investigators")
    participants = get("participants")
    families = get("families")
    frs = get("family-relationships")
    diagnoses = get("diagnoses")
    phenotypes = get("phenotypes")
    outcomes = get("outcomes")
    bds = get("biospecimen-diagnoses")
    biospecimens = get("biospecimens")
    bgfs = get("biospecimen-genomic-files")
    genomic_files = get("genomic-files")
    segfs = get("sequencing-experiment-genomic-files")
    seqs = get("sequencing-experiments")

    # parent attribute projections used by children (tolerate partial source
    # schemas — the reference tables are also column-variable)
    part_study = None
    if participants is not None:
        wanted = [
            "PARTICIPANT|TARGET_SERVICE_ID",
            "STUDY|TARGET_SERVICE_ID",
            "PARTICIPANT|IS_AFFECTED_UNDER_STUDY",
        ]
        cols = [
            F.col(f"`{c}`") if c in participants.columns else F.lit(None).cast("string").alias(c)
            for c in wanted
        ]
        part_study = participants.select(cols)

    out: dict[str, DataFrame] = {}

    def put(target: str, make) -> None:
        # selection check BEFORE construction: put takes a thunk so an
        # unselected target's input join plan is never built at all
        if only is not None and target not in only:
            return
        df = make()
        if df is not None:
            out[target] = normalize(df)

    if studies is not None:
        if investigators is not None:
            put(
                "ResearchStudy",
                lambda: studies.join(investigators, ["INVESTIGATOR|TARGET_SERVICE_ID"], "full"),
            )
        else:
            put("ResearchStudy", lambda: studies)

    if investigators is not None:
        put("Practitioner", lambda: investigators)
        put("Organization", lambda: investigators)
        put("PractitionerRole", lambda: investigators)

    if participants is not None:
        put("Patient", lambda: participants)
        put("ProbandStatus", lambda: participants)
        put("ResearchSubject", lambda: participants)

    if families is not None and participants is not None:
        put("Family", lambda: participants.join(families, ["FAMILY|TARGET_SERVICE_ID"], "full"))

    if frs is not None:
        put("FamilyRelationship", lambda: frs)

    def child_with_study(child: DataFrame | None) -> DataFrame | None:
        """Attach parent (study/participant) attributes to a child table.
        Without participants the child still builds — it carries its own
        PARTICIPANT|TARGET_SERVICE_ID — with the parent attributes padded
        null, exactly what the wide cascade produces for that combo (the
        child's rows join nothing, so the study columns come out null)."""
        if child is None:
            return None
        if part_study is None:
            pad = [
                c
                for c in ("STUDY|TARGET_SERVICE_ID", "PARTICIPANT|IS_AFFECTED_UNDER_STUDY")
                if c not in child.columns
            ]
            return child.select("*", *[F.lit(None).cast("string").alias(c) for c in pad])
        return child.join(part_study, ["PARTICIPANT|TARGET_SERVICE_ID"], "left")

    if diagnoses is not None:
        put("Disease", lambda: child_with_study(diagnoses))
    if phenotypes is not None:
        put("Phenotype", lambda: child_with_study(phenotypes))
    if outcomes is not None:
        put("VitalStatus", lambda: child_with_study(outcomes))

    if biospecimens is not None:
        put("SequencingCenter", lambda: biospecimens.select("SEQUENCING|CENTER|TARGET_SERVICE_ID"))
        put("Specimen", lambda: child_with_study(biospecimens))
        if bds is not None:

            def _hist() -> DataFrame:
                bs_attrs = biospecimens.select(
                    "BIOSPECIMEN|TARGET_SERVICE_ID",
                    "PARTICIPANT|TARGET_SERVICE_ID",
                    "BIOSPECIMEN|TUMOR_DESCRIPTOR",
                )
                return child_with_study(bds.join(bs_attrs, ["BIOSPECIMEN|TARGET_SERVICE_ID"], "left"))

            put("Histopathology", _hist)

    if genomic_files is not None:
        # Wide-path parity: DRSDocumentReference is targeted whenever
        # genomic-files is present; absent link/parent tables pad null, which
        # is what the wide cascade yields for those combos (empty collected
        # participant/biospecimen lists, null study).

        def _drs() -> DataFrame:
            gf_attrs = genomic_files.select(
                "GENOMIC_FILE|TARGET_SERVICE_ID",
                "GENOMIC_FILE|DATA_TYPE",
                "GENOMIC_FILE|FILE_FORMAT",
                "GENOMIC_FILE|LATEST_DID",
                "GENOMIC_FILE|CONTROLLED_ACCESS",
            )
            null_str = lambda name: F.lit(None).cast("string").alias(name)  # noqa: E731
            if bgfs is not None:
                links = bgfs.select(
                    "BIOSPECIMEN|TARGET_SERVICE_ID", "GENOMIC_FILE|TARGET_SERVICE_ID"
                )
                if biospecimens is not None:
                    bs_part = biospecimens.select(
                        "BIOSPECIMEN|TARGET_SERVICE_ID", "PARTICIPANT|TARGET_SERVICE_ID"
                    )
                    links = links.join(bs_part, ["BIOSPECIMEN|TARGET_SERVICE_ID"], "left")
                else:
                    links = links.select("*", null_str("PARTICIPANT|TARGET_SERVICE_ID"))
                drs = links.join(gf_attrs, ["GENOMIC_FILE|TARGET_SERVICE_ID"], "full")
            else:
                drs = gf_attrs.select(
                    "*",
                    null_str("BIOSPECIMEN|TARGET_SERVICE_ID"),
                    null_str("PARTICIPANT|TARGET_SERVICE_ID"),
                )
            if segfs is not None:
                seg = segfs.select("GENOMIC_FILE|TARGET_SERVICE_ID", "SEQUENCING|TARGET_SERVICE_ID")
                drs = drs.join(seg, ["GENOMIC_FILE|TARGET_SERVICE_ID"], "full")
                if seqs is not None:
                    drs = drs.join(
                        seqs.select("SEQUENCING|TARGET_SERVICE_ID", "SEQUENCING|STRATEGY"),
                        ["SEQUENCING|TARGET_SERVICE_ID"],
                        "left",
                    )
            if part_study is not None:
                drs = drs.join(
                    part_study.select("PARTICIPANT|TARGET_SERVICE_ID", "STUDY|TARGET_SERVICE_ID"),
                    ["PARTICIPANT|TARGET_SERVICE_ID"],
                    "left",
                )
            else:
                drs = drs.select("*", null_str("STUDY|TARGET_SERVICE_ID"))
            return drs

        put("DRSDocumentReference", _drs)

    return out


def build_resources_narrow(
    endpoint_tables: dict[str, DataFrame],
    metadata: DataFrame | None = None,
    only: set[str] | None = None,
) -> dict[str, DataFrame]:
    """Run every applicable builder from its narrow input. Targets follow the
    same presence rules and fixed order as the wide path. ``only`` limits
    which builder plans are constructed (see ``narrow_builder_inputs``)."""
    from kf_task_fhir_etl_spark.builders import BUILDERS

    inputs = narrow_builder_inputs(endpoint_tables, only=only)
    # the wide path's target gating (e.g. Histopathology only when
    # biospecimen-diagnoses present) is already encoded above; keep order
    out: dict[str, DataFrame] = {}
    for target in ALL_TARGETS:
        table = inputs.get(target)
        if table is None:
            continue
        module, _ = BUILDERS[target]
        if target == "DRSDocumentReference":
            out[target] = module.build(table, metadata=metadata)
        else:
            out[target] = module.build(table)
    return out
