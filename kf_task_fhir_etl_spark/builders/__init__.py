"""Builder registry, mirroring the reference's plugin list
(``target_api_plugins/entity_builders/__init__.py`` + the fixed dependency
order ``kf_api_fhir_service.py:115-132``)."""

from __future__ import annotations

from kf_task_fhir_etl_spark.builders import (
    disease,
    drs_document_reference,
    family,
    family_relationship,
    histopathology,
    organization,
    patient,
    phenotype,
    practitioner,
    practitioner_role,
    proband_status,
    research_study,
    research_subject,
    sequencing_center,
    specimen,
    vital_status,
)

# target name (matches plans.transform.ALL_TARGETS) → (module, input table key)
BUILDERS = {
    "Practitioner": (practitioner, "default"),
    "Organization": (organization, "default"),
    "PractitionerRole": (practitioner_role, "default"),
    "Patient": (patient, "default"),
    "ProbandStatus": (proband_status, "default"),
    "FamilyRelationship": (family_relationship, "family_relationship"),
    "Family": (family, "default"),
    "ResearchStudy": (research_study, "default"),
    "ResearchSubject": (research_subject, "default"),
    "Disease": (disease, "default"),
    "Phenotype": (phenotype, "default"),
    "VitalStatus": (vital_status, "default"),
    "SequencingCenter": (sequencing_center, "default"),
    "Specimen": (specimen, "default"),
    "Histopathology": (histopathology, "default"),
    "DRSDocumentReference": (drs_document_reference, "default"),
}

__all__ = ["BUILDERS"]
