"""Large-scale training-data operators (beyond the reference surface):
deduplication, similarity search, text analysis, multimodal plumbing.

Design rule for 100 TB: per-document work (shingling, hashing, signatures,
scores) is expressed with ``F.transform``/``F.aggregate`` over arrays —
map-side, inside whole-stage codegen, zero shuffle. Shuffles happen only
where semantically required: the LSH bucket self-join and final group-bys.
"""

from kf_task_fhir_etl_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
