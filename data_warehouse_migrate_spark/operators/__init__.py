"""DataFrame-in / DataFrame-out operators.

``mapping`` and ``constraints`` reproduce the reference's column-mapping and
null-policy pipeline; ``dedup``, ``similarity``, ``text`` and ``multimodal``
are the beyond-reference LLM-data-pipeline operators, each designed for
100 TB scale (shuffle-aware, no driver-side collects).
"""

from data_warehouse_migrate_spark.operators.mapping import (
    MappingError,
    apply_mapping,
    validate_mapping,
)
from data_warehouse_migrate_spark.operators.constraints import (
    NullPolicyViolation,
    apply_defaults_backfill,
    apply_null_policy,
    parse_default_value,
)

__all__ = [
    "MappingError",
    "apply_mapping",
    "validate_mapping",
    "NullPolicyViolation",
    "apply_defaults_backfill",
    "apply_null_policy",
    "parse_default_value",
]
