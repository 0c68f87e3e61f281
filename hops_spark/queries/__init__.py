"""Inventory queries (one per implemented SURVEY.md §2 operator).

Importing this package populates ``hops_spark.registry.QUERIES``.
Each module covers one SURVEY section family.
"""

from hops_spark.queries import (  # noqa: F401
    tpch,
    tpch2,
    tpch3,
    aggregates,
    joins,
    sorting,
    projections,
    setops,
    textops,
    dedup,
    similarity,
    events,
    metadata,
    scans,
    multimodal,
    pipeline,
    retrieval,
    analytics,
    layout,
    preference,
    profiling,
    examples,
)
