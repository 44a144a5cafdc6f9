"""Nested-response → 14-table star-schema extraction surface.

Rebuilds the reference's single largest operator — the pydantic response
models + 12 table models + SQLAlchemy schema
(/root/reference/src/models/agency/responses.py:30-146,
outputs.py:33-488, sql_db.py:16-158) — as declarative Spark:
explicit StructType payload schemas, one from_json + multi-explode pass
per response family, FK lineage carried through the explodes (J4).
"""

from .schema import (
    BUILDING_RESPONSE_SCHEMA,
    ESTATE_RESPONSE_SCHEMA,
    MONTHLY_RESPONSE_SCHEMA,
    STAR_TABLES,
    create_star_tables,
)
from .datagen import (
    render_building_responses,
    render_estate_responses,
    render_monthly_responses,
)
from .extractor import (
    extract_building_tables,
    extract_estate_tables,
    extract_monthly_market,
)
from .consumer import maintain_monthly_rollup, rollup_vs_full_recompute
from .pipeline import run_star_pipeline

__all__ = [
    "maintain_monthly_rollup",
    "rollup_vs_full_recompute",
    "BUILDING_RESPONSE_SCHEMA",
    "ESTATE_RESPONSE_SCHEMA",
    "MONTHLY_RESPONSE_SCHEMA",
    "STAR_TABLES",
    "create_star_tables",
    "render_building_responses",
    "render_estate_responses",
    "render_monthly_responses",
    "extract_building_tables",
    "extract_estate_tables",
    "extract_monthly_market",
    "run_star_pipeline",
]
