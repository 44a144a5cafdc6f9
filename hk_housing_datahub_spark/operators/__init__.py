from . import decontaminate, dedup, joins, nested, packing, redact, rollups, sampling, similarity, textops  # noqa: F401
