from . import dedup, joins, nested, packing, redact, rollups, sampling, similarity, textops  # noqa: F401
