from . import dedup, joins, rollups, similarity, textops  # noqa: F401
