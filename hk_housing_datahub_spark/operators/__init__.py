from . import dedup, joins, nested, rollups, similarity, textops  # noqa: F401
