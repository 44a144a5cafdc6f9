from . import decontaminate, dedup, joins, lm_quality, nested, packing, redact, rollups, sampling, similarity, spandedup, textops, vocab  # noqa: F401
