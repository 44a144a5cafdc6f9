from . import text, urls, variants  # noqa: F401
