from . import embedding, text, urls, variants, wikitables  # noqa: F401
