from . import embedding, sitemaps, text, urls, variants, wikitables  # noqa: F401
