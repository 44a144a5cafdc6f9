from .wiki import estate_wiki_pipeline

__all__ = ["estate_wiki_pipeline"]
