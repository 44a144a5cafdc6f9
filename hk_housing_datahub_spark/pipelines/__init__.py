from .corpus import CorpusRecipe, corpus_stats, prepare_training_corpus
from .wiki import estate_wiki_pipeline

__all__ = [
    "CorpusRecipe",
    "corpus_stats",
    "estate_wiki_pipeline",
    "prepare_training_corpus",
]
