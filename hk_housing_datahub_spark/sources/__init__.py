from .tables import IncrementalConsumer, TableCatalog  # noqa: F401
