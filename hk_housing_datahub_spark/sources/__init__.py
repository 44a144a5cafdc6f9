from .tables import TableCatalog  # noqa: F401
