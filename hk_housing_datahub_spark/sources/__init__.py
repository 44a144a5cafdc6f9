from .tables import (  # noqa: F401
    CommitConflict,
    IncrementalConsumer,
    TableCatalog,
)
