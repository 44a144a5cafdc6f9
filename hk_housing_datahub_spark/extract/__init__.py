from .reference import extract_one  # noqa: F401
from .vectorized import EXTRACT_SCHEMA, extract_df, extract_udf  # noqa: F401
