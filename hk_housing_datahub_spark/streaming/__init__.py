from .events import run_windowed_counts, streaming_windowed_counts  # noqa: F401
