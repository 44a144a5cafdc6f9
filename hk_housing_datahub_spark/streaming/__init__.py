from .events import run_windowed_counts, streaming_windowed_counts  # noqa: F401
from .stateful import run_streaming_dedup, streaming_seen_dedup  # noqa: F401
from .tws import run_streaming_dedup_tws, streaming_seen_dedup_tws  # noqa: F401
from .corpus import ingest_corpus_batch, stream_corpus_ingest  # noqa: F401
from .neardup import ingest_neardup_batch, stream_neardup_ingest  # noqa: F401
