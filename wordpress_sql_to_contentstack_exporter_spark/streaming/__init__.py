from .dedup import streaming_exact_dedup, streaming_minhash_neardup
from .incremental import incremental_export, windowed_event_counts
from .rollup import continuous_rollup
from .stateful import sessionize_stream

__all__ = [
    "streaming_exact_dedup",
    "streaming_minhash_neardup",
    "incremental_export",
    "windowed_event_counts",
    "continuous_rollup",
    "sessionize_stream",
]

from .bloom_dedup import streaming_bloom_dedup  # noqa: E402

__all__.append("streaming_bloom_dedup")
