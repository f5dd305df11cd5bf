from .stateful import streaming_sessionize
from .windows import streaming_dedup, streaming_windowed_counts
from .incremental import (
    compact_generations,
    incremental_index_build,
    merge_segment_stats,
    packed_generations,
    process_generation,
    update_docs,
)

__all__ = [
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_windowed_counts",
    "compact_generations",
    "incremental_index_build",
    "merge_segment_stats",
    "packed_generations",
    "process_generation",
    "update_docs",
]
