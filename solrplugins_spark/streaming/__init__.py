from .stateful import streaming_sessionize
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
    "compact_generations",
    "incremental_index_build",
    "merge_segment_stats",
    "packed_generations",
    "process_generation",
    "update_docs",
]
