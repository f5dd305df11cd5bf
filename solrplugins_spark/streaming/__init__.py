from .stateful import streaming_sessionize
from .incremental import (
    incremental_index_build,
    merge_segment_stats,
    process_generation,
)

__all__ = [
    "streaming_sessionize",
    "incremental_index_build",
    "merge_segment_stats",
    "process_generation",
]
