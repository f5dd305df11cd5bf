from .incremental import (
    incremental_index_build,
    merge_segment_stats,
    process_generation,
)

__all__ = [
    "incremental_index_build",
    "merge_segment_stats",
    "process_generation",
]
