from .incremental import incremental_index_build, merge_segment_stats

__all__ = ["incremental_index_build", "merge_segment_stats"]
