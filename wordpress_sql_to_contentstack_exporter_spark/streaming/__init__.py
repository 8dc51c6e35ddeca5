from .incremental import incremental_export, windowed_event_counts

__all__ = ["incremental_export", "windowed_event_counts"]
