from .events import read_events_stream, run_windowed_counts_available_now, windowed_counts

__all__ = [
    "read_events_stream",
    "run_windowed_counts_available_now",
    "windowed_counts",
]
