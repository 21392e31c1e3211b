from .dedup import dedup_exact, window_dedup

__all__ = ["dedup_exact", "window_dedup"]
