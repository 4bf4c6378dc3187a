from .dedup import dedup_last_write_wins, dedup_exact

__all__ = ["dedup_last_write_wins", "dedup_exact"]
