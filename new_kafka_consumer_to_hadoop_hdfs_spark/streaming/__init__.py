"""Structured Streaming operators (SURVEY.md §2.5 streaming row, M3).

The reference's "streaming" is a bounded batch job re-run manually
(README.md run-book); this package holds the real streaming
equivalents: watermarked dedup, stateful last-write-wins, and
event-time windowed aggregation — each tested through broker-free
file-stream harnesses (tests/test_streaming.py).
"""

from .dedup import (
    dedup_within_watermark,
    per_partition_cap,
    stateful_lww_dedup,
    windowed_event_counts,
)

__all__ = [
    "dedup_within_watermark",
    "per_partition_cap",
    "stateful_lww_dedup",
    "windowed_event_counts",
]
