"""Structured Streaming operators (green-field — SURVEY §2.12: the
reference has no streams; its 'streaming' is line-by-line file
iteration, e.g. 2-label.py:156-164). The ``events`` table is the
ingestion demo surface: watermarked tumbling/sliding windows and
session windows feed the stage-01 engagement semantics (P1/A1).
"""

from .windows import (  # noqa: F401
    sessionized_activity,
    sliding_event_rates,
    stream_events,
    tumbling_engagement,
)
