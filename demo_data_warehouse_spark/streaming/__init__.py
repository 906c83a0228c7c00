"""Structured Streaming layer (SURVEY §2.9 ST1-ST5)."""

from .pipeline import (  # noqa: F401
    merge_batch_sink,
    read_landing_stream,
    run_available_now,
    tumbling_agg,
)
