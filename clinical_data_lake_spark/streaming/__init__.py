"""Structured Streaming surface (SURVEY.md §2.12).

The reference is batch-only (its ETL re-runs on a schedule,
00-etl-rwd.py:222); this package is the streaming extension over the
``events`` table shape: watermarked tumbling/sliding window aggregates
whose batch-expressed twins (driver queries ``tumble_count`` /
``slide_agg``) are oracle-checked, plus a stateful sessionization
operator.
"""

from . import events

__all__ = ["events"]
