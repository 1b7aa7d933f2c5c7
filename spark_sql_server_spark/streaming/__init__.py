"""Structured Streaming surface.

The reference has **no** streaming operators (verified across all 44
main source files, SURVEY.md §2.B "Streaming operators: none") — this
package is the designed extension: watermarked tumbling/session windows,
dedup-within-watermark, and a custom stateful operator via
``applyInPandasWithState``, all over the same events schema the batch
queries use, so batch and stream share semantics (the sessionization
stream is the streaming twin of ``q_events_sessionize``).
"""

from spark_sql_server_spark.streaming.pipeline import (
    enrich_events,
    view_click_attribution,
    events_stream,
    hourly_event_counts,
    sessionized_events,
    stream_dedup,
    user_running_totals,
    user_running_totals_exact,
)

__all__ = [
    "enrich_events",
    "view_click_attribution",
    "events_stream",
    "hourly_event_counts",
    "sessionized_events",
    "stream_dedup",
    "user_running_totals",
    "user_running_totals_exact",
]
