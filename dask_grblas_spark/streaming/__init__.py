"""Structured Streaming extension (the reference has NO streaming surface
— SURVEY.md section 1.1 — so this is a post-parity extension for the
events table): windowed aggregation and stateful sessionization."""

from .windows import (event_window_agg, load_events, sessionize,
                      stream_cdc_upsert, stream_dedup_counts,
                      stream_static_enrich, stream_user_profile,
                      streaming_sessionize)

__all__ = ["event_window_agg", "load_events", "sessionize",
           "stream_cdc_upsert", "stream_dedup_counts",
           "stream_static_enrich", "stream_user_profile",
           "streaming_sessionize"]
