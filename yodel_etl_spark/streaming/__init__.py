"""Structured Streaming surface (SURVEY §2.9).

The reference's only streaming concern is SSE consumption with
last-value-wins + malformed-event skip (test_chat_assistant.py:23-78);
the engine generalizes to watermarked event-time windows, session
windows and streaming dedup — every transformation here is defined once
and runs identically in batch and streaming (same DataFrame ops), which
is how the batch DuckDB oracle can verify streaming semantics.
"""
