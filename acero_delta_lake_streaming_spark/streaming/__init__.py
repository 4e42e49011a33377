"""Structured Streaming ingest + event-time operators (SURVEY.md §2.8)."""
