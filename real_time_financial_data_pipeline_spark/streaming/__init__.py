"""Structured Streaming layer — the reference's pull-based micro-ingestion
(BackgroundTasks, routes.py:40,82) and its declared-but-absent real-time
aggregation, reimagined idiomatically (SURVEY.md §2.10)."""
