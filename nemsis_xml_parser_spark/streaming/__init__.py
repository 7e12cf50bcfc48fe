"""Structured Streaming layer (SURVEY §2.I streaming row, M6):
watch-a-directory XML ingest as microbatches + event-stream operators."""
