"""Structured Streaming ingestion for the KG pipeline.

The reference is batch-only (SURVEY.md §2.10); this package is the
engine's forward path for continuously-arriving transcripts: file-source
micro-batches → watermarked event-time aggregation → per-batch KG
extraction with exactly-once checkpointing.
"""
