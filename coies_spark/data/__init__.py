"""Deterministic synthetic data: transcripts corpora + gold fixtures."""
