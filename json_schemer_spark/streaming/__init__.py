"""Incremental/streaming validation (reference is batch-only; this is the
engine's incremental-read extension — SURVEY.md §2.10)."""
