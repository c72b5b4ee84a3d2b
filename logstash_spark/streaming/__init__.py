"""Structured Streaming mode (SURVEY.md §2.7 streaming comparison)."""
