"""Relational + streaming-window operator surface (SURVEY.md §2)."""
