"""Scalar function families + LLM-data-pipeline operators (SURVEY.md §2 Part B)."""
