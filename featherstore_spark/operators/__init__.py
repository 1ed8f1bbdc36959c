"""Operators: the data-transforming core of the engine (SURVEY.md §2)."""
