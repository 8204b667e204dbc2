"""Operators: the engine's dataflow vocabulary (SURVEY.md §2)."""
