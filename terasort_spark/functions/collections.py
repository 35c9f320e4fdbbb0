"""Placeholder — operators land in a later milestone (SURVEY.md §7)."""
