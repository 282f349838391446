"""Constraint-algebra and linear-algebra ops (SURVEY.md L1 layer)."""
