"""Reusable column expressions and pure helpers."""
