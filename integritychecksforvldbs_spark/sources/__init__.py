"""Metadata sources: the engine's synthetic system catalog."""
