"""Structured Streaming variants of the engine's continuous paths."""
