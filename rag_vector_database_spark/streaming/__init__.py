"""Structured Streaming mirrors of the engine's incremental semantics."""
