"""Scalar function library: string formats, text analysis, similarity."""
