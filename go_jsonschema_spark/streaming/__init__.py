"""Structured Streaming validation: the same compiled constraint plan
applied to unbounded inputs."""
