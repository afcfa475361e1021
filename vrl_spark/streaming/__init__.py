"""Structured Streaming face of the engine.

The reference is explicitly stateless per event (README.md:16-19 "VRL
is stateless ... each program processes a single event"), so every
scalar stage (parse/coerce/enrich/route) lifts to streaming UNCHANGED
— the same Column expressions applied to a streaming DataFrame.
What batch VRL never had (and Vector provides around it) is here
native: watermarked tumbling-window aggregates and checkpointed
exactly-once sinks."""

from vrl_spark.streaming.pipeline import (  # noqa: F401
    stream_pipeline,
    stream_from_directory,
    windowed_counts,
)
