"""vrl_spark — a PySpark-native remap-and-route analytics engine.

A brand-new engine with the event-transform capabilities of
vectordotdev/vrl (VRL, the Vector Remap Language), re-expressed
Spark-first: the "program" is a declarative DataFrame pipeline
(parse -> enrich -> route -> aggregate) built from Column-expression
lowerings of VRL's stdlib semantics, vectorized pandas/Arrow UDFs
where built-ins can't express the semantics, broadcast-hash-join
enrichment, when-cascade routing with partitioned multi-sink writes,
and windowed aggregates — all optimized by Catalyst/Tungsten/AQE.

Reference semantics citations in docstrings point into
/root/reference (path:line).
"""

from vrl_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
