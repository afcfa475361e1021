"""Text extraction from raw page bytes — the byte-identical invariant.

``BASELINE.json.input_hint`` requires "byte-identical extracted text
per url" vs the reference's lossy UTF-8 decode. The reference decodes
raw bytes with U+FFFD replacement (`simdutf_bytes_utf8_lossy`,
reference src/value/value.rs:199-215) which implements the WHATWG/
Unicode "substitution of maximal subparts" policy — the SAME policy
as CPython's ``bytes.decode('utf-8', errors='replace')``.

Therefore the lowering is ONE Arrow-batched pandas UDF doing exactly
that decode — bytes go binary->str inside Python without ever
round-tripping through a JVM String (which would apply its own
replacement policy and could differ on truncated sequences).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def lossy_utf8_decode(col: Column) -> Column:
    """binary -> string with U+FFFD replacement, maximal-subpart
    semantics (identical to the reference's simdutf lossy decode)."""

    @pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)

    return _decode(col)


def extracted_text(html_col: Column) -> Column:
    """The pipeline's 'extracted text per url': lossy-decoded page
    bytes. (Real HTML tag stripping would layer on top; the byte-level
    decode is the contract checked against the reference.)"""
    return lossy_utf8_decode(html_col)
