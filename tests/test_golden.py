"""Golden fixture runner (SURVEY §5 level 2): JSON cases of
(input object, pipeline spec, expected row), mirroring the
reference's lib/tests `# object:` / `# result:` corpus shape."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrl_spark.pipeline import Pipeline

FIXTURES = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_fixtures.json"))
)["cases"]

ACCESS = (
    '%{IPV4:ip} - %{USER:user} \\[%{HTTPDATE:ts}\\] '
    '"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:ver}" '
    '%{NONNEGINT:status} %{NONNEGINT:bytes}'
)


def build_pipeline(spec: dict) -> Pipeline:
    p = Pipeline("golden")
    if "parse_grok" in spec:
        p = p.parse_grok(spec["parse_grok"]["src"], ACCESS, anchored=True)
    for src, to in spec.get("coerce", []):
        p = p.coerce(src, to)
    return p.route(
        [
            ("server_error", F.col("status_int") >= 500),
            ("client_error", F.col("status_int") >= 400),
        ],
        otherwise="ok",
    )


@pytest.mark.parametrize("case", FIXTURES, ids=[c["name"] for c in FIXTURES])
def test_golden(spark, case):
    schema = T.StructType([T.StructField("line", T.StringType())])
    df = spark.createDataFrame([(case["object"]["line"],)], schema)
    out = build_pipeline(case["pipeline"]).apply(df).collect()[0].asDict()
    for key, want in case["result"].items():
        assert out.get(key) == want, (case["name"], key, out.get(key), want)
