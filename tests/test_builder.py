"""Pipeline builder: compile-time fallibility enforcement, errors-as-
data flow, routing, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrl_spark.pipeline import Pipeline


@pytest.fixture()
def logs(spark):
    rows = [
        (1, '10.0.0.1 - u1 [10/Oct/2020:13:55:36 +0000] "GET /a HTTP/1.1" 200 123'),
        (2, '10.0.0.2 - u2 [10/Oct/2020:13:55:37 +0000] "POST /b HTTP/1.1" 500 45'),
        (3, "not a log line at all"),
    ]
    return spark.createDataFrame(rows, ["id", "line"])


ACCESS = (
    '%{IPV4:ip} - %{USER:user} \\[%{HTTPDATE:ts}\\] '
    '"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:ver}" '
    '%{NONNEGINT:status} %{NONNEGINT:bytes}'
)


def test_fallible_without_route_refuses_to_build(logs):
    p = Pipeline("p").parse_grok("line", ACCESS, anchored=True)
    with pytest.raises(ValueError, match="fallible"):
        p.build()


def test_bad_grok_fails_at_build_time():
    with pytest.raises(KeyError):
        Pipeline("p").parse_grok("line", "%{DOESNOTEXIST:x}")


def test_errors_are_data_and_route(logs):
    p = (
        Pipeline("weblog")
        .parse_grok("line", ACCESS, anchored=True)
        .coerce("status", "int")
        .route(
            [("server_error", F.col("status_int") >= 500)],
            otherwise="ok",
        )
    )
    out = {r["id"]: r for r in p.apply(logs).collect()}
    assert out[1]["route"] == "ok" and out[1]["status_int"] == 200
    assert out[2]["route"] == "server_error"
    assert out[3]["route"] == "dead_letter"
    assert out[3]["error"] == "unable to parse input with grok pattern"
    assert out[1]["error"] is None


def test_on_error_keep_builds_without_route(logs):
    p = Pipeline("keep", on_error="keep").parse_grok("line", ACCESS, anchored=True)
    out = p.apply(logs)
    assert "route" not in out.columns
    assert out.where(F.col("error").isNotNull()).count() == 1


def test_enrich_and_timestamp(spark, logs):
    dim = spark.createDataFrame(
        [("GET", "read"), ("POST", "write")], ["m", "kind"]
    )
    p = (
        Pipeline("e")
        .parse_grok("line", ACCESS, anchored=True)
        .parse_timestamp("ts", "%d/%b/%Y:%H:%M:%S %z", "ts_parsed")
        .enrich(dim, left_on="method", right_on="m")
        .route([], otherwise="ok")
    )
    out = {r["id"]: r for r in p.apply(logs).collect()}
    assert out[1]["kind"] == "read"
    assert out[2]["kind"] == "write"
    assert str(out[1]["ts_parsed"]) == "2020-10-10 13:55:36"
    assert out[3]["ts_parsed"] is None  # src null -> no new error


def test_explain(logs):
    p = (
        Pipeline("x")
        .parse_grok("line", ACCESS)
        .coerce("status", "int")
        .route([("e", F.col("status_int") >= 500)])
    )
    text = p.explain()
    assert "parse_grok(line) [fallible]" in text
    assert "dead_letter" in text


def test_multimodal_plumbing(spark):
    from vrl_spark.operators import multimodal

    rows = [(i, bytes([i]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "media"])
    feats = multimodal.decode_images(df).collect()
    assert len(feats) == 20
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[3]["meta"]["byte_len"] == 103
    assert len(by_id[3]["embedding"]) == 8
    # determinism: same bytes -> same features
    feats2 = multimodal.decode_images(df).collect()
    assert {r["doc_id"]: r["meta"]["content_sha"] for r in feats2} == {
        r["doc_id"]: r["meta"]["content_sha"] for r in feats
    }
    frames = multimodal.frame_sample(df, every_n=1).collect()
    assert len(frames) == sum(max(1, (100 + i) // 64) for i in range(20))
