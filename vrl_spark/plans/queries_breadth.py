"""Breadth oracle queries: the function families that previously had
pytest-only coverage get driver-checked DuckDB rows here.

Pattern (same as the vrl_parse_user_agent oracle): inputs are
SYNTHESIZED per row from doc_id, so every row exercises the parser
with a distinct line; the oracle derives the expected captures
ALGEBRAICALLY from doc_id (independent arithmetic/CASE SQL, not a
re-implementation of the parser) — a capture-group regression on the
Spark side can't hide.

Covers: parse_xml, parse_yaml, parse_ruby_hash, parse_cbor
(vrl_formats); parse_apache_log, parse_nginx_log, parse_cef,
parse_cef_extension, parse_aws_alb_log, parse_aws_vpc_flow_log,
parse_glog, parse_influxdb (vrl_presets_vendor); match_datadog_query
terms/wildcards/phrases/tag facets/attr ranges/boolean combos
(vrl_ddquery)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vrl_spark.registry import register
from vrl_spark.sources import read_table

# ---------------------------------------------------------------------
# vrl_formats: xml / yaml / ruby-hash / cbor -> canonical JSON strings
# ---------------------------------------------------------------------

_FORMATS_COLS_SQL = """
  '{"log": {"@id": "' || doc_id || '", "level": "' ||
    CASE doc_id % 3 WHEN 0 THEN 'info' WHEN 1 THEN 'warn' ELSE 'error' END ||
    '", "msg": "m-' || doc_id || '"}}' AS xml_json,
  '{"a": ' || doc_id || ', "flag": true, "list": ["x' || doc_id
    || '", "y"]}' AS yaml_json,
  '{"err": null, "retries": ' || (doc_id % 4) || ', "status": '
    || (doc_id % 5 + 200) || ', "user": "u' || doc_id || '"}' AS ruby_json,
  CASE WHEN doc_id % 2 = 0 THEN '{"a":1,"b":[true,null],"s":"hi"}'
       ELSE '[1,"x",false]' END AS cbor_json
"""


def _formats_cols():
    from vrl_spark.functions import formats

    d = F.col("doc_id")
    ds = d.cast("string")
    lvl = F.element_at(
        F.array(F.lit("info"), F.lit("warn"), F.lit("error")),
        (d % 3 + 1).cast("int"),
    )
    xml_in = F.concat(
        F.lit('<log id="'), ds, F.lit('"><level>'), lvl,
        F.lit("</level><msg>m-"), ds, F.lit("</msg></log>"),
    )
    yaml_in = F.concat(
        F.lit("a: "), ds, F.lit("\nlist:\n  - x"), ds,
        F.lit("\n  - y\nflag: true"),
    )
    ruby_in = F.concat(
        F.lit('{"status" => '), (d % 5 + 200).cast("string"),
        F.lit(', :user => "u'), ds, F.lit('", retries: '),
        (d % 4).cast("string"), F.lit(', "err" => nil}'),
    )
    # two fixed CBOR payloads (RFC 8949): map{a:1,b:[true,null],s:"hi"}
    # and array [1,"x",false]
    cbor_in = F.when(
        d % 2 == 0, F.unhex(F.lit("a3616101616282f5f66173626869"))
    ).otherwise(F.unhex(F.lit("83016178f4")))
    return [
        formats.parse_xml(xml_in).alias("xml_json"),
        formats.parse_yaml(yaml_in).alias("yaml_json"),
        formats.parse_ruby_hash(ruby_in).alias("ruby_json"),
        formats.parse_cbor(cbor_in).alias("cbor_json"),
    ]


# ---------------------------------------------------------------------
# vrl_presets_vendor: apache / nginx / cef / alb / vpc / glog / influx
# ---------------------------------------------------------------------

_VENDOR_COLS_SQL = """
  '10.0.' || (doc_id % 250) || '.7' AS apache_ip,
  CAST(200 + doc_id % 5 AS VARCHAR) AS apache_status,
  CAST(doc_id AS VARCHAR) AS apache_bytes,
  '/p/' || doc_id AS apache_path,
  'UA/' || (doc_id % 9) || '.0' AS apache_agent,
  CASE doc_id % 3 WHEN 0 THEN 'error' WHEN 1 THEN 'warn'
       ELSE 'notice' END AS nginx_severity,
  CAST(100 + doc_id % 50 AS VARCHAR) AS nginx_pid,
  'message number ' || doc_id AS nginx_message,
  'vendor' || (doc_id % 3) AS cef_vendor,
  'sig name ' || doc_id AS cef_name,
  CAST(doc_id % 10 AS VARCHAR) AS cef_severity,
  '10.0.0.' || (doc_id % 200) AS cef_src,
  CAST(doc_id AS VARCHAR) AS cef_spt,
  CAST(200 + doc_id % 5 AS VARCHAR) AS alb_status,
  'http://e.com/' || doc_id AS alb_url,
  'curl/8.' || (doc_id % 9) AS alb_ua,
  '172.31.' || (doc_id % 250) || '.5' AS vpc_src,
  CAST(22 + doc_id % 3 AS VARCHAR) AS vpc_dstport,
  CASE WHEN doc_id % 2 = 0 THEN 'ACCEPT' ELSE 'REJECT' END AS vpc_action,
  'main.go' AS glog_file,
  CAST(doc_id % 90 + 1 AS VARCHAR) AS glog_line,
  'msg ' || doc_id AS glog_message,
  'cpu' AS influx_measurement,
  'h' || (doc_id % 20) AS influx_host,
  CAST(1556813561098000000 + doc_id AS BIGINT) AS influx_ts
"""


def _vendor_cols():
    from vrl_spark.functions import presets

    d = F.col("doc_id")
    ds = d.cast("string")

    apache_line = F.concat(
        F.lit("10.0."), (d % 250).cast("string"), F.lit(".7 - frank "),
        F.lit('[10/Oct/2000:13:55:36 +0000] "GET /p/'), ds,
        F.lit(' HTTP/1.1" '), (d % 5 + 200).cast("string"), F.lit(" "), ds,
        F.lit(' "http://r.example/'), ds, F.lit('" "UA/'),
        (d % 9).cast("string"), F.lit('.0"'),
    )
    nginx_sev = F.element_at(
        F.array(F.lit("error"), F.lit("warn"), F.lit("notice")),
        (d % 3 + 1).cast("int"),
    )
    nginx_line = F.concat(
        F.lit("2021/06/03 09:30:17 ["), nginx_sev, F.lit("] "),
        (d % 50 + 100).cast("string"), F.lit("#"), (d % 7).cast("string"),
        F.lit(": *"), ds, F.lit(" message number "), ds,
    )
    cef_line = F.concat(
        F.lit("CEF:0|vendor"), (d % 3).cast("string"), F.lit("|prod|1."),
        (d % 10).cast("string"), F.lit("|"), ds, F.lit("|sig name "), ds,
        F.lit("|"), (d % 10).cast("string"), F.lit("|src=10.0.0."),
        (d % 200).cast("string"), F.lit(" spt="), ds,
    )
    alb_line = F.concat(
        F.lit("http 2018-07-02T22:23:00.186641Z app/lb/50dc6c495c0c9188 "
              "192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 "),
        (d % 5 + 200).cast("string"), F.lit(" 200 "),
        (d % 100 + 1).cast("string"), F.lit(" "), ds,
        F.lit(' "GET http://e.com/'), ds, F.lit(' HTTP/1.1" "curl/8.'),
        (d % 9).cast("string"),
        F.lit('" - - arn:aws:elasticloadbalancing:us-east-2:1:targetgroup/t/7 '
              '"Root=1-58337262-36d228ad5d99923122bbe354"'),
    )
    vpc_line = F.concat(
        F.lit("2 123456789010 eni-1235b8ca 172.31."),
        (d % 250).cast("string"), F.lit(".5 10.0."),
        (d % 250).cast("string"), F.lit(".9 "),
        (d % 500 + 1000).cast("string"), F.lit(" "),
        (d % 3 + 22).cast("string"), F.lit(" 6 "), (d % 50).cast("string"),
        F.lit(" "), ds,
        F.lit(" 1418530010 1418530070 "),
        F.when(d % 2 == 0, F.lit("ACCEPT")).otherwise(F.lit("REJECT")),
        F.lit(" OK"),
    )
    glog_line = F.concat(
        # thread_id is POSINT in the glog grammar: d+1 keeps row 0 valid
        F.lit("I0102 15:04:05.067890 "), (d + 1).cast("string"),
        F.lit(" main.go:"),
        (d % 90 + 1).cast("string"), F.lit("] msg "), ds,
    )
    influx_line = F.concat(
        F.lit("cpu,host=h"), (d % 20).cast("string"), F.lit(" usage="), ds,
        F.lit("i "), (F.lit(1556813561098000000) + d).cast("string"),
    )

    apache = presets.parse_apache_log(apache_line, "combined")
    nginx = presets.parse_nginx_log(nginx_line, "error")
    cef = presets.parse_cef(cef_line)
    cef_ext = presets.parse_cef_extension(cef_line)
    alb = presets.parse_aws_alb_log(alb_line)
    vpc = presets.parse_aws_vpc_flow_log(vpc_line)
    glog = presets.parse_glog(glog_line)
    influx = presets.parse_influxdb(influx_line)
    return [
        apache.getField("client_ip").alias("apache_ip"),
        apache.getField("status").alias("apache_status"),
        apache.getField("bytes").alias("apache_bytes"),
        apache.getField("path").alias("apache_path"),
        apache.getField("agent").alias("apache_agent"),
        nginx.getField("severity").alias("nginx_severity"),
        nginx.getField("pid").alias("nginx_pid"),
        nginx.getField("message").alias("nginx_message"),
        cef.getField("device_vendor").alias("cef_vendor"),
        cef.getField("name").alias("cef_name"),
        cef.getField("severity").alias("cef_severity"),
        F.element_at(cef_ext, "src").alias("cef_src"),
        F.element_at(cef_ext, "spt").alias("cef_spt"),
        alb.getField("elb_status_code").alias("alb_status"),
        alb.getField("request_url").alias("alb_url"),
        alb.getField("user_agent").alias("alb_ua"),
        vpc.getField("srcaddr").alias("vpc_src"),
        vpc.getField("dstport").alias("vpc_dstport"),
        vpc.getField("action").alias("vpc_action"),
        glog.getField("file").alias("glog_file"),
        glog.getField("line").alias("glog_line"),
        glog.getField("message").alias("glog_message"),
        influx.getField("measurement").alias("influx_measurement"),
        F.element_at(influx.getField("tags"), "host").alias("influx_host"),
        influx.getField("timestamp").alias("influx_ts"),
    ]


# ---------------------------------------------------------------------
# vrl_ddquery: match_datadog_query predicate compiler, per-row verdicts
# ---------------------------------------------------------------------

_DDQUERY_COLS_SQL = """
  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS m_term,
  CASE WHEN CAST(doc_id AS VARCHAR) LIKE '1%' THEN 1 ELSE 0 END AS m_wild,
  CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS m_phrase,
  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS m_tag,
  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS m_tagwild,
  CASE WHEN (doc_id * 7) % 600 BETWEEN 100 AND 299 THEN 1 ELSE 0 END AS m_range,
  CASE WHEN (doc_id * 7) % 600 > 500 THEN 1 ELSE 0 END AS m_gt,
  CASE WHEN doc_id % 10 = 1 THEN 1 ELSE 0 END AS m_namewild,
  CASE WHEN doc_id % 3 IN (0, 2) AND doc_id % 2 = 0 THEN 1 ELSE 0 END AS m_bool,
  CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS m_not
"""


def _ddquery_cols():
    from vrl_spark.functions.ddquery import match_datadog_query as mdq

    d = F.col("doc_id")
    ds = d.cast("string")
    message = F.concat(
        F.element_at(
            F.array(
                F.lit("error timeout contacting host-"),
                F.lit("ok response from host-"),
                F.lit("warning slow response from host-"),
            ),
            (d % 3 + 1).cast("int"),
        ),
        ds,
    )
    region = F.element_at(
        F.array(F.lit("us-east"), F.lit("us-west"), F.lit("us-central")),
        (d % 3 + 1).cast("int"),
    )
    tags = F.array(
        F.concat(
            F.lit("env:"),
            F.when(d % 2 == 0, F.lit("prod")).otherwise(F.lit("dev")),
        ),
        F.concat(F.lit("region:"), region),
        F.concat(F.lit("team:t"), (d % 5).cast("string")),
    )
    attrs = {
        "code": ((d * 7) % 600).cast("string"),
        "name": F.concat(F.lit("svc-"), (d % 10).cast("string")),
    }

    def b(q, **kw):
        return mdq(q, **kw).cast("long")

    return [
        b("error", message=message).alias("m_term"),
        b("host-1*", message=message).alias("m_wild"),
        b('"slow response"', message=message).alias("m_phrase"),
        b("env:prod", tags=tags).alias("m_tag"),
        b("region:us-e*", tags=tags).alias("m_tagwild"),
        b("@code:[100 TO 299]", attrs=attrs).alias("m_range"),
        b("@code:>500", attrs=attrs).alias("m_gt"),
        b("@name:svc-1*", attrs=attrs).alias("m_namewild"),
        b("(error OR warning) AND env:prod", message=message, tags=tags).alias("m_bool"),
        b("NOT error", message=message).alias("m_not"),
    ]


# ---------------------------------------------------------------------
# the single registered breadth query: all three families in ONE
# map-only select over documents (merged r3 queries vrl_formats +
# vrl_presets_vendor + vrl_ddquery — the driver's correctness check
# covers at most 50 registry entries, so the breadth families share a
# vehicle; every function still runs and every capture is still
# value-checked)
# ---------------------------------------------------------------------

def _breadth_oracle() -> str:
    return (
        "SELECT doc_id, "
        + _FORMATS_COLS_SQL.strip().rstrip(",")
        + ", "
        + _VENDOR_COLS_SQL.strip().rstrip(",")
        + ", "
        + _DDQUERY_COLS_SQL.strip().rstrip(",")
        + ", "
        + _PROTO_COLS_SQL.strip().rstrip(",")
        + " FROM documents"
    )


def vrl_breadth(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id", *_formats_cols(), *_vendor_cols(), *_ddquery_cols(),
        *_proto_cols(),
    )


# ---------------------------------------------------------------------
# parse_proto / encode_proto columns (r4): a per-row round-trip
# through the wire format plus a frozen wire-bytes vector. The
# descriptor set is built by proto.build_descriptor_set (the same
# FileDescriptorSet artifact protoc emits); the oracle constructs the
# expected sorted-key JSON analytically and carries the frozen hex.
# ---------------------------------------------------------------------

def _proto_desc():
    from vrl_spark.functions.proto import build_descriptor_set

    return build_descriptor_set([{
        "name": "ev.proto", "package": "ev",
        "message_type": [{"name": "Ev", "field": [
            {"name": "s", "number": 1, "type": 9},
            {"name": "nums", "number": 2, "type": 5, "label": 3},
            {"name": "color", "number": 3, "type": 14,
             "type_name": ".ev.Color"},
        ]}],
        "enum_type": [{"name": "Color", "value": [
            {"name": "RED", "number": 0}, {"name": "BLUE", "number": 1},
        ]}],
    }])


_PROTO_VECTOR_HEX = "0A0C70726F746F2D766563746F72100710011801"
_PROTO_VECTOR_JSON = '{"color":"BLUE","nums":[7,1],"s":"proto-vector"}'

_PROTO_COLS_SQL = """
  '{"color":"' || CASE WHEN doc_id % 2 = 0 THEN 'RED' ELSE 'BLUE' END
    || '","nums":[' || CAST(doc_id % 5 AS VARCHAR) || '],"s":"ev'
    || CAST(doc_id AS VARCHAR) || '"}' AS proto_roundtrip,
  '{PROTO_HEX}' AS proto_vector_hex
""".replace("{PROTO_HEX}", _PROTO_VECTOR_HEX)


def _proto_cols():
    from vrl_spark.functions import formats as FM

    desc = _proto_desc()
    d = F.col("doc_id")
    src_json = F.concat(
        F.lit('{"s":"ev'), d.cast("string"),
        F.lit('","nums":['), (d % 5).cast("string"),
        F.lit('],"color":"'),
        F.when(d % 2 == 0, "RED").otherwise("BLUE"),
        F.lit('"}'),
    )
    return [
        FM.parse_proto(
            FM.encode_proto(src_json, desc, "ev.Ev"), desc, "ev.Ev"
        ).alias("proto_roundtrip"),
        # the frozen wire-bytes vector is COMPUTED by encode_proto on
        # a constant (tiny message — cheaper than a broadcast join
        # would be); a one-sided encoder/decoder bug cannot hide
        # behind the round-trip column
        F.hex(
            FM.encode_proto(F.lit(_PROTO_VECTOR_JSON), desc, "ev.Ev")
        ).alias("proto_vector_hex"),
    ]


# registration happens here, after every column family (including the
# proto columns above) is defined, keeping the registry order stable
register("vrl_breadth", _breadth_oracle())(vrl_breadth)
