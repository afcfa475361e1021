"""Preset-format parser vectors (apache/nginx/syslog/glog/UA/etld)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vrl_spark.functions import presets as P


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_parse_common_log(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    d = one(spark, P.parse_common_log(F.lit(line))).asDict()
    assert d["client_ip"] == "127.0.0.1"
    assert d["user"] == "frank"
    assert d["method"] == "GET"
    assert d["status"] == "200"
    assert d["bytes"] == "2326"


def test_parse_apache_combined(spark):
    line = (
        '1.2.3.4 - - [10/Oct/2000:13:55:36 +0000] "POST /x HTTP/1.1" 404 12 '
        '"http://ref.example" "UA/1.0"'
    )
    d = one(spark, P.parse_apache_log(F.lit(line), "combined")).asDict()
    assert d["referrer"] == "http://ref.example"
    assert d["agent"] == "UA/1.0"
    assert d["ident"] == "-" and d["user"] == "-"


def test_parse_nginx_error(spark):
    line = (
        "2021/06/03 09:30:17 [error] 32700#32700: *6 open() failed (2: No such file)"
    )
    d = one(spark, P.parse_nginx_log(F.lit(line), "error")).asDict()
    assert d["severity"] == "error"
    assert d["pid"] == "32700"
    assert d["cid"] == "6"
    assert d["message"].startswith("open() failed")


def test_parse_syslog_5424(spark):
    line = (
        "<13>1 2020-03-13T20:45:38.119Z dynamicwireless.name non 2426 ID931 "
        "- Try to override the THX port!"
    )
    d = one(spark, P.parse_syslog(F.lit(line))).asDict()
    assert d["hostname"] == "dynamicwireless.name"
    assert d["appname"] == "non"
    assert d["procid"] == "2426"
    assert d["facility_code"] == 1 and d["severity_code"] == 5
    assert d["message"] == "Try to override the THX port!"


def test_parse_syslog_3164_fallback(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed on /dev/pts/8"
    d = one(spark, P.parse_syslog(F.lit(line))).asDict()
    assert d["hostname"] == "mymachine"
    assert d["appname"] == "su"
    assert d["procid"] == "230"
    assert d["facility_code"] == 4 and d["severity_code"] == 2
    assert one(spark, P.parse_syslog(F.lit("garbage"))) is None


def test_parse_glog(spark):
    line = "E0102 15:04:05.067890 1234 main.go:42] some error happened"
    d = one(spark, P.parse_glog(F.lit(line))).asDict()
    assert d["level"] == "E"
    assert d["month"] == "01" and d["day"] == "02"
    assert d["file"] == "main.go" and d["line"] == "42"
    assert d["message"] == "some error happened"


def test_parse_user_agent(spark):
    ua = (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36"
    )
    d = one(spark, P.parse_user_agent(F.lit(ua))).asDict()
    assert d["browser_family"] == "Chrome"
    assert d["browser_version"].startswith("91.0")
    assert d["os_family"] == "Windows"
    assert d["os_version"] == "10.0"
    assert d["device_family"] == "PC"
    bot = one(spark, P.parse_user_agent(F.lit("Googlebot/2.1"))).asDict()
    assert bot["device_family"] == "Bot"


def test_parse_etld(spark):
    assert one(spark, P.parse_etld(F.lit("sub.example.co.uk"))) == "co.uk"
    assert one(spark, P.parse_etld(F.lit("example.com"))) == "com"
    assert one(spark, P.parse_etld(F.lit("sub.example.co.uk"), plus_parts=1)) == "example.co.uk"
    assert one(spark, P.parse_etld(F.lit("a.b.example.com"), plus_parts=1)) == "example.com"
    assert one(spark, P.parse_etld(F.lit("localhost"))) is None


def test_parse_tokens(spark):
    line = '127.0.0.1 - [10/Oct/2000:13:55:36] "GET /path HTTP/1.1" 200'
    got = one(spark, P.parse_tokens(F.lit(line)))
    assert got == [
        "127.0.0.1", "-", "10/Oct/2000:13:55:36", "GET /path HTTP/1.1", "200",
    ]


def test_parse_cef(spark):
    line = (
        "CEF:0|Security|threatmanager|1.0|100|worm successfully stopped|10|"
        "src=10.0.0.1 dst=2.1.2.2 spt=1232"
    )
    d = one(spark, P.parse_cef(F.lit(line))).asDict()
    assert d["cef_version"] == "0"
    assert d["device_vendor"] == "Security"
    assert d["name"] == "worm successfully stopped"
    assert d["severity"] == "10"
    ext = one(spark, P.parse_cef_extension(F.lit(line)))
    assert ext == {"src": "10.0.0.1", "dst": "2.1.2.2", "spt": "1232"}


def test_parse_aws_alb_log(spark):
    line = (
        'http 2018-07-02T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 '
        '192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 '
        '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
        'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 '
        '"Root=1-58337262-36d228ad5d99923122bbe354" extra'
    )
    d = one(spark, P.parse_aws_alb_log(F.lit(line))).asDict()
    assert d["type"] == "http"
    assert d["elb"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert d["elb_status_code"] == "200"
    assert d["received_bytes"] == "34" and d["sent_bytes"] == "366"
    assert d["request_method"] == "GET"
    assert d["user_agent"] == "curl/7.46.0"
    assert d["trace_id"] == "Root=1-58337262-36d228ad5d99923122bbe354"


def test_parse_aws_vpc_flow_log(spark):
    line = ("2 123456789010 eni-1235b8ca123456789 172.31.16.139 172.31.16.21 "
            "20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK")
    d = one(spark, P.parse_aws_vpc_flow_log(F.lit(line))).asDict()
    assert d["srcaddr"] == "172.31.16.139"
    assert d["dstport"] == "22"
    assert d["action"] == "ACCEPT"
    # NODATA variant with '-' fields
    nodata = "2 123456789010 eni-1235b8ca123456789 - - - - - - - 1431280876 1431280934 - NODATA"
    d2 = one(spark, P.parse_aws_vpc_flow_log(F.lit(nodata))).asDict()
    assert d2["srcaddr"] == "-" and d2["log_status"] == "NODATA"


def test_parse_cloudwatch_subscription(spark):
    import json

    msg = json.dumps({
        "messageType": "DATA_MESSAGE", "owner": "111111111111",
        "logGroup": "test", "logStream": "stream",
        "subscriptionFilters": ["f1"],
        "logEvents": [{"id": "1", "timestamp": 1600000000000, "message": "hello"}],
    })
    d = one(spark, P.parse_aws_cloudwatch_log_subscription_message(F.lit(msg)))
    assert d["owner"] == "111111111111"
    assert d["logEvents"][0]["message"] == "hello"


def test_grok_filters(spark):
    from vrl_spark.functions import grok_filters as GF

    r = spark.range(1).select(
        GF.apply_filters(F.lit("1234"), ["integer"]).alias("i"),
        GF.apply_filters(F.lit("1e3"), ["integerExt"]).alias("ie"),
        GF.apply_filters(F.lit("12.5"), [("scale", 10)]).alias("sc"),
        GF.apply_filters(F.lit("N/A"), [("nullIf", "N/A")]).alias("ni"),
        GF.apply_filters(F.lit("MiXeD"), ["lowercase"]).alias("lc"),
        GF.apply_filters(F.lit("yes"), ["boolean"]).alias("b"),
        GF.apply_filters(F.lit("a%20b"), ["decodeuricomponent"]).alias("uri"),
        GF.apply_filters(F.lit("[a, b, c]"), [("array", ",")]).alias("arr"),
        GF.apply_filters(F.lit("k=v x=y"), ["keyvalue"]).alias("kv"),
        GF.apply_filters(
            F.lit("2020-10-02 13:05:00"), [("date", "%Y-%m-%d %H:%M:%S")]
        ).alias("dt"),
    ).collect()[0]
    assert r["i"] == 1234
    assert r["ie"] == 1000
    assert r["sc"] == 125.0
    assert r["ni"] is None
    assert r["lc"] == "mixed"
    assert r["b"] is True
    assert r["uri"] == "a b"
    assert r["arr"] == ["a", "b", "c"]
    assert r["kv"] == {"k": "v", "x": "y"}
    assert str(r["dt"]) == "2020-10-02 13:05:00"


def test_parse_influxdb(spark):
    line = 'cpu,host=serverA,region=us usage_idle=90.5,label="hi" 1556813561098000000'
    d = one(spark, P.parse_influxdb(F.lit(line))).asDict()
    assert d["measurement"] == "cpu"
    assert d["tags"] == {"host": "serverA", "region": "us"}
    assert d["fields"] == {"usage_idle": "90.5", "label": "hi"}
    assert d["timestamp"] == 1556813561098000000
    # no tags, no timestamp
    d2 = one(spark, P.parse_influxdb(F.lit("mem used=12"))).asDict()
    assert d2["measurement"] == "mem"
    assert d2["tags"] is None
    assert d2["fields"] == {"used": "12"}
    assert d2["timestamp"] is None
    assert one(spark, P.parse_influxdb(F.lit("justoneword"))) is None


def test_parse_etld_struct_reference_examples(spark, tmp_path):
    """parse_etld.rs examples: known suffix, +1 parts, unknown suffix,
    custom PSL file; plus wildcard/exception PSL rules."""
    from vrl_spark.functions.presets import parse_etld_struct

    df = spark.createDataFrame(
        [("sub.sussex.ac.uk",), ("vector.acmecorp",), ("foo.bar.bd",),
         ("www.ck",), ("shop.example.github.io",)],
        ["host"],
    )
    rows = {r["host"]: r for r in df.select(
        "host", parse_etld_struct(F.col("host")).alias("p0"),
        parse_etld_struct(F.col("host"), plus_parts=1).alias("p1"),
    ).collect()}
    r = rows["sub.sussex.ac.uk"]
    assert (r["p0"]["etld"], r["p0"]["etld_plus"], r["p0"]["known_suffix"]) == (
        "ac.uk", "ac.uk", True)
    assert r["p1"]["etld_plus"] == "sussex.ac.uk"
    r = rows["vector.acmecorp"]
    assert (r["p0"]["etld"], r["p0"]["known_suffix"]) == ("acmecorp", False)
    r = rows["foo.bar.bd"]       # *.bd wildcard
    assert (r["p0"]["etld"], r["p0"]["known_suffix"]) == ("bar.bd", True)
    r = rows["www.ck"]           # !www.ck exception under *.ck
    assert (r["p0"]["etld"], r["p0"]["known_suffix"]) == ("ck", True)
    r = rows["shop.example.github.io"]   # private suffix
    assert r["p1"]["etld_plus"] == "example.github.io"

    # custom PSL file (reference custom_public_suffix_list.dat analogue)
    psl_file = tmp_path / "custom.dat"
    psl_file.write_text("// ===BEGIN ICANN DOMAINS===\n\ncustomdev\n")
    got = spark.createDataFrame([("vector.customdev",), ("vector.acmecorp",)], ["h"]).select(
        "h", parse_etld_struct(F.col("h"), psl=str(psl_file)).alias("p")
    ).collect()
    by = {r["h"]: r["p"] for r in got}
    assert (by["vector.customdev"]["etld"], by["vector.customdev"]["known_suffix"]) == (
        "customdev", True)
    assert (by["vector.acmecorp"]["etld"], by["vector.acmecorp"]["known_suffix"]) == (
        "acmecorp", False)


def test_parse_user_agent_full_reference_examples(spark):
    """parse_user_agent.rs reliable + enriched example outputs."""
    from vrl_spark.functions.presets import parse_user_agent_full

    ie = "Mozilla/4.0 (compatible; MSIE 7.66; Windows NT 5.1; SV1; .NET CLR 1.1.4322)"
    opera = ("Opera/9.80 (J2ME/MIDP; Opera Mini/4.3.24214; iPhone; CPU iPhone OS "
             "4_2_1 like Mac OS X; AppleWebKit/24.783; U; en) Presto/2.5.25 Version/10.54")
    chrome = ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
              "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
    bot = "Googlebot/2.1 (+http://www.google.com/bot.html)"
    df = spark.createDataFrame([(ie,), (opera,), (chrome,), (bot,)], ["ua"])
    rows = {r["ua"]: r for r in df.select(
        "ua",
        parse_user_agent_full(F.col("ua"), "reliable").alias("r"),
        parse_user_agent_full(F.col("ua"), "enriched").alias("e"),
    ).collect()}

    r = rows[ie]["r"]
    assert r["browser"]["family"] == "Internet Explorer"
    assert r["browser"]["version"] == "7.66"
    assert r["device"]["category"] == "pc"
    assert r["os"]["family"] == "Windows XP"
    assert r["os"]["version"] == "NT 5.1"

    e = rows[opera]["e"]
    assert e["browser"]["family"] == "Opera Mini"
    assert (e["browser"]["major"], e["browser"]["minor"], e["browser"]["patch"]) == (
        "4", "3", "24214")
    assert e["browser"]["version"] == "10.54"
    assert e["device"]["brand"] == "Apple"
    assert e["device"]["category"] == "smartphone"
    assert e["device"]["family"] == "iPhone"
    assert e["device"]["model"] == "iPhone"
    assert e["os"]["family"] == "iOS"
    assert (e["os"]["major"], e["os"]["minor"], e["os"]["patch"]) == ("4", "2", "1")
    assert e["os"]["patch_minor"] is None
    assert e["os"]["version"] == "4.2.1"

    r = rows[chrome]["r"]
    assert r["browser"]["family"] == "Chrome"
    assert r["os"]["family"] == "Windows 10"
    assert r["device"]["category"] == "pc"

    r = rows[bot]["r"]
    assert r["device"]["category"] == "crawler"
