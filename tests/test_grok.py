"""Grok compiler unit tests (pure Python — no Spark session).

Vectors model the reference's test_function! cases for parse_grok
(reference src/stdlib/parse_grok.rs:193-236): a parseable line yields
the expected captures; an ungrokkable line yields no match (= the
VRL error 'unable to parse input with grok pattern')."""

import re

import pytest

from vrl_spark.grok import GROK_PATTERNS, compile_grok


def test_simple_pattern_fields_in_order():
    c = compile_grok("%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:message}")
    assert c.fields == ["timestamp", "level", "message"]
    m = re.search(c.regex, "2020-10-02T23:22:12.223222Z info Hello world")
    assert m is not None
    assert m.group(c.group_index("timestamp")) == "2020-10-02T23:22:12.223222Z"
    assert m.group(c.group_index("level")) == "info"
    assert m.group(c.group_index("message")) == "Hello world"


def test_ungrokkable_no_match():
    # reference parse_grok.rs: "an ungrokkable message" -> error
    c = compile_grok("%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level}")
    assert re.search(c.regex, "an ungrokkable message") is None


def test_combined_apache_log():
    c = compile_grok("%{COMBINEDAPACHELOG}")
    line = (
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"'
    )
    m = re.search(c.regex, line)
    assert m is not None
    got = {f: m.group(c.group_index(f)) for f in c.fields}
    assert got["client_ip"] == "127.0.0.1"
    assert got["user"] == "frank"
    assert got["method"] == "GET"
    assert got["status"] == "200"
    assert got["bytes"] == "2326"
    assert got["agent"] == "Mozilla/4.08 [en] (Win98; I ;Nav)"


def test_type_hints_recorded():
    c = compile_grok("%{NONNEGINT:status:int} %{NUMBER:dur:float}")
    assert c.type_hints == {"status": "int", "dur": "float"}


def test_unknown_pattern_raises():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_duplicate_field_raises():
    with pytest.raises(ValueError):
        compile_grok("%{INT:x} %{INT:x}")


def test_all_vocab_patterns_compile():
    for name in GROK_PATTERNS:
        compile_grok("%{" + name + ":v}")


@pytest.mark.parametrize(
    "pat,text,expect",
    [
        ("%{IPV4:ip}", "at 10.1.2.3 end", "10.1.2.3"),
        ("%{URI:u}", "see https://u:p@example.com:8080/a/b?q=1 now", "https://u:p@example.com:8080/a/b?q=1"),
        ("%{HTTPDATE:d}", "[10/Oct/2000:13:55:36 -0700]", "10/Oct/2000:13:55:36 -0700"),
        ("%{SYSLOGTIMESTAMP:t}", "Jun  4 07:12:01 host", "Jun  4 07:12:01"),
        ("%{QUOTEDSTRING:q}", 'x "a \\"b\\" c" y', '"a \\"b\\" c"'),
        ("%{UUID:id}", "id=0e3f2a9e-59b0-4e2a-8c10-5a1f3c9b0d22;", "0e3f2a9e-59b0-4e2a-8c10-5a1f3c9b0d22"),
    ],
)
def test_vocab_extraction(pat, text, expect):
    c = compile_grok(pat)
    m = re.search(c.regex, text)
    assert m is not None, (pat, text)
    assert m.group(1) == expect


def test_annotated_composite_group_order():
    """Outer annotated field must take the group slot where its group
    OPENS — before any nested annotated fields (the round-1 bug: nested
    fields were numbered first, silently shifting every mapping)."""
    c = compile_grok("%{COMMONAPACHELOG:whole}")
    assert c.fields[0] == "whole"
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x.gif HTTP/1.0" 200 2326'
    m = re.match(c.regex, line)
    assert m is not None
    got = {f: m.group(i + 1) for i, f in enumerate(c.fields)}
    assert got["whole"] == line
    assert got["client_ip"] == "127.0.0.1"
    assert got["user"] == "frank"
    assert got["method"] == "GET"
    assert got["status"] == "200"
    assert got["bytes"] == "2326"


def test_annotated_composite_with_suffix_fields():
    c = compile_grok("%{COMBINEDAPACHELOG:all}")
    line = ('10.0.0.5 - - [10/Oct/2000:13:55:36 -0700] "POST /p HTTP/1.1" 404 12 '
            '"http://ref" "agent/1.0"')
    m = re.match(c.regex, line)
    assert m is not None
    got = {f: m.group(i + 1) for i, f in enumerate(c.fields)}
    assert got["all"] == line
    assert got["client_ip"] == "10.0.0.5"
    assert got["referrer"] == "http://ref"
    assert got["agent"] == "agent/1.0"


@pytest.mark.parametrize(
    "pat,text,expect",
    [
        ("%{EMAILADDRESS:e}", "mail from john.doe+tag@sub.example.com now",
         "john.doe+tag@sub.example.com"),
        ("%{MAC:m}", "if0 at 00:1b:44:11:3a:b7 up", "00:1b:44:11:3a:b7"),
        ("%{CISCOMAC:m}", "sw 0123.4567.89ab port", "0123.4567.89ab"),
        ("%{DATE_US:d}", "on 04/21/2024 at", "04/21/2024"),
        ("%{DATESTAMP:d}", "at 21.04.2024 13:55:36 end", "21.04.2024 13:55:36"),
        ("%{DATESTAMP_RFC2822:d}", "sent Tue, 10 Oct 2000 13:55:36 +0200 ok",
         "Tue, 10 Oct 2000 13:55:36 +0200"),
        ("%{JAVACLASS:c}", "com.example.Foo$Bar threw", "com.example.Foo$Bar"),
        ("%{UNIXPATH:p}", "read /var/log/app.log end", "/var/log/app.log"),
        ("%{URIPATHPARAM:u}", "GET /a/b?x=1&y=2 HTTP", "/a/b?x=1&y=2"),
        ("%{QS:q}", 'said "hello there" ok', '"hello there"'),
    ],
)
def test_extended_vocab_extraction(pat, text, expect):
    c = compile_grok(pat)
    m = re.search(c.regex, text)
    assert m is not None, (pat, text)
    assert m.group(1) == expect


def test_syslogbase_and_elb_composites():
    c = compile_grok("%{SYSLOGBASE} %{GREEDYDATA:message}")
    line = "Jun  4 07:12:01 host1.example.com sshd[123]: Accepted publickey for root"
    m = re.match(c.regex, line)
    assert m is not None
    got = {f: m.group(i + 1) for i, f in enumerate(c.fields)}
    assert got["syslog_timestamp"] == "Jun  4 07:12:01"
    assert got["logsource"] == "host1.example.com"
    assert got["message"] == "Accepted publickey for root"

    c = compile_grok("%{ELB_ACCESS_LOG}")
    line = ('2024-01-02T03:04:05.123456Z my-elb 10.0.0.1:54321 10.0.1.5:80 '
            '0.000073 0.001048 0.000057 200 200 0 29 "GET /index.html HTTP/1.1"')
    m = re.match(c.regex, line)
    assert m is not None
    got = {f: m.group(i + 1) for i, f in enumerate(c.fields)}
    assert got["elb"] == "my-elb"
    assert got["clientip"] == "10.0.0.1"
    assert got["response"] == "200"
    assert got["request"] == "/index.html"

    c = compile_grok("%{S3_ACCESS_LOG}")
    line = ('79a5 my-bucket [06/Feb/2019:00:00:38 +0000] 192.0.2.3 79a5 '
            '3E57427F3EXAMPLE REST.GET.VERSIONING - "GET /my-bucket?versioning HTTP/1.1" '
            '200 - 113 - 7 - "-" "S3Console/0.4" -')
    m = re.match(c.regex, line)
    assert m is not None
    got = {f: m.group(i + 1) for i, f in enumerate(c.fields)}
    assert got["bucket"] == "my-bucket"
    assert got["operation"] == "REST.GET.VERSIONING"
    assert got["s3_response"] == "200"
