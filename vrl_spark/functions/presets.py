"""Preset-format parsers (reference src/stdlib/parse_{apache,nginx,
syslog,glog,klog,linux_authorization}*.rs) — each is a grok/regex
preset over the same one-pass extraction lowering, plus lightweight
user-agent / etld / tokens parsers.

All presets return a struct column of string captures (coercion is a
separate stage, like the reference where captures are strings)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vrl_spark.grok import compile_grok
from vrl_spark.functions.parse import parse_regex_onepass

# --- web server logs -------------------------------------------------

COMMON_LOG = compile_grok("%{COMMONAPACHELOG}")
COMBINED_LOG = compile_grok("%{COMBINEDAPACHELOG}")

# nginx error-log preset (parse_nginx_log.rs, format 'error')
NGINX_ERROR = compile_grok(
    r"%{YEAR:year}/%{MONTHNUM:month}/%{MONTHDAY:day} "
    r"%{TIME:time} \[%{LOGLEVEL:severity}\] %{POSINT:pid}#%{NONNEGINT:tid}: "
    r"(?:\*%{NONNEGINT:cid} )?%{GREEDYDATA:message}"
)


def parse_common_log(col: Column) -> Column:
    """src/stdlib/parse_common_log.rs"""
    return parse_regex_onepass(col, COMMON_LOG, anchored=True)


def parse_apache_log(col: Column, format: str = "combined") -> Column:
    """src/stdlib/parse_apache_log.rs — common/combined formats."""
    compiled = {"common": COMMON_LOG, "combined": COMBINED_LOG}[format]
    return parse_regex_onepass(col, compiled, anchored=True)


def parse_nginx_log(col: Column, format: str = "error") -> Column:
    """src/stdlib/parse_nginx_log.rs — combined/error formats."""
    compiled = {"combined": COMBINED_LOG, "error": NGINX_ERROR}[format]
    return parse_regex_onepass(col, compiled, anchored=True)


# --- syslog ----------------------------------------------------------

# RFC 3164: "<PRI>MMM dd HH:MM:SS host tag[pid]: message"
SYSLOG_3164 = compile_grok(
    r"(?:<%{NONNEGINT:pri}>)?%{SYSLOGTIMESTAMP:timestamp} %{NOTSPACE:hostname} "
    r"%{WORD:appname}(?:\[%{POSINT:procid}\])?: %{GREEDYDATA:message}"
)
# RFC 5424: "<PRI>VER TIMESTAMP HOST APP PROCID MSGID SD MSG"
SYSLOG_5424 = compile_grok(
    r"<%{NONNEGINT:pri}>%{POSINT:version} %{TIMESTAMP_ISO8601:timestamp} "
    r"%{NOTSPACE:hostname} %{NOTSPACE:appname} %{NOTSPACE:procid} "
    r"%{NOTSPACE:msgid} (?:-|\[[^\]]*\]) ?%{GREEDYDATA:message}"
)


def parse_syslog(col: Column) -> Column:
    """src/stdlib/parse_syslog.rs — 5424 first, 3164 fallback (the
    reference's syslog_loose behavior). Adds derived facility/severity
    from PRI (pri = facility*8 + severity).

    The fallback regex only runs on rows the 5424 pattern rejects
    (CaseWhen branches evaluate lazily): regex work per row is
    1 + miss_rate, like the weblog parse stage."""

    def shape(s: Column) -> Column:
        pri = s.getField("pri").try_cast("long")
        return F.struct(
            s.getField("timestamp").alias("timestamp"),
            s.getField("hostname").alias("hostname"),
            s.getField("appname").alias("appname"),
            s.getField("procid").alias("procid"),
            s.getField("message").alias("message"),
            (pri / 8).cast("long").alias("facility_code"),
            (pri % 8).alias("severity_code"),
        )

    s5 = parse_regex_onepass(col, SYSLOG_5424, anchored=True)
    s3 = parse_regex_onepass(col, SYSLOG_3164, anchored=True)
    return F.when(s5.isNotNull(), shape(s5)).otherwise(
        F.when(s3.isNotNull(), shape(s3))
    )


def parse_syslog_stage(df, col: Column, out: str = "syslog"):
    """DataFrame-level parse_syslog for wide projections.

    The Column form above embeds BOTH regexes inside one expression;
    projecting k fields from it re-evaluates them k times (Catalyst
    inlines struct extraction — see functions/parse.materialize). This
    variant runs each regex through a Generate barrier so the total
    regex work is 1 + 5424_miss_rate passes per row, then shapes the
    result from cheap attribute reads. Same output schema as
    ``parse_syslog``.
    """
    from vrl_spark.functions.parse import onepass_stage

    step = onepass_stage(df, "_s5", col, SYSLOG_5424, anchored=True)
    step = onepass_stage(
        step, "_s3", F.when(F.col("_s5").isNull(), col), SYSLOG_3164, anchored=True
    )

    def shape(s: Column) -> Column:
        pri = s.getField("pri").try_cast("long")
        return F.struct(
            s.getField("timestamp").alias("timestamp"),
            s.getField("hostname").alias("hostname"),
            s.getField("appname").alias("appname"),
            s.getField("procid").alias("procid"),
            s.getField("message").alias("message"),
            (pri / 8).cast("long").alias("facility_code"),
            (pri % 8).alias("severity_code"),
        )

    s5, s3 = F.col("_s5"), F.col("_s3")
    parsed = F.when(s5.isNotNull(), shape(s5)).otherwise(
        F.when(s3.isNotNull(), shape(s3))
    )
    return step.withColumn(out, parsed).drop("_s5", "_s3")


def parse_linux_authorization(col: Column) -> Column:
    """src/stdlib/parse_linux_authorization.rs — auth.log lines are
    3164 without PRI."""
    return parse_regex_onepass(col, SYSLOG_3164, anchored=True)


# --- google/kubernetes logs ------------------------------------------

# glog: "E0102 15:04:05.067890 123 file.go:42] message"
GLOG = compile_grok(
    r"%{GLOG_LEVEL:level}%{MONTHNUM2:month}%{MONTHDAY2:day} "
    r"%{TIME:time} +%{POSINT:thread_id} %{NOTSPACE:file}:%{POSINT:line}\] "
    r"%{GREEDYDATA:message}"
)


def parse_glog(col: Column) -> Column:
    """src/stdlib/parse_glog.rs"""
    return parse_regex_onepass(col, GLOG, anchored=True)


def parse_klog(col: Column) -> Column:
    """src/stdlib/parse_klog.rs — kubernetes klog == glog format."""
    return parse_regex_onepass(col, GLOG, anchored=True)


# --- user agent (regex-table 'fast' mode) ----------------------------

_UA_BROWSERS = [  # (family, regex with version group)
    ("Edge", r"Edg(?:e|A|iOS)?/(\d+[\d.]*)"),
    ("Opera", r"OPR/(\d+[\d.]*)"),
    ("Chrome", r"Chrome/(\d+[\d.]*)"),
    ("Firefox", r"Firefox/(\d+[\d.]*)"),
    ("Safari", r"Version/(\d+[\d.]*)(?=.*Safari)"),
    ("MSIE", r"MSIE (\d+[\d.]*)"),
    ("curl", r"curl/(\d+[\d.]*)"),
]
_UA_OS = [
    ("Windows", r"Windows NT (\d+[\d.]*)"),
    ("Android", r"Android (\d+[\d.]*)"),
    ("iOS", r"(?:iPhone|iPad).*OS (\d+[_\d]*)"),
    ("macOS", r"Mac OS X (\d+[_\d.]*)"),
    ("Linux", r"(Linux)"),
]
_UA_DEVICES = [
    ("iPhone", r"(iPhone)"), ("iPad", r"(iPad)"),
    ("Android", r"(Android)"), ("Mac", r"(Macintosh)"),
    ("PC", r"(Windows)"), ("Bot", r"([Bb]ot|[Ss]pider|[Cc]rawler)"),
]


def parse_user_agent(col: Column) -> Column:
    """src/stdlib/parse_user_agent.rs 'fast' mode: first-match regex
    tables -> struct{browser_family, browser_version, os_family,
    os_version, device_family}. when-cascades: pure JVM."""

    def cascade(table, version: bool):
        fam, ver = None, None
        for family, pat in table:
            hit = col.rlike(pat)
            fam = (F.when(hit, family) if fam is None else fam.when(hit, family))
            if version:
                v = F.regexp_extract(col, pat, 1)
                ver = (F.when(hit, v) if ver is None else ver.when(hit, v))
        return fam, ver

    bf, bv = cascade(_UA_BROWSERS, True)
    of, ov = cascade(_UA_OS, True)
    df_, _ = cascade(_UA_DEVICES, False)
    return F.struct(
        bf.alias("browser_family"),
        bv.alias("browser_version"),
        of.alias("os_family"),
        F.translate(ov, "_", ".").alias("os_version"),
        df_.alias("device_family"),
    )


# --- etld / tokens ----------------------------------------------------

# compact public-suffix sample: enough for web pipelines' common TLDs;
# real deployments broadcast the full PSL file as a lookup table.
_MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
]


def parse_etld(col: Column, plus_parts: int = 0) -> Column:
    """src/stdlib/parse_etld.rs — effective TLD (+N labels) of a
    hostname, using a broadcastable suffix table."""
    multi = None
    for s in _MULTI_SUFFIXES:
        hit = col.endswith("." + s) | (col == s)
        multi = F.when(hit, s) if multi is None else multi.when(hit, s)
    single = F.regexp_extract(col, r"\.([^.]+)$", 1)
    etld = multi.otherwise(F.when(single != "", single))
    if plus_parts > 0:
        # take etld + N preceding labels from the hostname
        n_et = F.size(F.split(etld, r"\."))
        parts = F.split(col, r"\.")
        total = F.size(parts)
        take = F.least(n_et + plus_parts, total)
        etld = F.array_join(
            F.slice(parts, total - take + 1, take), "."
        )
    return etld


def parse_tokens(col: Column) -> Column:
    """src/stdlib/parse_tokens.rs — split a log line into tokens:
    quoted strings and [bracketed] groups stay single tokens."""
    toks = F.regexp_extract_all(
        col, F.lit(r'"[^"]*"|\[[^\]]*\]|\S+'), 0
    )
    return F.transform(
        toks,
        lambda t: F.when(t.rlike(r'^".*"$|^\[.*\]$'),
                         F.substring(t, 2, F.length(t) - 2)).otherwise(t),
    )


# --- CEF (src/stdlib/parse_cef.rs) ------------------------------------

CEF = compile_grok(
    r"CEF:%{NONNEGINT:cef_version}\|%{CEF_FIELD:device_vendor}\|"
    r"%{CEF_FIELD:device_product}\|%{CEF_FIELD:device_version}\|"
    r"%{CEF_FIELD:signature_id}\|%{CEF_FIELD:name}\|%{CEF_FIELD:severity}\|"
    r"%{GREEDYDATA:extension}"
)


def parse_cef(col: Column) -> Column:
    """ArcSight CEF header -> struct; the extension tail is kv-parsed
    separately (parse_key_value) per the reference's two-layer shape."""
    return parse_regex_onepass(col, CEF, anchored=True)


def parse_cef_extension(col: Column) -> Column:
    """CEF extension 'k=v k2=v2' tail -> map."""
    from vrl_spark.functions.parse import parse_key_value_native

    return parse_key_value_native(parse_cef(col).getField("extension"))


# --- AWS ALB access log (src/stdlib/parse_aws_alb_log.rs) -------------

AWS_ALB = compile_grok(
    r'%{NOTSPACE:type} %{TIMESTAMP_ISO8601:timestamp} %{NOTSPACE:elb} '
    r'%{NOTSPACE:client_host} %{NOTSPACE:target_host} '
    r'%{NUMBER:request_processing_time} %{NUMBER:target_processing_time} '
    r'%{NUMBER:response_processing_time} %{NOTSPACE:elb_status_code} '
    r'%{NOTSPACE:target_status_code} %{NONNEGINT:received_bytes} '
    r'%{NONNEGINT:sent_bytes} "%{DATA:request_method} %{DATA:request_url} '
    r'%{DATA:request_protocol}" "%{DATA:user_agent}" %{NOTSPACE:ssl_cipher} '
    r'%{NOTSPACE:ssl_protocol} %{NOTSPACE:target_group_arn} '
    r'"%{DATA:trace_id}"%{GREEDYDATA:rest}'
)


def parse_aws_alb_log(col: Column) -> Column:
    """AWS ALB access log line -> struct of string captures."""
    return parse_regex_onepass(col, AWS_ALB, anchored=True)


# --- AWS VPC flow logs (src/stdlib/parse_aws_vpc_flow_log.rs) ---------

AWS_VPC_FLOW = compile_grok(
    r"%{NONNEGINT:version} %{NOTSPACE:account_id} %{NOTSPACE:interface_id} "
    r"%{NOTSPACE:srcaddr} %{NOTSPACE:dstaddr} %{NOTSPACE:srcport} "
    r"%{NOTSPACE:dstport} %{NOTSPACE:protocol} %{NOTSPACE:packets} "
    r"%{NOTSPACE:bytes} %{NONNEGINT:start} %{NONNEGINT:end} "
    r"%{NOTSPACE:action} %{NOTSPACE:log_status}"
)


def parse_aws_vpc_flow_log(col: Column) -> Column:
    """Default-format VPC flow log line -> struct ('-' fields stay
    strings; coercion is a separate stage)."""
    return parse_regex_onepass(col, AWS_VPC_FLOW, anchored=True)


def parse_aws_cloudwatch_log_subscription_message(col: Column) -> Column:
    """CloudWatch Logs subscription payload (JSON) -> typed struct
    (src/stdlib/parse_aws_cloudwatch_log_subscription_message.rs)."""
    schema = (
        "owner string, logGroup string, logStream string, "
        "subscriptionFilters array<string>, messageType string, "
        "logEvents array<struct<id:string, timestamp:long, message:string>>"
    )
    return F.from_json(col, schema)


# --- InfluxDB line protocol (src/stdlib/parse_influxdb.rs) ------------


def parse_influxdb(col: Column) -> Column:
    """'measurement,tag=v field=1i,other="x" 1556813561098000000'
    -> struct{measurement, tags map, fields map, timestamp long}.

    Unescaped-comma/space grammar (the overwhelmingly common case);
    escaped separators need the vectorized lane."""
    head = F.regexp_extract(col, r"^(\S+) ", 1)
    measurement = F.substring_index(head, ",", 1)
    # tags: everything after the first comma in the head token
    tags_str = F.when(
        head.contains(","),
        F.regexp_replace(head, r"^[^,]*,", ""),
    )
    fields_str = F.regexp_extract(col, r"^\S+ (.*?)(?: \d+)?$", 1)
    ts = F.regexp_extract(col, r" (\d+)$", 1).try_cast("long")
    tags = F.when(
        tags_str.isNotNull(), F.str_to_map(tags_str, F.lit(","), F.lit("="))
    )
    fields_raw = F.str_to_map(fields_str, F.lit(","), F.lit("="))
    # strip quotes from string field values; keep numeric suffixes raw
    fields = F.transform_values(
        fields_raw,
        lambda _, v: F.when(
            v.rlike('^".*"$'), F.substring(v, 2, F.length(v) - 2)
        ).otherwise(v),
    )
    ok = col.rlike(r"^\S+ \S")
    return F.when(
        ok,
        F.struct(
            measurement.alias("measurement"),
            tags.alias("tags"),
            fields.alias("fields"),
            ts.alias("timestamp"),
        ),
    )
