"""Grok pattern compiler: ``%{NAME:field}`` templates -> plain regex.

VRL compiles grok patterns ONCE at program-compile time and matches
per event (reference src/stdlib/parse_grok.rs:148-169, 11-25). We do
the same, but driver-side: the compiled regex (a plain string with
named groups) is serialized into the Spark plan, so executors never
pay compile cost per row, and simple patterns lower to JVM-side
``regexp_extract`` (no Python at all on the hot path).

The pattern library below is an original, compact implementation of
the well-known public grok vocabulary (the names — INT, IP,
HTTPDATE, LOGLEVEL, ... — are the de-facto standard from
logstash/grok, public knowledge). It is NOT copied from the
reference's bundled pattern files.

Grammar handled: ``%{NAME}``, ``%{NAME:field}``, ``%{NAME:field:type}``
(type hints ``int``/``float`` recorded for post-coercion, mirroring
the reference's per-field filters, src/datadog/grok/grok_filter.rs).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- base vocabulary -------------------------------------------------
# Each entry is itself a grok template (may reference other entries).
GROK_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "POSINT": r"[1-9]\d*",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    # network
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"[0-9a-fA-F:]{2,39}",
    "IP": r"(?:%{IPV4}|%{IPV6})",
    "HOSTNAME": r"[a-zA-Z0-9](?:[a-zA-Z0-9_-]{0,62})?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9_-]{0,62})?)*",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "PATH": r"(?:/[\w.-]*)+",
    "URIPROTO": r"[a-zA-Z][a-zA-Z0-9+.-]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[\w\-.~%!$&'()*+,;=:@]*)+",
    "URIQUERY": r"[\w\-.~%!$&'()*+,;=:@/?]*",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?%{URIHOST}(?:%{URIPATH})?(?:\?%{URIQUERY})?",
    # dates / times
    "MONTH": r"Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "DAY": r"Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?",
    "YEAR": r"\d{4}|\d{2}",
    "HOUR": r"2[0123]|[01]?\d",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d|60)(?:[:.,]\d+)?",
    "TIME": r"(?:%{HOUR}):(?:%{MINUTE})(?::(?:%{SECOND}))?",
    "ISO8601_TIMEZONE": r"Z|[+-](?:%{HOUR})(?::?(?:%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"(?:%{YEAR})-(?:%{MONTHNUM})-(?:%{MONTHDAY})[T ](?:%{HOUR}):?(?:%{MINUTE})(?::?(?:%{SECOND}))?(?:%{ISO8601_TIMEZONE})?",
    "HTTPDATE": r"(?:%{MONTHDAY})/(?:%{MONTH})/(?:%{YEAR}):(?:%{TIME}) %{INT}",
    "SYSLOGTIMESTAMP": r"(?:%{MONTH}) +(?:%{MONTHDAY}) (?:%{TIME})",
    # logging
    "LOGLEVEL": r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?",
    "GLOG_LEVEL": r"[IWEF]",
    "CEF_FIELD": r"(?:[^|\\]|\\.)*",
    "MONTHNUM2": r"0[1-9]|1[0-2]",
    "MONTHDAY2": r"[0-3]\d",
    "SYSLOGPROG": r"%{WORD}(?:\[%{POSINT}\])?",
    # email / java / paths (standard public grok names)
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62})*",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z0-9_. -]+)",
    "JAVAMETHOD": r"(?:(<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/\w+)?",
    # MAC addresses
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    # URI additions
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "QS": r"%{QUOTEDSTRING}",
    # date/time additions
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"[A-Z]{1,5}|[+-]\d{4}",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"\d{14}",
    # syslog composites
    "SYSLOGFACILITY": r"<%{NONNEGINT}.%{NONNEGINT}>",
    "SYSLOGHOST": r"%{IPORHOST}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:syslog_timestamp} (?:%{SYSLOGFACILITY} )?"
        r"%{SYSLOGHOST:logsource} %{SYSLOGPROG}:"
    ),
    # AWS access-log shapes (public formats)
    "ELB_URIPATHQUERY": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "ELB_REQUEST_LINE": r'%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}',
    "ELB_ACCESS_LOG": (
        r"%{TIMESTAMP_ISO8601:elb_timestamp} %{NOTSPACE:elb} %{IP:clientip}:"
        r"%{POSINT:clientport} (?:%{IP:backendip}:%{POSINT:backendport}|-) "
        r"%{NUMBER:request_processing_time} %{NUMBER:backend_processing_time} "
        r"%{NUMBER:response_processing_time} %{NONNEGINT:response} "
        r"%{NONNEGINT:backend_response} %{NONNEGINT:received_bytes} "
        r'%{NONNEGINT:sent_bytes} "%{ELB_REQUEST_LINE}"'
    ),
    "S3_REQUEST_LINE": r"%{WORD:s3_verb} %{NOTSPACE:s3_request} HTTP/%{NUMBER:s3_httpversion}",
    "S3_ACCESS_LOG": (
        r"%{WORD:owner} %{NOTSPACE:bucket} \[%{HTTPDATE:s3_timestamp}\] "
        r"%{IP:s3_clientip} %{NOTSPACE:requester} %{NOTSPACE:request_id} "
        r'%{NOTSPACE:operation} %{NOTSPACE:key} (?:"%{S3_REQUEST_LINE}"|-) '
        r"%{NONNEGINT:s3_response} (?:-|%{NOTSPACE:error_code}) "
        r"(?:%{NONNEGINT:bytes_sent}|-) (?:%{NONNEGINT:object_size}|-) "
        r"(?:%{NONNEGINT:request_time_ms}|-) (?:%{NONNEGINT:turnaround_time_ms}|-) "
        r'(?:"%{DATA:referrer}"|-) (?:"%{DATA:s3_agent}"|-) (?:-|%{NOTSPACE:version_id})'
    ),
    # composite web-log patterns
    "COMMONAPACHELOG": (
        r'%{IPORHOST:client_ip} %{NOTSPACE:ident} %{NOTSPACE:user} '
        r'\[%{HTTPDATE:timestamp}\] "%{WORD:method} %{NOTSPACE:path} HTTP/%{NUMBER:http_version}" '
        r'%{NONNEGINT:status} (?:%{NONNEGINT:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": (
        r'%{COMMONAPACHELOG} "%{DATA:referrer}" "%{DATA:agent}"'
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")


@dataclass
class CompiledGrok:
    """A grok pattern lowered to one plain regex with ordered groups."""

    source: str
    regex: str                      # named-group regex (Python & Java compatible)
    fields: list[str] = field(default_factory=list)   # capture order
    type_hints: dict[str, str] = field(default_factory=dict)

    def group_index(self, name: str) -> int:
        """1-based capture-group index of ``name`` in ``regex``.

        Used for lowering to JVM ``regexp_extract(col, regex, idx)``.
        Only valid because compilation emits exactly one capturing
        group per field (everything else is non-capturing).
        """
        return self.fields.index(name) + 1


def compile_grok(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> CompiledGrok:
    """Expand a grok template into a single anchored-free regex.

    Named captures use ``(?<name>...)`` in the emitted regex only via
    the ``fields`` list — the regex itself uses plain groups so the
    identical string runs on Java (Spark), Python ``re``, and RE2
    (DuckDB oracle). Duplicate field names are rejected.
    """
    vocab = dict(GROK_PATTERNS)
    if extra_patterns:
        vocab.update(extra_patterns)

    fields: list[str] = []
    hints: dict[str, str] = {}

    def expand(template: str, depth: int) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep (cycle?)")

        def repl(m: re.Match) -> str:
            name, fld, hint = m.group(1), m.group(2), m.group(3)
            if name not in vocab:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            if fld:
                if fld in fields:
                    raise ValueError(f"duplicate grok field {fld!r}")
                # Reserve the outer field's slot BEFORE expanding the
                # inner pattern: the outer group opens first in the
                # emitted regex, so list order must match group-number
                # order even when the inner pattern itself contains
                # annotated fields (e.g. %{COMMONAPACHELOG:whole}).
                fields.append(fld)
                if hint:
                    hints[fld] = hint
                return f"({expand(vocab[name], depth + 1)})"
            return f"(?:{expand(vocab[name], depth + 1)})"

        return _GROK_REF.sub(repl, template)

    regex = expand(pattern, 0)
    re.compile(regex)  # validate eagerly, at "program compile time"
    return CompiledGrok(source=pattern, regex=regex, fields=fields, type_hints=hints)
