"""match_datadog_query (reference src/stdlib/match_datadog_query.rs).

The Datadog log-search syntax (public, documented at
docs.datadoghq.com/logs/explorer/search_syntax) compiled DRIVER-SIDE —
the reference also requires the query to be a compile-time constant —
into a plain Column predicate, so matching runs fully JVM-side.

Supported (covers the reference's examples and the common real-world
queries): bare terms (message word search), AND / OR / NOT (and ``-``
negation), parentheses, quoted phrases, ``@attribute:value`` facets
with ``*`` wildcards, tag facets ``key:value`` against a tags array,
range facets ``key:[a TO b]``, and numeric comparisons
``@attr:>n >=n <n <=n``.

Relational surface: the event object is a row, so the caller names the
columns: ``match_datadog_query(query, message=col, tags=col,
attrs={"name": col, ...})``. Unknown facets resolve to NULL (no
match), mirroring the reference's missing-path behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenizer --------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lpar>\()|(?P<rpar>\))|
        (?P<op>AND\b|OR\b|NOT\b)|
        (?P<neg>-)|
        (?P<facet>@?[\w.]+):(?P<fval>\[[^\]]*\]|"[^"]*"|[><]=?[\w.*-]+|[\w.*-]+)|
        (?P<quoted>"[^"]*")|
        (?P<term>[\w.*-]+)
    )""",
    re.VERBOSE,
)


@dataclass
class _Node:
    kind: str                 # 'and' | 'or' | 'not' | 'term' | 'facet'
    children: list | None = None
    text: str | None = None
    facet: str | None = None
    value: str | None = None


def _tokenize(q: str):
    pos, out = 0, []
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"unparseable datadog query at: {q[pos:]!r}")
            break
        pos = m.end()
        if m.group("lpar"):
            out.append(("(", None))
        elif m.group("rpar"):
            out.append((")", None))
        elif m.group("op"):
            out.append((m.group("op"), None))
        elif m.group("neg"):
            out.append(("NOT", None))
        elif m.group("facet"):
            out.append(("FACET", (m.group("facet"), m.group("fval"))))
        elif m.group("quoted"):
            out.append(("TERM", m.group("quoted")[1:-1]))
        else:
            out.append(("TERM", m.group("term")))
    return out


def _parse(tokens: list) -> _Node:
    """Precedence: NOT > AND (implicit between adjacent terms) > OR."""
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else (None, None)

    def parse_or():
        nonlocal pos
        left = parse_and()
        while peek()[0] == "OR":
            pos += 1
            left = _Node("or", [left, parse_and()])
        return left

    def parse_and():
        nonlocal pos
        left = parse_not()
        while peek()[0] in ("AND", "TERM", "FACET", "NOT", "("):
            if peek()[0] == "AND":
                pos += 1
            left = _Node("and", [left, parse_not()])
        return left

    def parse_not():
        nonlocal pos
        if peek()[0] == "NOT":
            pos += 1
            return _Node("not", [parse_not()])
        return parse_atom()

    def parse_atom():
        nonlocal pos
        kind, val = peek()
        if kind == "(":
            pos += 1
            node = parse_or()
            if peek()[0] != ")":
                raise ValueError("unbalanced parentheses in datadog query")
            pos += 1
            return node
        if kind == "TERM":
            pos += 1
            return _Node("term", text=val)
        if kind == "FACET":
            pos += 1
            return _Node("facet", facet=val[0], value=val[1])
        raise ValueError(f"unexpected token {kind} in datadog query")

    node = parse_or()
    if pos != len(tokens):
        raise ValueError("trailing tokens in datadog query")
    return node


# --- lowering ---------------------------------------------------------

def _wildcard_to_regex(v: str) -> str:
    return "^" + "".join(".*" if c == "*" else re.escape(c) for c in v) + "$"


def _facet_pred(
    name: str, raw: str, tags: Column | None, attrs: dict[str, Column]
) -> Column:
    is_attr = name.startswith("@")
    key = name[1:] if is_attr else name

    def value_pred(col: Column) -> Column:
        v = raw
        if v.startswith("[") and " TO " in v:
            lo, hi = v[1:-1].split(" TO ")
            lo, hi = lo.strip().strip('"'), hi.strip().strip('"')
            # Datadog ranges are numeric when both bounds parse as
            # numbers: compare as double (string-typed attr columns
            # would otherwise compare lexicographically and misorder
            # values of different digit lengths). try_cast keeps
            # non-numeric rows NULL -> coalesced to non-match upstream.
            try:
                lo_n, hi_n = float(lo), float(hi)
            except ValueError:
                return col.between(lo, hi)
            return col.try_cast("double").between(F.lit(lo_n), F.lit(hi_n))
        if v[:2] in (">=", "<="):
            num = F.lit(float(v[2:]))
            c = col.cast("double")
            return c >= num if v[0] == ">" else c <= num
        if v[0] in "<>":
            num = F.lit(float(v[1:]))
            c = col.cast("double")
            return c > num if v[0] == ">" else c < num
        v = v.strip('"')
        if "*" in v:
            return col.rlike(_wildcard_to_regex(v))
        return col == v

    if is_attr:
        col = attrs.get(key)
        if col is None:
            return F.lit(False)  # missing attribute never matches
        return F.coalesce(value_pred(col), F.lit(False))
    # tag facet: match any "key:value" entry of the tags array
    if tags is None:
        return F.lit(False)
    entry_val = lambda t: F.substring_index(t, ":", -1)  # noqa: E731
    entry_key = lambda t: F.substring_index(t, ":", 1)  # noqa: E731
    return F.coalesce(
        F.exists(tags, lambda t: (entry_key(t) == key) & value_pred(entry_val(t))),
        F.lit(False),
    )


def _lower(
    node: _Node, message: Column | None, tags: Column | None,
    attrs: dict[str, Column],
) -> Column:
    if node.kind == "or":
        return _lower(node.children[0], message, tags, attrs) | _lower(
            node.children[1], message, tags, attrs
        )
    if node.kind == "and":
        return _lower(node.children[0], message, tags, attrs) & _lower(
            node.children[1], message, tags, attrs
        )
    if node.kind == "not":
        return ~_lower(node.children[0], message, tags, attrs)
    if node.kind == "term":
        if message is None:
            return F.lit(False)
        # whole-token match within the message (datadog term search)
        pat = r"(^|\W)" + re.escape(node.text).replace(r"\*", r"\S*") + r"($|\W)"
        return F.coalesce(message.rlike(pat), F.lit(False))
    return _facet_pred(node.facet, node.value, tags, attrs)


def match_datadog_query(
    query: str,
    message: Column | None = None,
    tags: Column | None = None,
    attrs: dict[str, Column] | None = None,
) -> Column:
    """Compile ``query`` (at plan build — a malformed query raises
    HERE, like the reference's compile-time parse) and evaluate it
    against the named columns. Returns a non-null boolean Column."""
    ast = _parse(_tokenize(query))
    return _lower(ast, message, tags, attrs or {})
