"""VRL stdlib re-expressed as Spark Column-expression builders.

Layout mirrors the reference's category split (src/stdlib/mod.rs):

- coerce        to_int / to_float / to_bool / to_string / is_* predicates
- strings       case, contains, replace, slice, truncate, length, ...
- parse         parse_regex / parse_grok / parse_key_value / parse_url /
                parse_json / parse_timestamp / parse_duration / ...
- codec         encode/decode base64, hex, percent; hashes
- collections   merge, flatten, compact, push, unique, unnest, tally, ...
- math_ip       abs/ceil/floor/round/mod, ip_aton family, syslog lookups

Every function takes/returns ``pyspark.sql.Column`` so compositions
stay inside whole-stage codegen. Fallible functions follow the
two-column convention from the pipeline layer (value + error) or
return NULL-on-failure where the VRL test vectors specify it.
"""
