"""The pipeline builder — this engine's analogue of a VRL program.

VRL's lifecycle is compile(source, fns) -> Program, then
Runtime::resolve(target, program) per event (reference
src/compiler/mod.rs:77-82, src/compiler/runtime.rs:96-128). Here the
"program" is built with a fluent Python API; ``build()`` performs the
compile-time checks VRL does (pattern pre-compilation, fallibility
accounting) and ``apply(df)`` emits the DataFrame DAG for Catalyst.

Fallibility (the load-bearing VRL semantic, src/compiler/compiler.rs:
49-62): any stage that can fail per-row marks the pipeline fallible;
a fallible pipeline REFUSES to build unless errors are handled —
either a ``dead_letter`` route exists or ``on_error='keep'`` was
chosen explicitly. That is VRL's "unhandled fallible expression is a
compile error" rule, relocated to the builder.

Errors are data: a failing row gets ``error`` set and flows on; rows
never throw (Infallible-assignment semantics,
reference src/compiler/expression/assignment.rs:531-548).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vrl_spark.grok import compile_grok


@dataclass
class _Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    fallible: bool = False


@dataclass
class Pipeline:
    name: str = "pipeline"
    stages: list[_Stage] = field(default_factory=list)
    routes: list[tuple[str, Column]] | None = None
    default_route: str = "ok"
    on_error: str = "route"  # 'route' (to dead_letter) | 'keep'
    _built: bool = False

    # -- stage constructors -------------------------------------------

    def _add(self, name, fn, fallible=False) -> "Pipeline":
        self.stages.append(_Stage(name, fn, fallible))
        return self

    def derive(self, **cols: Column) -> "Pipeline":
        """Infallible column derivations (VRL infallible assignment)."""
        return self._add(
            "derive", lambda df: df.select("*", *[c.alias(n) for n, c in cols.items()])
        )

    def parse_grok(
        self, src: str, pattern: str, prefix: str = "", anchored: bool = True,
        error: str = "unable to parse input with grok pattern",
    ) -> "Pipeline":
        """Grok-extract ``src`` into columns (compiled NOW — bad
        patterns fail at build, like VRL compile). Fallible: no-match
        rows get ``error`` set."""
        compiled = compile_grok(pattern)  # compile-time, raises here
        from vrl_spark.functions.parse import onepass_stage

        def fn(df: DataFrame) -> DataFrame:
            tmp = f"_g_{prefix or src}"
            # Generate-barrier extraction: one regex pass per row
            # regardless of projected field count (parse.onepass_stage).
            df = onepass_stage(df, tmp, F.col(src), compiled, anchored=anchored)
            out = df.select(
                "*",
                *[
                    F.col(tmp).getField(f).alias(prefix + f)
                    for f in compiled.fields
                ],
            )
            return _merge_error(out, F.col(tmp).isNull(), error).drop(tmp)

        return self._add(f"parse_grok({src})", fn, fallible=True)

    def parse_groks(
        self, src: str, patterns: list[str], prefix: str = "",
        aliases: dict[str, str] | None = None,
        alias_sources: list[str] | None = None,
        anchored: bool = True,
        error: str = "unable to parse input with grok patterns",
    ) -> "Pipeline":
        """Ordered rule-LIST extraction (parse_groks.rs): patterns are
        tried first-match-wins, output is the union of all patterns'
        fields. Compile-time: bad patterns/aliases raise here."""
        from vrl_spark.functions.parse import parse_groks_stage

        # compile eagerly so bad patterns fail at BUILD, like parse_grok
        from vrl_spark.grok import compile_grok

        import json as _json

        vocab: dict[str, str] = {}
        for s_ in alias_sources or []:
            with open(s_) as fh:
                vocab.update(_json.load(fh))
        vocab.update(aliases or {})
        probe_fields: list[str] = []
        for p in patterns:
            for f_ in compile_grok(p, extra_patterns=vocab).fields:
                if f_ not in probe_fields:
                    probe_fields.append(f_)

        def fn(df: DataFrame) -> DataFrame:
            tmp = f"_gs_{prefix or src}"
            df = parse_groks_stage(
                df, tmp, F.col(src), patterns,
                aliases=aliases, alias_sources=alias_sources, anchored=anchored,
            )
            out = df.select(
                "*",
                *[
                    F.col(tmp).getField(f_).alias(prefix + f_)
                    for f_ in probe_fields
                ],
            )
            return _merge_error(out, F.col(tmp).isNull(), error).drop(tmp)

        return self._add(f"parse_groks({src})", fn, fallible=True)

    def parse_key_value(self, src: str, dest: str = "kv") -> "Pipeline":
        from vrl_spark.functions.parse import parse_key_value_native

        return self._add(
            f"parse_kv({src})",
            lambda df: df.withColumn(dest, parse_key_value_native(F.col(src))),
        )

    def parse_timestamp(self, src: str, fmt: str, dest: str) -> "Pipeline":
        from vrl_spark.functions.parse import parse_timestamp

        def fn(df: DataFrame) -> DataFrame:
            out = df.withColumn(dest, parse_timestamp(F.col(src), fmt))
            return _merge_error(
                out, F.col(src).isNotNull() & F.col(dest).isNull(),
                f"unable to parse timestamp with {fmt}",
            )

        return self._add(f"parse_timestamp({src})", fn, fallible=True)

    def coerce(self, src: str, to: str, dest: str | None = None) -> "Pipeline":
        """VRL to_int/to_float/to_bool with exact null/error semantics."""
        from vrl_spark.functions import coerce as co

        dest = dest or f"{src}_{to}"

        def fn(df: DataFrame) -> DataFrame:
            dtype = df.schema[src.split(".")[0]].dataType
            builder = {"int": co.to_int, "float": co.to_float, "bool": co.to_bool,
                       "string": co.to_string}[to]
            return df.withColumn(dest, builder(F.col(src), dtype))

        return self._add(f"coerce({src}->{to})", fn, fallible=to != "string")

    def enrich(
        self, lookup: DataFrame, left_on: str | Column, right_on: str,
        case_insensitive: bool = False,
    ) -> "Pipeline":
        """Broadcast-hash-join enrichment (VRL enrichment-table
        find_table_row semantics: key equality, miss -> nulls)."""

        def fn(df: DataFrame) -> DataFrame:
            lk = F.col(left_on) if isinstance(left_on, str) else left_on
            rk = F.col(right_on)
            if case_insensitive:
                lk, rk = F.lower(lk), F.lower(rk)
            return df.join(F.broadcast(lookup), lk == rk, "left").drop(right_on)

        return self._add("enrich", fn)

    def filter(self, pred: Column) -> "Pipeline":
        return self._add("filter", lambda df: df.where(pred))

    def route(self, routes: list[tuple[str, Column]], otherwise: str = "ok") -> "Pipeline":
        """First-match-wins routing (Vector route transform / VRL
        if-else chain). Rows with a pending ``error`` go to
        ``dead_letter`` before any user predicate (abort semantics)."""
        self.routes = routes
        self.default_route = otherwise
        return self

    # -- compile & run --------------------------------------------------

    def build(self) -> "Pipeline":
        """Compile-time checks (VRL: unhandled fallible expression is
        a compile error)."""
        fallible = any(s.fallible for s in self.stages)
        if fallible and self.on_error == "route" and self.routes is None:
            raise ValueError(
                f"pipeline {self.name!r} has fallible stages but no route(); "
                "add .route(...) (errors go to dead_letter) or set "
                "on_error='keep' to keep error rows inline"
            )
        self._built = True
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        if not self._built:
            self.build()
        if "error" not in df.columns:
            df = df.withColumn("error", F.lit(None).cast("string"))
        for stage in self.stages:
            df = stage.fn(df)
        if self.routes is not None:
            route = F.when(F.col("error").isNotNull(), "dead_letter")
            for name, pred in self.routes:
                route = route.when(pred, name)
            df = df.withColumn("route", route.otherwise(self.default_route))
        return df

    def sinks(self, df: DataFrame, out_dir: str) -> None:
        """Single-pass partitioned fan-out write."""
        self.apply(df).write.mode("overwrite").partitionBy("route").parquet(out_dir)

    def explain(self) -> str:
        lines = [f"Pipeline {self.name!r}:"]
        for i, s in enumerate(self.stages):
            flag = " [fallible]" if s.fallible else ""
            lines.append(f"  {i}. {s.name}{flag}")
        if self.routes is not None:
            names = ["dead_letter"] + [n for n, _ in self.routes] + [self.default_route]
            lines.append(f"  routes: {names}")
        return "\n".join(lines)


def _merge_error(df: DataFrame, failed: Column, message: str) -> DataFrame:
    """First error wins (VRL returns the first failure it hits)."""
    return df.withColumn(
        "error",
        F.coalesce(F.col("error"), F.when(failed, F.lit(message))),
    )
