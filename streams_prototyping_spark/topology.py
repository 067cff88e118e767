"""Kafka-Streams-shaped topology builder over DataFrames.

A thin compatibility veneer so a user of the reference can port their
topology line by line (stream -> mapValues -> groupBy -> windowedBy ->
aggregate -> mapValues -> toStream -> to) and get a Spark plan.
Every method is sugar over the DataFrame API — nothing here executes
outside Catalyst, and mixing in raw DataFrame code is always possible
via ``.df``.

The two reference apps reconstructed through this API are tested to
produce byte-identical results to the registered declarative queries
(tests/test_topology.py), which is the compatibility claim: same
topology text shape, same answers, Spark execution.

Deliberate differences from Kafka Streams (SURVEY §1.3/§4.3):
- keys are COLUMNS, not a privileged record key; ``select_key`` just
  marks which column later keyed ops default to. No repartition topics
  exist — Catalyst inserts exactly the shuffles the plan needs.
- per-record lambdas are replaced by Column expressions (JVM codegen),
  which is why this veneer adds zero overhead.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class KStreamLike:
    """An unbounded (or batch-twin) record stream with an optional
    current key column (reference KStream<K,V>)."""

    df: DataFrame
    key: str | None = None

    # -- stateless transforms -------------------------------------------
    def map_values(self, **exprs: Column) -> "KStreamLike":
        """mapValues: replace the value columns with computed ones,
        keeping the key column (reference Aggregations.java:86-94)."""
        keep = [F.col(self.key)] if self.key else []
        return replace(
            self, df=self.df.select(*keep, *[c.alias(n) for n, c in exprs.items()])
        )

    def filter(self, cond: Column) -> "KStreamLike":
        return replace(self, df=self.df.filter(cond))

    def select_key(self, col: str) -> "KStreamLike":
        """map((k,v) -> KeyValue(newKey, v)): rekey. No shuffle happens
        HERE — Catalyst shuffles at the next keyed operation, which is
        the optimization the reference performs by hand with
        repartition topics (StreamStreamJoin.java:72-83)."""
        return replace(self, key=col)

    # -- joins ----------------------------------------------------------
    def left_join(
        self, other: "KStreamLike", window_s: int, time_left: str, time_right: str
    ) -> "KStreamLike":
        """Windowed stream-stream left join on the current keys within
        +/-window_s (reference leftJoin + JoinWindows.of,
        StreamStreamJoin.java:85-95)."""
        if not self.key or not other.key:
            raise ValueError("both sides need a key (select_key) before a join")
        lk, rk = F.col(self.key), F.col(other.key)
        cond = (lk == rk) & F.col(time_right).between(
            F.col(time_left) - F.expr(f"INTERVAL {window_s} SECONDS"),
            F.col(time_left) + F.expr(f"INTERVAL {window_s} SECONDS"),
        )
        joined = self.df.join(other.df, cond, "left_outer")
        return replace(self, df=joined)

    # -- grouping / windowing / aggregation ------------------------------
    def group_by_key(self) -> "KGroupedLike":
        if not self.key:
            raise ValueError("no key set; use select_key or group_by")
        return KGroupedLike(df=self.df, keys=[self.key])

    def group_by(self, *cols: Column | str) -> "KGroupedLike":
        named = []
        df = self.df
        for i, c in enumerate(cols):
            if isinstance(c, str):
                named.append(c)
            else:
                alias = f"_gk{i}"
                df = df.withColumn(alias, c)
                named.append(alias)
        return KGroupedLike(df=df, keys=named)

    # -- egress ----------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self.df


@dataclass
class KGroupedLike:
    df: DataFrame
    keys: list[str]
    window: tuple[str, int] | None = None  # (time col, seconds)

    def windowed_by(self, time_col: str, window_s: int) -> "KGroupedLike":
        """windowedBy(TimeWindows.of(ms)) (Aggregations.java:97-98)."""
        return replace(self, window=(time_col, window_s))

    def aggregate(self, **aggs: Column) -> "KTableLike":
        """aggregate(initializer, adder): the hand-rolled fold becomes
        declarative aggregate expressions — Spark's partial/final
        HashAggregate IS the initializer+adder (SURVEY §4.1)."""
        group_cols = [F.col(k) for k in self.keys]
        win = None
        if self.window:
            tcol, secs = self.window
            win = F.window(tcol, f"{secs} seconds").alias("_w")
            group_cols = [win, *group_cols]
        out = self.df.groupBy(*group_cols).agg(
            *[c.alias(n) for n, c in aggs.items()]
        )
        return KTableLike(df=out, keys=self.keys, windowed=self.window is not None)


@dataclass
class KTableLike:
    """A continuously-updated table (reference KTable)."""

    df: DataFrame
    keys: list[str]
    windowed: bool = False

    def map_values(self, **exprs: Column) -> "KTableLike":
        keep = ([F.col("_w")] if self.windowed else []) + [F.col(k) for k in self.keys]
        return replace(
            self, df=self.df.select(*keep, *[c.alias(n) for n, c in exprs.items()])
        )

    def to_stream(self, key_format: str = "{start}-{end}-{key}") -> KStreamLike:
        """toStream with the windowed-key formatter
        (Aggregations.java:141-148): flatten (window, key) into the
        reference's "{winStart}-{winEnd}-{key}" string. ``key_format``
        is honored: a format string over {start}, {end} and {key}
        (epoch-seconds window bounds; key = '-'-joined key columns),
        compiled to format_string so it stays a JVM-side expression."""
        df = self.df
        if self.windowed:
            parts = {
                "start": F.unix_timestamp(F.col("_w.start")).cast("string"),
                "end": F.unix_timestamp(F.col("_w.end")).cast("string"),
                "key": F.concat_ws("-", *[F.col(k) for k in self.keys]),
            }
            # "{start}-{end}-{key}" -> printf template "%s-%s-%s" + arg order
            template = key_format.replace("%", "%%")  # literal % survives
            args: list[tuple[int, Column]] = []
            for name in ("start", "end", "key"):
                placeholder = "{" + name + "}"
                if placeholder in template:
                    idx = template.index(placeholder)
                    # keep placeholders in appearance order
                    args.append((idx, parts[name]))
                    template = template.replace(placeholder, "%s", 1)
            ordered = [c for _, c in sorted(args, key=lambda t: t[0])]
            df = df.withColumn("wkey", F.format_string(template, *ordered)).drop("_w")
        return KStreamLike(df=df, key=self.keys[0] if self.keys else None)


def stream(df: DataFrame, key: str | None = None) -> KStreamLike:
    """builder.stream(topic): bind a (streaming or batch-twin)
    DataFrame as a KStream (reference Aggregations.java:81-83)."""
    return KStreamLike(df=df, key=key)
