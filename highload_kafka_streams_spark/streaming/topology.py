"""Kafka-Streams-shaped DSL over Spark DataFrames (batch AND streaming).

This is the migration surface: a user of the reference's Kafka Streams
app writes the same topology here —

    b = StreamsBuilder(spark)
    (b.stream(events)
       .with_watermark("ts", "10 minutes")
       .filter(F.col("event_type") == "purchase")
       .group_by("user_id")
       .windowed_by(TimeWindows.of_size("1 hour"))
       .count()
       .to_memory("purchases_hourly"))

— and it compiles to a declarative DataFrame plan, so Catalyst/AQE (or
IncrementalExecution in streaming mode) owns the physical strategy.
The same topology object works on a batch DataFrame (replay/backfill)
and a streaming one (``spark.readStream``): Structured Streaming's
declarative incrementalization (PAPERS.md:8) is exactly what makes the
KS topology → Spark translation total.

Operator mapping is 1:1 with the KS DSL (SURVEY.md §2); each method
cites the KS API element it implements.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# window specs (KS: TimeWindows / SlidingWindows / SessionWindows / JoinWindows)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TimeWindows:
    """KS TimeWindows.ofSize(size)[.advanceBy(slide)]."""

    size: str
    slide: str | None = None

    @classmethod
    def of_size(cls, size: str) -> "TimeWindows":
        return cls(size)

    def advance_by(self, slide: str) -> "TimeWindows":
        return TimeWindows(self.size, slide)


@dataclass(frozen=True)
class SessionWindows:
    """KS SessionWindows.ofInactivityGap(gap)."""

    gap: str

    @classmethod
    def of_inactivity_gap(cls, gap: str) -> "SessionWindows":
        return cls(gap)


@dataclass(frozen=True)
class SlidingWindows:
    """KS SlidingWindows.ofTimeDifference(Δ) — one window per record
    covering [ts−Δ, ts]. Batch form is exact (RANGE frame over
    event-time µs, one shuffle, no self-join); Structured Streaming has
    no per-record window state, so streaming frames must approximate
    with a fine-sliced hopping window instead."""

    size_seconds: int

    @classmethod
    def of_time_difference(cls, seconds: int) -> "SlidingWindows":
        return cls(seconds)


@dataclass(frozen=True)
class JoinWindows:
    """KS JoinWindows.ofTimeDifference(Δ): |ts_a - ts_b| ≤ Δ (seconds)."""

    before_seconds: int
    after_seconds: int

    @classmethod
    def of_time_difference(cls, seconds: int) -> "JoinWindows":
        return cls(seconds, seconds)


# ---------------------------------------------------------------------------
# streams
# ---------------------------------------------------------------------------

class KStream:
    """KS ``KStream`` — an (optionally streaming) record stream with an
    event-time column and optional logical key columns."""

    def __init__(self, df: DataFrame, ts_col: str = "ts", key_cols: tuple[str, ...] = ()):
        self.df = df
        self.ts_col = ts_col
        self.key_cols = key_cols

    # -- stateless (KS KStream#filter/filterNot/mapValues/flatMapValues/...)

    def filter(self, pred: Column) -> "KStream":
        return KStream(self.df.filter(pred), self.ts_col, self.key_cols)

    def filter_not(self, pred: Column) -> "KStream":
        return KStream(self.df.filter(~pred), self.ts_col, self.key_cols)

    def map_values(self, **cols: Column) -> "KStream":
        return KStream(self.df.withColumns(dict(cols)), self.ts_col, self.key_cols)

    def select(self, *cols) -> "KStream":
        return KStream(self.df.select(*cols), self.ts_col, self.key_cols)

    def flat_map_values(self, array_col: Column, out: str) -> "KStream":
        return KStream(
            self.df.withColumn(out, F.explode(array_col)), self.ts_col, self.key_cols
        )

    def select_key(self, key: Column, name: str = "key") -> "KStream":
        """KS KStream#selectKey — marks the stream re-keyed; the shuffle
        happens at the next stateful operator, like KS's repartition topic."""
        return KStream(self.df.withColumn(name, key), self.ts_col, (name,))

    def merge(self, other: "KStream") -> "KStream":
        return KStream(self.df.unionByName(other.df), self.ts_col, self.key_cols)

    def branch(self, **preds: Column) -> dict[str, "KStream"]:
        out, taken = {}, None
        for name, p in preds.items():
            eff = p if taken is None else (p & ~taken)
            out[name] = KStream(self.df.filter(eff), self.ts_col, self.key_cols)
            taken = p if taken is None else (taken | p)
        return out

    def peek(self, fn) -> "KStream":
        """KS KStream#peek — observation without transformation. In
        streaming mode attach via foreachBatch at sink time; in batch we
        call fn(df) eagerly."""
        fn(self.df)
        return self

    def repartition(self, num_partitions: int, *cols: str) -> "KStream":
        """KS KStream#repartition (#through pre-2.6) — explicit re-key +
        shuffle via an internal topic; here an explicit Exchange. Rarely
        needed: stateful operators repartition on their keys anyway."""
        df = (
            self.df.repartition(num_partitions, *cols)
            if cols
            else self.df.repartition(num_partitions)
        )
        return KStream(df, self.ts_col, tuple(cols) or self.key_cols)

    # -- time

    def with_watermark(self, ts_col: str, delay: str) -> "KStream":
        """KS grace period — bound lateness; no-op on batch frames."""
        df = self.df
        if df.isStreaming:
            df = df.withWatermark(ts_col, delay)
        return KStream(df, ts_col, self.key_cols)

    def dedup(self, *key_cols: str, tiebreak: str | None = None) -> "KStream":
        """Keep one record per key (the KS transformer-with-state dedup
        idiom). Streaming: ``dropDuplicatesWithinWatermark`` — state is
        bounded by the watermark set via ``with_watermark`` (REQUIRED
        first, or Spark raises). Batch replay: deterministic first-by-
        (ts, tiebreak) via row_number, NOT ``dropDuplicates`` — the bare
        form keeps an arbitrary row per key, which is irreproducible
        under retries and would break oracle hashing."""
        keys = list(key_cols) or list(self.key_cols)
        if not keys:
            raise ValueError("dedup needs key columns (or a keyed stream)")
        if self.df.isStreaming:
            return KStream(
                self.df.dropDuplicatesWithinWatermark(keys),
                self.ts_col,
                self.key_cols,
            )
        order = [self.ts_col] + ([tiebreak] if tiebreak else [])
        w = Window.partitionBy(*keys).orderBy(*order)
        df = (
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return KStream(df, self.ts_col, self.key_cols)

    # -- joins (KS KStream#join family)

    def join_windowed(
        self,
        other: "KStream",
        on: Column,
        windows: JoinWindows,
        how: str = "inner",
    ) -> "KStream":
        """KS KStream#join(KStream, JoinWindows) — equi-key + time-range."""
        a, b = self.df.alias("l"), other.df.alias("r")
        lts, rts = F.col(f"l.{self.ts_col}"), F.col(f"r.{other.ts_col}")
        cond = (
            on
            & (rts >= lts - F.expr(f"INTERVAL {windows.before_seconds} SECONDS"))
            & (rts <= lts + F.expr(f"INTERVAL {windows.after_seconds} SECONDS"))
        )
        return KStream(a.join(b, cond, how), self.ts_col, self.key_cols)

    def join_table(self, table: "KTable", on, how: str = "inner") -> "KStream":
        """KS KStream#join(KTable) — enrichment against the current state."""
        return KStream(self.df.join(table.df, on, how), self.ts_col, self.key_cols)

    def join_global(self, gt: "GlobalKTable", on: Column, how: str = "inner") -> "KStream":
        """KS KStream#join(GlobalKTable, keySelector) — broadcast lookup,
        arbitrary join expression (non-key lookups allowed)."""
        return KStream(
            self.df.join(F.broadcast(gt.df), on, how), self.ts_col, self.key_cols
        )

    # -- grouping

    def group_by(self, *cols: str) -> "KGroupedStream":
        """KS KStream#groupBy/groupByKey."""
        return KGroupedStream(self, cols)

    # -- sinks (KS KStream#to)

    def to_memory(self, name: str, output_mode: str = "append"):
        """Streaming: memory sink query (returns StreamingQuery).
        Batch: registers a temp view and returns None."""
        if self.df.isStreaming:
            return (
                self.df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
        self.df.createOrReplaceTempView(name)
        return None

    def to_parquet(self, path: str, checkpoint: str | None = None, output_mode: str = "append"):
        if self.df.isStreaming:
            return (
                self.df.writeStream.format("parquet")
                .option("path", path)
                .option("checkpointLocation", checkpoint or f"{path}/_checkpoints")
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
        self.df.write.mode("overwrite").parquet(path)
        return None


class KTable:
    """KS ``KTable`` — latest value per key (changelog view).

    Batch: a compacted snapshot. Streaming: the aggregation result in
    update mode (Structured Streaming maintains the state store)."""

    def __init__(self, df: DataFrame, key_cols: tuple[str, ...]):
        self.df = df
        self.key_cols = key_cols

    @classmethod
    def from_stream(
        cls, stream: KStream, key_cols: tuple[str, ...], tiebreak: str
    ) -> "KTable":
        if stream.df.isStreaming:
            raise ValueError(
                "streaming KTable derives from group_by().reduce/aggregate "
                "in update mode; latest-per-key snapshots are a batch shape"
            )
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(stream.ts_col).desc(), F.col(tiebreak).desc()
        )
        df = (
            stream.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return cls(df, key_cols)

    def join(self, other: "KTable", on, how: str = "inner") -> "KTable":
        """KS KTable#join/leftJoin/outerJoin(KTable) — including the
        foreign-key form (pass any equi expression as ``on``)."""
        return KTable(self.df.join(other.df, on, how), self.key_cols)

    def to_stream(self, ts_col: str = "ts") -> KStream:
        """KS KTable#toStream."""
        return KStream(self.df, ts_col, self.key_cols)


class GlobalKTable:
    """KS ``GlobalKTable`` — broadcast-replicated lookup table."""

    def __init__(self, df: DataFrame):
        self.df = df


class KGroupedStream:
    """KS ``KGroupedStream`` — grouped, pre-window."""

    def __init__(self, stream: KStream, cols: tuple[str, ...]):
        self.stream = stream
        self.cols = cols

    def _grouped(self):
        return self.stream.df.groupBy(*self.cols)

    def count(self, alias: str = "n") -> KTable:
        """KS KGroupedStream#count."""
        return KTable(
            self._grouped().agg(F.count("*").alias(alias)), self.cols
        )

    def reduce(self, *aggs: Column) -> KTable:
        """KS KGroupedStream#reduce / #aggregate — pass any agg columns."""
        return KTable(self._grouped().agg(*aggs), self.cols)

    aggregate = reduce

    def windowed_by(
        self, windows: TimeWindows | SessionWindows
    ) -> "WindowedKGroupedStream":
        """KS KGroupedStream#windowedBy."""
        return WindowedKGroupedStream(self.stream, self.cols, windows)

    def cogroup(self, *others: "KGroupedStream") -> "CogroupedKStream":
        """KS KGroupedStream#cogroup — aggregate several co-keyed streams
        into one store."""
        return CogroupedKStream((self, *others))

    def process(
        self,
        fn,
        output_schema,
        state_schema=None,
        output_mode: str = "update",
        timeout=None,
    ):
        """KS KStream#process — arbitrary per-key stateful logic.

        Streaming frames run ``applyInPandasWithState`` (fn signature:
        ``(key, pdf_iter, GroupState)``; ``timeout`` defaults to
        event-time — KS punctuation). Batch frames run ``applyInPandas``
        over complete groups (fn signature: ``(pdf) -> pdf``)."""
        df = self.stream.df
        if df.isStreaming:
            from pyspark.sql.streaming.state import GroupStateTimeout

            return KStream(
                df.groupBy(*self.cols).applyInPandasWithState(
                    fn,
                    outputStructType=output_schema,
                    stateStructType=state_schema,
                    outputMode=output_mode,
                    timeoutConf=timeout or GroupStateTimeout.EventTimeTimeout,
                ),
                self.stream.ts_col,
                self.cols,
            )
        return KStream(
            df.groupBy(*self.cols).applyInPandas(fn, schema=output_schema),
            self.stream.ts_col,
            self.cols,
        )


class CogroupedKStream:
    """KS ``CogroupedKStream`` — multi-stream aggregation into one table:
    per-source partial aggs union'd and re-aggregated (two narrow aggs
    instead of caching one wide union — map-side combine on both)."""

    # per-stream partials are re-aggregated across streams; the merge
    # function differs from the partial's own function (count of counts
    # is wrong — partial counts re-merge with SUM)
    _MERGE_BY_ROOT = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def __init__(self, groups: tuple["KGroupedStream", ...]):
        self.groups = groups

    @staticmethod
    def _agg_root(agg: Column) -> tuple[str, bool]:
        """(function name, is_distinct) read from the column's expression
        tree. NEVER derived from ``str(Column)``: PySpark renders distinct
        aggregates without the DISTINCT keyword (``F.countDistinct('u')``
        prints as ``count(u)``), so a string parse would silently route
        countDistinct/sum_distinct to the sum-merge path and double-count
        keys present in multiple streams."""
        try:
            node = agg._jc.node()
            while node.getClass().getSimpleName() == "Alias":
                node = node.child()
            if node.getClass().getSimpleName() == "UnresolvedFunction":
                return node.functionName().lower(), bool(node.isDistinct())
        except Exception:
            pass
        # fallback (non-JVM column impls): parse the rendering, and treat
        # any 'distinct' hint as distinct so we fail closed, not open
        expr = str(agg)
        root = expr[expr.find("'") + 1 :].split("(", 1)[0].strip().lower()
        return root, "distinct" in expr.lower()

    def aggregate(self, *aggs: Column, merge=None) -> KTable:
        """Aggregate every cogrouped stream with the same aggs and merge
        the per-stream partials per key.

        Only distributive aggregates whose cross-stream merge is
        derivable are accepted as-is: ``sum``/``count`` (merge with sum),
        ``min``/``max`` (merge with themselves). Anything else (avg,
        countDistinct, ...) is NOT decomposable this way and must either
        be rewritten in decomposable terms by the caller (avg = sum+count
        merged then divided) or given an explicit ``merge={alias:
        F.<fn>}`` entry; otherwise this raises ValueError rather than
        silently summing per-stream maxes.
        """
        merge = dict(merge or {})
        key_cols = self.groups[0].cols
        parts = [g.stream.df.groupBy(*g.cols).agg(*aggs) for g in self.groups]
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        value_cols = [c for c in merged.columns if c not in key_cols]
        re_aggs = []
        for col_name, agg in zip(value_cols, aggs):
            if col_name in merge:
                re_aggs.append(merge[col_name](col_name).alias(col_name))
                continue
            root, is_distinct = self._agg_root(agg)
            fn = None if is_distinct else self._MERGE_BY_ROOT.get(root)
            if fn is None:
                shown = f"{root} DISTINCT" if is_distinct else root
                raise ValueError(
                    f"cogroup aggregate {col_name!r} uses {shown!r}, which "
                    "has no derivable cross-stream merge (per-stream "
                    "DISTINCT partials cannot be re-merged); pass "
                    f"merge={{{col_name!r}: F.<fn>}} or rewrite it in "
                    "sum/count/min/max-decomposable terms"
                )
            re_aggs.append(fn(col_name).alias(col_name))
        return KTable(merged.groupBy(*key_cols).agg(*re_aggs), key_cols)


class WindowedKGroupedStream:
    def __init__(self, stream, cols, windows):
        self.stream = stream
        self.cols = cols
        self.windows = windows

    def _window_col(self):
        ts = self.stream.ts_col
        if isinstance(self.windows, SessionWindows):
            return F.session_window(ts, self.windows.gap)
        if self.windows.slide:
            return F.window(ts, self.windows.size, self.windows.slide)
        return F.window(ts, self.windows.size)

    def count(self, alias: str = "n") -> KTable:
        if isinstance(self.windows, SlidingWindows):
            return self.aggregate(**{alias: F.count("*")})
        return self.aggregate(F.count("*").alias(alias))

    def aggregate(self, *aggs: Column, **named_aggs: Column) -> KTable:
        """Pre-aliased columns positionally, or name=expr pairs. Sliding
        windows accept ONLY the named form (the alias must wrap the
        window expression, not the aggregate inside it)."""
        if isinstance(self.windows, SlidingWindows):
            if aggs:
                raise ValueError(
                    "sliding windows need named aggregates, e.g. "
                    "aggregate(n=F.count('*'))"
                )
            return self._sliding_aggregate(list(named_aggs.items()))
        aggs = list(aggs) + [c.alias(n) for n, c in named_aggs.items()]
        wcol = self._window_col().alias("window")
        df = self.stream.df.groupBy(wcol, *self.cols).agg(*aggs)
        flat = df.select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            *self.cols,
            *[c for c in df.columns if c not in ("window", *self.cols)],
        )
        return KTable(flat, ("w_start", "w_end", *self.cols))

    def _sliding_aggregate(self, named: list) -> KTable:
        """KS SlidingWindows: per-record [ts−Δ, ts] aggregates via a
        RANGE frame (batch-exact; see SlidingWindows docstring)."""
        df = self.stream.df
        if df.isStreaming:
            raise ValueError(
                "per-record sliding windows are batch-only; use "
                "TimeWindows.of_size(...).advance_by(...) for streaming"
            )
        ts = self.stream.ts_col
        w = (
            Window.partitionBy(*self.cols)
            .orderBy(F.unix_micros(F.col(ts)))
            .rangeBetween(-self.windows.size_seconds * 1_000_000, 0)
        )
        agg_cols = [c.over(w).alias(name) for name, c in named]
        out = df.select(*self.cols, F.col(ts).alias("w_end"), *agg_cols)
        return KTable(out, ("w_end", *self.cols))

    reduce = aggregate


class StreamsBuilder:
    """KS ``StreamsBuilder`` — topology entry point."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def stream(self, df: DataFrame, ts_col: str = "ts") -> KStream:
        """KS StreamsBuilder#stream — accepts a batch or streaming frame."""
        return KStream(df, ts_col)

    def table(
        self, df: DataFrame, key_cols: tuple[str, ...], ts_col: str, tiebreak: str
    ) -> KTable:
        """KS StreamsBuilder#table — compacted latest-per-key view."""
        return KTable.from_stream(KStream(df, ts_col), key_cols, tiebreak)

    def global_table(self, df: DataFrame) -> GlobalKTable:
        """KS StreamsBuilder#globalTable."""
        return GlobalKTable(df)


def _register_dsl_query() -> None:
    """Driver-checkable evidence for the KS-shaped DSL ITSELF: a query
    authored entirely through StreamsBuilder (stream → branch → merge →
    groupBy → windowedBy → aggregate) whose compiled plan must
    hash-match the plain-SQL oracle. This is the 'a KS user could
    switch' claim, checked — their code shape, our engine, the
    oracle's answer."""
    from highload_kafka_streams_spark.compat import dsum, dsum_sql
    from highload_kafka_streams_spark.io import load_table
    from highload_kafka_streams_spark.registry import query

    @query(
        "q_dsl_topology",
        oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
       event_type,
       count(*) AS n,
       {dsum_sql("value", "total_value")}
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY 1, 2
ORDER BY w_start, event_type
""",
    )
    def q_dsl_topology(spark, sf_dir: str):
        b = StreamsBuilder(spark)
        events = b.stream(load_table(spark, sf_dir, "events"))
        branches = events.branch(
            clicks=F.col("event_type") == "click",
            purchases=F.col("event_type") == "purchase",
        )
        merged = branches["clicks"].merge(branches["purchases"])
        table = (
            merged.group_by("event_type")
            .windowed_by(TimeWindows.of_size("1 hour"))
            .aggregate(
                n=F.count("*"),
                total_value=dsum(F.col("value"), "total_value"),
            )
        )
        return table.df.select(
            "w_start", "event_type", "n", "total_value"
        ).orderBy("w_start", "event_type")


_register_dsl_query()
