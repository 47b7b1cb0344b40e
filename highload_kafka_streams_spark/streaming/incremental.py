"""Incremental (foreachBatch) statistics maintenance — the
streaming-native twin lane for batch operators whose readout needs
GLOBAL state (r10 verdict item 7: "conformal/calibration as
foreachBatch incremental jobs").

Pattern: a conformal threshold needs the model mean and the full
calibration-residual distribution, neither of which is known until the
stream ends — but both REDUCE to mergeable sufficient statistics
(per-group sums/counts and per-(group, value) histograms). Each
micro-batch therefore writes its own partial statistics to an
idempotent ``batch_id=<n>/`` parquet state directory (the
overwrite-by-batchId exactly-once shape of ``streaming.sinks``), and a
batch FINALIZE query merges the partials and computes the operator's
EXACT output — bit-identical to the one-shot batch query
(``plans/round10.py::q_agg_conformal_interval``) no matter how rows
were split across micro-batches, because sums and histogram counts
are associative and the residual mapping |y − pred| is applied only
AFTER the merge. No driver-side state anywhere; crash recovery comes
free from the source checkpoint plus the idempotent state writes.

At 100 TB this is the production shape for "fit a conformal wrapper
over a day of streamed predictions": per-batch partials are tiny
(|groups| + value-grain histogram cells), the state dir is compacted
by the finalize's combinable merge, and the finalize itself is the
same three-aggregate lane the batch query runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# split constants mirror q_agg_conformal_interval exactly: md5 nibble
# of the order key → train [4,12), calibration [0,4), test [12,16)
_TRAIN_LO, _TRAIN_HI, _CALIB_HI = 4, 12, 16


def conformal_split(df: DataFrame) -> DataFrame:
    """The shared (g, y_c, nib) projection of the conformal family —
    mirrors plans/round10.py::q_agg_conformal_interval's split CTE."""
    return df.select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y_c"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("conf:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("nib"),
    )


def conformal_partial_stats(batch_df: DataFrame) -> DataFrame:
    """Reduce ONE micro-batch to its mergeable partial statistics:
    ``(kind, g, y_c, s, n)`` where kind='train' rows carry per-group
    (Σy_c, count) with y_c NULL, and kind='calib'/'test' rows carry the
    per-(group, value) histogram cell counts with s=0. Unioning and
    re-aggregating any partition of the input reproduces the full-data
    statistics exactly — the associativity that makes the stream twin
    bit-identical to the batch query."""
    split = conformal_split(batch_df)
    train = (
        split.filter(
            (F.col("nib") >= _TRAIN_LO) & (F.col("nib") < _TRAIN_HI)
        )
        .groupBy("g")
        .agg(
            F.sum("y_c").cast("long").alias("s"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            F.lit("train").alias("kind"),
            "g",
            F.lit(None).cast("long").alias("y_c"),
            "s",
            "n",
        )
    )

    def hist(pred, kind: str) -> DataFrame:
        return (
            split.filter(pred)
            .groupBy("g", "y_c")
            .agg(F.count("*").cast("long").alias("n"))
            .select(
                F.lit(kind).alias("kind"),
                "g",
                "y_c",
                F.lit(0).cast("long").alias("s"),
                "n",
            )
        )

    calib = hist(F.col("nib") < _TRAIN_LO, "calib")
    test = hist(F.col("nib") >= _TRAIN_HI, "test")
    return train.unionByName(calib).unionByName(test)


def conformal_stream(stream_df: DataFrame, checkpoint: str, state_dir: str):
    """Start the incremental job: every micro-batch's partial stats are
    written idempotently to ``state_dir/batch_id=<n>/``. Returns the
    started StreamingQuery (availableNow trigger)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        conformal_partial_stats(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def conformal_finalize(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the partial-stat state dir and compute the conformal
    output — the same (g, pred_c, q90_c, n_calib, n_test, n_covered,
    coverage_ppm) frame as q_agg_conformal_interval, derived from
    merged sufficient statistics instead of a corpus rescan. The
    residual map |y_c − pred_c| is applied to the MERGED calibration
    value histogram (pred_c only exists after the merge), then the
    exact histogram-cum P90 and the count-weighted coverage audit run
    at histogram grain."""
    parts = (
        spark.read.option("basePath", state_dir)
        .parquet(state_dir)
        .drop("batch_id")
    )
    merged = parts.groupBy("kind", "g", "y_c").agg(
        F.sum("s").cast("long").alias("s"),
        F.sum("n").cast("long").alias("n"),
    )
    model = (
        merged.filter(F.col("kind") == "train")
        .groupBy("g")
        .agg(
            F.expr("CAST(SUM(s) DIV SUM(n) AS BIGINT)").alias("pred_c")
        )
    )
    resid = F.expr(
        "CAST(CASE WHEN y_c >= pred_c THEN y_c - pred_c"
        " ELSE pred_c - y_c END AS BIGINT)"
    )
    hist = (
        merged.filter(F.col("kind") == "calib")
        .join(F.broadcast(model), "g")
        .groupBy("g", resid.alias("r"))
        .agg(F.sum("n").cast("long").alias("cnt"))
    )
    wg = Window.partitionBy("g").orderBy("r")
    cum = hist.select(
        "g",
        "r",
        F.sum("cnt")
        .over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
        F.sum("cnt")
        .over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n_calib"),
    )
    thr = (
        cum.filter(F.col("cum") * 10 >= F.col("n_calib") * 9)
        .groupBy("g")
        .agg(
            F.min("r").cast("long").alias("q90_c"),
            F.min("n_calib").cast("long").alias("n_calib"),
        )
    )
    test = (
        merged.filter(F.col("kind") == "test")
        .join(F.broadcast(model), "g")
        .join(F.broadcast(thr), "g")
    )
    return (
        test.groupBy("g", "pred_c", "q90_c", "n_calib")
        .agg(
            F.sum("n").cast("long").alias("n_test"),
            F.sum(F.when(resid <= F.col("q90_c"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "g",
            "pred_c",
            "q90_c",
            "n_calib",
            "n_test",
            "n_covered",
            F.expr("CAST(n_covered * 1000000 DIV n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("g")
    )
