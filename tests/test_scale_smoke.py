"""Scale smoke: run the stateful/join-heavy operators against a corpus
10× the bench fixture (≈1M events), built once per session by unioning
shifted copies — checks for cliffs (state blowup, skewed stragglers,
quadratic candidate sets) that sf0.1 alone cannot reveal. Timing is NOT
asserted (machines vary); completion + row-count sanity is.
"""

import pytest
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.operators.joins import asof_join

N_COPIES = 10


@pytest.fixture(scope="module")
def big_events(spark):
    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    # shift each copy by 35 days so event-time windows don't collapse
    copies = [
        ev.select(
            (F.col("event_id") + i * 10_000_000).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i * 35} DAYS")).alias("ts"),
            (F.col("user_id") + i * 10_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(N_COPIES)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out = out.persist()
    assert out.count() == ev.count() * N_COPIES
    return out


def test_tumbling_window_at_10x(spark, big_events):
    agg = (
        big_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    # ~720 hourly windows/copy × 10 copies × 5 types
    n = agg.count()
    assert n > 10_000


def test_asof_join_at_10x(spark, big_events):
    clicks = big_events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = (
        big_events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    out = asof_join(clicks, purchases, key="user_id", left_ts="c_ts", right_ts="ts")
    assert out.count() == clicks.count()  # left join preserves every click


def test_sessionization_at_10x(spark, big_events):
    gap = F.expr("INTERVAL 30 MINUTES")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        big_events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev_ts").isNull() | (F.col("ts") > F.col("prev_ts") + gap)).cast("long"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"))
    )
    total = sess.agg(F.sum("n_events")).first()[0]
    assert total == big_events.count()  # every event lands in one session


def test_minhash_lsh_at_dup_heavy_5x_documents(spark):
    """LSH dedup under a duplication-heavy corpus: 5 shifted copies of
    every document (the worst realistic shape — every bucket holds all
    copies of its member docs, so the within-bucket pair expansion runs
    at its densest). Checks the candidate path doesn't go quadratic in
    the corpus and that every cross-copy exact-dup pair is found
    (identical text ⇒ identical signature ⇒ same bucket in every band,
    jaccard 1.0)."""
    from highload_kafka_streams_spark.llm.dedup import minhash_near_duplicates

    n_copies = 5
    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    n_docs = d.count()
    copies = [
        d.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
        )
        for i in range(n_copies)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.filter(F.size(F.split(F.col("text"), " ")) >= 3).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = minhash_near_duplicates(big, threshold=0.5)
    exact = pairs.filter(F.col("jaccard") >= 1.0).count()
    # every doc pairs with its other copies: n_docs * C(n_copies, 2)
    min_cross = n_docs * (n_copies * (n_copies - 1) // 2)
    assert exact >= min_cross * 0.99  # allow boundary docs dropped by filter


def test_debounce_state_machine_at_10x(spark, big_events):
    """1M events / 15k users through the applyInPandasWithState replay:
    no per-group state blowup, output bounded by input."""
    from highload_kafka_streams_spark.streaming.stateful import debounce_batch

    out = debounce_batch(
        big_events.select("user_id", "event_id", "ts", "event_type", "value")
    )
    n = out.count()
    assert 0 < n <= big_events.count()
    # one open burst per user must survive to the timeout flush
    n_users = big_events.select("user_id").distinct().count()
    assert out.groupBy("user_id").count().count() == n_users


def test_scd2_and_pattern_at_10x(spark, big_events):
    """SCD2 interval build and the CEP chain both complete at 10× and
    keep their per-user invariants."""
    from pyspark.sql import Window

    ev = big_events
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id",
        F.lag("event_type").over(w_ord).alias("prev_state"),
    )
    starts = ordered.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    n_runs = starts.count()
    assert 0 < n_runs <= ev.count()
    wu = Window.partitionBy("user_id")
    chain = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .groupBy("user_id")
        .agg(F.first("t_view").alias("t_view"), F.first("t_click").alias("t_click"))
    )
    assert chain.count() == big_events.select("user_id").distinct().count()


def test_grouped_selection_at_10x(spark, big_events):
    """Grouped histogram selection over ~1M rows must resolve every
    group's exact median in the bounded round budget and agree with
    Spark's own exact percentile (small group count => percentile's
    buffering is safe HERE, making it a valid cross-check)."""
    from highload_kafka_streams_spark.operators.selection import (
        grouped_kth_smallest,
    )

    fx = big_events.select(
        "event_type",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v"),
    )
    got = grouped_kth_smallest(
        fx, "event_type", "v", rank_of_n=lambda n: (n + 1) // 2
    )
    # reference: per-group sort-based rank pick via window (fixture-only)
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("v")
    ref = {
        (r["event_type"], r["n"]): r["v"]
        for r in fx.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .collect()
    }
    assert len(got) == 5
    for g, n, k, kth in got:
        assert ref[(g, n)] == kth, (g, n, k, kth, ref[(g, n)])


def test_auc_two_phase_equals_global_window_at_10x(spark, big_events):
    """The bucketed two-phase AUC rank-sum must equal the single-window
    global formulation on the 10× corpus (the decomposition is exact,
    not approximate — prove it at a size where it matters)."""
    from pyspark.sql.window import Window

    scored = big_events.select(
        F.col("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    grp = scored.groupBy("s").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    ).persist()
    # global single-window reference (fixture-only shape)
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ref = (
        grp.withColumn("c", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .agg(
            F.sum(
                F.col("pos") * (2 * F.col("c") + F.col("cnt") + 1)
            ).alias("s2")
        )
        .first()["s2"]
    )
    # two-phase bucketed form (the registered query's shape)
    grp_b = grp.withColumn("b", F.floor(F.col("s") / 16).cast("long"))
    w_in = (
        Window.partitionBy("b")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = grp_b.withColumn(
        "c_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
    )
    btot = grp_b.groupBy("b").agg(F.sum("cnt").alias("bc"))
    w_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    off = btot.withColumn(
        "c_off", F.coalesce(F.sum("bc").over(w_b), F.lit(0))
    ).select("b", "c_off")
    rank2 = 2 * (F.col("c_off") + F.col("c_in")) + F.col("cnt") + 1
    got = (
        within.join(F.broadcast(off), "b")
        .agg(F.sum(F.col("pos") * rank2).alias("s2"))
        .first()["s2"]
    )
    grp.unpersist()
    assert got == ref, (got, ref)
