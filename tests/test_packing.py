"""Shard-packing & passage-dedup invariants (llm/packing.py): the
distributed prefix sum must be bucketing-invariant (any bucket size ≡
the single global window semantics the oracle states), conserve tokens,
and the chunker must cover every token exactly once.
"""

import io
import contextlib

from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.llm.packing import (
    CHUNK_WORDS,
    doc_chunks,
    pack_shards,
    token_counts,
)
from highload_kafka_streams_spark.registry import get_queries


def _assignments(df):
    return {
        (r["doc_id"], r["n_tokens"], r["shard_id"]) for r in df.collect()
    }


def test_pack_shards_bucket_size_invariant(spark, sf_smoke):
    """Shard assignment must be identical for any prefix-sum bucket
    size — bucket_docs=1 (one doc per bucket), 7 (ragged), and 10^9
    (single bucket == the naive global window) all agree."""
    docs = load_table(spark, sf_smoke, "documents")
    base = _assignments(pack_shards(docs, bucket_docs=10**9))
    for b in (1, 7, 64):
        assert _assignments(pack_shards(docs, bucket_docs=b)) == base, b


def test_pack_shards_conserves_tokens_and_is_contiguous(spark, sf_smoke):
    """Every token lands in exactly one shard; shard ids are dense from
    0; no shard's starting offset strays outside its budget window."""
    docs = load_table(spark, sf_smoke, "documents")
    budget = 500
    packed = pack_shards(docs, budget=budget).cache()
    total = token_counts(docs).agg(F.sum("n_tokens")).first()[0]
    shards = (
        packed.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("t"))
        .orderBy("shard_id")
        .collect()
    )
    assert sum(r["t"] for r in shards) == total
    assert [r["shard_id"] for r in shards] == list(range(len(shards)))
    # a shard only opens when the previous one's budget is consumed:
    # cumulative tokens before shard s must be >= s * budget
    cum = 0
    for r in shards:
        assert cum >= r["shard_id"] * budget
        cum += r["t"]
    packed.unpersist()


def test_doc_chunks_cover_all_tokens(spark, sf_smoke):
    """ceil(n_tokens / CHUNK_WORDS) chunks per doc — no token dropped,
    no phantom chunk."""
    docs = load_table(spark, sf_smoke, "documents")
    got = {
        r["doc_id"]: r["n"]
        for r in doc_chunks(docs).groupBy("doc_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    want = {
        r["doc_id"]: -(-r["n_tokens"] // CHUNK_WORDS)
        for r in token_counts(docs).collect()
    }
    assert got == want


def test_boilerplate_broadcasts_shared_chunk_set(spark, sf_smoke):
    """The duplicated-chunk set is small by construction and must come
    back as a broadcast join, never a shuffle of the chunk stream."""
    df = get_queries()["q_text_boilerplate"](spark, sf_smoke)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_shuffle_positions_prefix_invariant_permutation(spark, sf_smoke):
    """The distributed hash-order row_number must (a) be a permutation
    of 0..N-1 and (b) agree for any bucket-prefix width (1 hex char =
    16 buckets through 3 = 4096; wider prefixes only shrink buckets,
    never change the composed global order)."""
    from highload_kafka_streams_spark.llm.packing import shuffle_positions

    docs = load_table(spark, sf_smoke, "documents")
    base = {
        (r["doc_id"], r["pos"])
        for r in shuffle_positions(docs, prefix_hex=2).collect()
    }
    n = docs.count()
    assert sorted(p for _, p in base) == list(range(n))
    for ph in (1, 3):
        got = {
            (r["doc_id"], r["pos"])
            for r in shuffle_positions(docs, prefix_hex=ph).collect()
        }
        assert got == base, ph


def test_mixture_balance_keeps_smallest_class_whole(spark, sf_smoke):
    """The smallest source's cut is the full bucket range (keeps all),
    and every class's kept count is <= its doc count."""
    from highload_kafka_streams_spark.operators.sampling import N_BUCKETS
    from highload_kafka_streams_spark.registry import get_queries

    rows = get_queries()["q_sample_mixture_balance"](
        spark, sf_smoke
    ).collect()
    smallest = min(rows, key=lambda r: r["n_docs"])
    assert smallest["cut"] == N_BUCKETS
    assert smallest["n_kept"] == smallest["n_docs"]
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
