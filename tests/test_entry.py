"""Driver-contract smoke tests: entry(), queries(), oracle_sql() shape."""

import __spark_entry__ as ent


def test_entry_runs(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracle_keys_align(spark):
    qs = ent.queries()
    osql = ent.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query; not every query needs an oracle
    missing = set(osql) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


import pytest


@pytest.mark.slowlane
def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    # r12 lane split (verdict item 1): ~6 min of serial per-query fixed
    # action cost — slowlane by default; the fast lane keeps the
    # 25-query sample below, and the full sweep still runs in the
    # round-end ritual and in the committed oracle preflight.
    qs = ent.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name


def test_sampled_queries_run_at_smoke_sf(spark, sf_smoke):
    from test_oracle_parity import FAST_SAMPLE

    qs = ent.queries()
    for name in FAST_SAMPLE:
        assert qs[name](spark, sf_smoke).count() >= 0, name


def test_registry_window_ordering():
    """The driver verifies a prefix of queries() (observed 50/round), so
    the ordering contract matters. r4 contract (self-maintaining): the
    ordering derives from CORRECTNESS_r*.json — never-driver-green
    oracle-backed queries lead in ledger order, then green ones
    oldest-evidence-first, then rows-only queries last. Every ledger /
    tail name must exist (typos silently waste window slots), every
    registered query must appear exactly once, and no slot of the
    verified window may go to a query that already has newer driver
    evidence while ANY oracle-backed query has none."""
    from highload_kafka_streams_spark import registry

    qs = ent.queries()
    osql = ent.oracle_sql()
    names = list(qs)
    unknown = [n for n in registry._QUERY_LEDGER if n not in qs]
    assert not unknown, f"_QUERY_LEDGER names not registered: {unknown}"
    assert len(set(registry._QUERY_LEDGER)) == len(registry._QUERY_LEDGER)
    oracle_in_tail = [n for n in registry._WINDOW_TAIL if n in osql]
    assert not oracle_in_tail, f"oracle-backed in _WINDOW_TAIL: {oracle_in_tail}"
    unknown_tail = [n for n in registry._WINDOW_TAIL if n not in qs]
    assert not unknown_tail, f"_WINDOW_TAIL names not registered: {unknown_tail}"
    assert sorted(names) == sorted(set(names)) and len(names) == len(qs)
    # (1) never-green before green among oracle-backed; (2) all
    # oracle-backed before all rows-only; (3) greens oldest-first
    green = registry._driver_green_rounds()
    phases = []
    for n in names:
        if n not in osql:
            phases.append(2)
        elif n in green:
            phases.append(1)
        else:
            phases.append(0)
    assert phases == sorted(phases), "window phases out of order"
    green_rounds = [green[n] for n in names if phases[names.index(n)] == 1]
    assert green_rounds == sorted(green_rounds), "greens not oldest-first"
    # the verified window prefix must be entirely oracle-backed
    assert all(n in osql for n in names[:50]), names[:50]


def test_pandas_udf_queries_work_from_foreign_cwd(tmp_path):
    """Driver-env regression: module-level applyInPandas kernels pickle
    BY REFERENCE, so Python workers must import the package themselves.
    Run the entry contract in a subprocess whose cwd is NOT the repo
    root — without configure_session's addPyFile shipping, the worker
    dies with ModuleNotFoundError (reproduced round 3 from /tmp)."""
    import subprocess
    import sys

    script = """
import importlib.util
from pyspark.sql import SparkSession
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
ent = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ent)
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# a query whose kernel is a module-level applyInPandas function
df = ent.queries()["q_stateful_session_processor"](
    spark, "/root/testdata/sf0.001")
print("ROWS", df.count())
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # decisively NOT the repo root
        capture_output=True,
        text=True,
        timeout=300,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k not in ("PYTHONPATH",)
        },
    )
    assert "ROWS" in out.stdout, out.stderr[-2000:]


def test_driver_green_rounds_parsing(tmp_path):
    """The ordering derivation must track the LATEST driver verdict per
    query: a green row counts, a later error or mismatch pulls the query
    back out of the green set (so it returns to the front of the
    window), and malformed files are ignored rather than fatal."""
    import json

    from highload_kafka_streams_spark.registry import _driver_green_rounds

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_a": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None},
        "q_b": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None},
        "q_c": {"rows_match": False, "schema_match": True,
                "hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_b": {"rows_match": True, "schema_match": True,
                "hash_match": False, "err": None},   # regressed
        "q_c": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None},    # fixed
        "q_d": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": "boom"},  # errored
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json at all")
    green = _driver_green_rounds(root=tmp_path)
    assert green == {"q_a": 1, "q_c": 2}


def test_green_rounds_hash_staleness_gate(tmp_path):
    """Round-5 contract (VERDICT r4 item 1): a driver-green row only
    counts while the implementation it verified is still the current
    one. QUERY_HASHES.json records {hash, since_round}; a green row at
    round R survives iff hash matches the live code AND
    since_round <= R. A rewritten-since-green query (hash moved, or
    recorded later than its evidence) re-enters the never-green tier."""
    import json

    from highload_kafka_streams_spark import qhash
    from highload_kafka_streams_spark.registry import _driver_green_rounds

    greenrow = {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_current": greenrow,      # hash matches, recorded r1 <= 2 → green
        "q_rewritten": greenrow,    # ledger hash != live hash → stale
        "q_late_record": greenrow,  # since_round 4 > evidence round 2 → stale
        "q_unrecorded": greenrow,   # not in ledger at all → stale
    }))
    # live hashes for two fake queries registered just for this test
    from highload_kafka_streams_spark import registry as reg

    def fake(spark, sf_dir):  # pragma: no cover - never executed
        return None

    # load BEFORE snapshotting (same hazard as the helper-gate test):
    # current_hashes() triggers load_all(), and restoring a pre-load
    # snapshot with _loaded True would empty the registry process-wide
    reg.load_all()
    saved_q = dict(reg.QUERIES)
    saved_o = dict(reg.ORACLE)
    try:
        for n in ("q_current", "q_rewritten", "q_late_record", "q_unrecorded"):
            reg.QUERIES[n] = fake
            reg.ORACLE[n] = "SELECT 1"
        live = qhash.content_hash(fake, "SELECT 1")
        (tmp_path / "QUERY_HASHES.json").write_text(json.dumps({
            "q_current": {"hash": live, "since_round": 1},
            "q_rewritten": {"hash": "deadbeefdeadbeef", "since_round": 1},
            "q_late_record": {"hash": live, "since_round": 4},
        }))
        green = _driver_green_rounds(root=tmp_path)
    finally:
        reg.QUERIES.clear()
        reg.QUERIES.update(saved_q)
        reg.ORACLE.clear()
        reg.ORACLE.update(saved_o)
    assert green == {"q_current": 2}, green


def test_query_hash_ledger_in_sync_with_registry():
    """QUERY_HASHES.json must cover every registered query with the
    CURRENT content hash — i.e. `python -m highload_kafka_streams_spark
    .qhash update --round N` was re-run after the last query edit. A
    drifted ledger silently demotes green queries and wastes driver
    window slots on re-verification."""
    from highload_kafka_streams_spark import qhash

    ledger = qhash.load_ledger()
    assert ledger is not None, "QUERY_HASHES.json missing at repo root"
    cur = qhash.current_hashes()
    stale = sorted(
        n for n, h in cur.items()
        if n not in ledger or ledger[n].get("hash") != h
    )
    assert not stale, f"run qhash update; stale entries: {stale}"
    orphans = sorted(n for n in ledger if n not in cur)
    assert not orphans, f"ledger entries for unregistered queries: {orphans}"


def test_qhash_update_ledger_roundtrip(tmp_path):
    """update_ledger: new entries stamped with the given round, changed
    hashes re-stamped, unchanged entries keep their original round."""
    import json

    from highload_kafka_streams_spark import qhash

    cur = qhash.current_hashes()
    some = sorted(cur)[0]
    # seed: one unchanged entry, one wrong-hash entry, rest missing
    other = sorted(cur)[1]
    (tmp_path / "QUERY_HASHES.json").write_text(json.dumps({
        some: {"hash": cur[some], "since_round": 2},
        other: {"hash": "0000000000000000", "since_round": 2},
    }))
    stats = qhash.update_ledger(7, tmp_path)
    assert stats["unchanged"] == 1 and stats["changed"] == 1
    assert stats["new"] == len(cur) - 2
    after = json.loads((tmp_path / "QUERY_HASHES.json").read_text())
    assert after[some]["since_round"] == 2          # kept
    assert after[other]["since_round"] == 7         # re-stamped
    assert after[other]["hash"] == cur[other]


def test_coverage_header_counts_match_registry():
    """COVERAGE.md's headline counts must equal the live registry —
    the doc the judge walks cannot drift from the code again."""
    import re
    from pathlib import Path

    from highload_kafka_streams_spark import registry

    registry.load_all()
    text = Path(__file__).resolve().parents[1].joinpath("COVERAGE.md").read_text()
    m = re.search(r"(\d+) registered queries, (\d+) oracle-checked", text)
    assert m, "COVERAGE.md header counts missing"
    assert int(m.group(1)) == len(registry.QUERIES), (
        m.group(1), len(registry.QUERIES)
    )
    assert int(m.group(2)) == len(registry.ORACLE), (
        m.group(2), len(registry.ORACLE)
    )


def test_full_preflight_refuses_on_drifted_ledger(monkeypatch):
    """The full-preflight CLI (no explicit names) must FAIL before
    touching Spark when QUERY_HASHES.json is stale — the round-end
    ritual then cannot certify a tree whose driver evidence is about to
    be hash-demoted (the round-6 snapshot shipped exactly that)."""
    import sys

    from highload_kafka_streams_spark import qhash
    from highload_kafka_streams_spark.plans import oracle

    # simulate drift: ledger missing one registered query
    real = qhash.load_ledger()
    assert real, "needs a real ledger to perturb"
    drifted_ledger = dict(real)
    victim = sorted(drifted_ledger)[0]
    del drifted_ledger[victim]
    monkeypatch.setattr(qhash, "load_ledger", lambda root=None: drifted_ledger)
    assert victim in oracle.ledger_drift()

    # full run (argv names empty) → exit 2 BEFORE get_spark is reached
    monkeypatch.setattr(sys, "argv", ["oracle", "/root/testdata/sf0.001"])

    def boom():  # pragma: no cover - reaching Spark means the gate failed
        raise AssertionError("preflight must refuse before starting Spark")

    import highload_kafka_streams_spark.session as session
    monkeypatch.setattr(session, "get_spark", boom)
    assert oracle.main() == 2

    # targeted run (explicit names) skips the gate — but we stop at the
    # stubbed get_spark to keep the test cheap
    monkeypatch.setattr(
        sys, "argv", ["oracle", "/root/testdata/sf0.001", "q_anything"]
    )
    try:
        oracle.main()
    except AssertionError as e:
        assert "refuse before starting Spark" in str(e)
    else:  # pragma: no cover
        raise AssertionError("targeted run should have reached get_spark")


def test_stale_rewrites_lead_never_green_tier():
    """r6 verdict item 6: a query rewritten AFTER a driver-green round
    (pre-gate green minus gated green) is a regression-in-waiting on
    already-claimed surface — it must lead the never-green tier, ahead
    of never-yet-verified new additions, so the next driver window
    re-verifies it instead of queueing it behind ~90 newer queries."""
    from highload_kafka_streams_spark import registry

    registry.load_all()
    names = list(ent.queries())
    green = registry._driver_green_rounds()
    stale = set(registry._driver_green_rounds(pre_gate=True)) - set(green)
    tail = set(registry._WINDOW_TAIL)
    never = [
        n for n in names
        if n in registry.ORACLE and n not in green and n not in tail
    ]
    if not stale:
        return  # nothing demoted right now — vacuously ordered
    last_stale = max(i for i, n in enumerate(never) if n in stale)
    first_fresh = min(
        (i for i, n in enumerate(never) if n not in stale), default=len(never)
    )
    assert last_stale < first_fresh, (
        f"stale rewrites must lead the never-green tier: "
        f"stale={sorted(stale)}, never[:10]={never[:10]}"
    )


def test_rotation_engages_when_never_green_tier_empties(monkeypatch):
    """r7 verdict item 5: once every oracle-backed query has driver
    evidence, the window must ROTATE — oldest-evidence-first — so stale
    r1/r2 greens get re-verified. Simulate the r9 state (never-green
    tier empty) with synthetic green rounds and assert the prefix is
    exactly the oldest evidence, ledger-age-tied."""
    from highload_kafka_streams_spark import registry

    registry.load_all()
    order_now = registry._ledger_order()
    oracle_backed = [
        n for n in order_now
        if n in registry.ORACLE and n not in set(registry._WINDOW_TAIL)
    ]
    # synthetic: every oracle-backed query green, rounds cycling 1..8 so
    # plenty of ties exercise the ledger-age tiebreak
    fake_green = {n: 1 + (i % 8) for i, n in enumerate(oracle_backed)}
    monkeypatch.setattr(
        registry, "_driver_green_rounds",
        lambda root=None, pre_gate=False: dict(fake_green),
    )
    ordered = registry._ordered_names()
    verified = [n for n in ordered if n in fake_green]
    rounds = [fake_green[n] for n in verified]
    assert rounds == sorted(rounds), "rotation must be oldest-evidence-first"
    # the 50-slot window lands entirely on the stalest evidence
    assert all(fake_green[n] == 1 for n in verified[:50])
    # rows-only queries still never take a verified-window slot
    head = ordered[: len(oracle_backed)]
    assert all(n in registry.ORACLE for n in head)


def test_bench_scrape_tail_ignores_vs_prev_ratios():
    """r7 ADVICE item 1: a driver stdout tail contains vs_prev's ratio
    maps whose '"q_*": <num>' pairs must NOT overwrite real timings
    when scraping a legacy truncated artifact."""
    import bench

    tail = (
        '{"metric": "headline_total_sec", "value": 6.5, "unit": "sec", '
        '"queries": {"q_pricing_summary": 0.45, "q_window_tumbling": 0.29}, '
        '"sf": 0.1, "extended_total_sec": 20.0, '
        '"vs_prev": {"round": 6, "ratios": {"q_pricing_summary": 1.01, '
        '"q_window_tumbling": 0.97}}}'
    )
    got = bench._scrape_tail({"tail": tail, "sf": 0.1})
    assert got is not None
    assert got["queries"]["q_pricing_summary"] == 0.45
    assert got["queries"]["q_window_tumbling"] == 0.29
    assert got["value"] == 6.5


def test_green_rounds_helper_hash_gate(tmp_path):
    """Round-9 contract (r8 advisor item 2): when the ledger records a
    `helpers` hash, a green row additionally requires the query's LIVE
    transitive private-helper closure to hash the same — a rewrite
    hidden entirely inside a shared helper demotes every consumer.
    Entries without a `helpers` field (pre-r9) gate on the main hash
    alone."""
    import json

    from highload_kafka_streams_spark import qhash
    from highload_kafka_streams_spark import registry as reg
    from highload_kafka_streams_spark.registry import _driver_green_rounds

    greenrow = {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_helper_ok": greenrow,     # helpers hash matches → green
        "q_helper_moved": greenrow,  # recorded helpers != live → stale
        "q_legacy": greenrow,        # no helpers field → main hash only
    }))

    def fake(spark, sf_dir):  # pragma: no cover - never executed
        return None

    # load BEFORE snapshotting: the helper gate triggers load_all()
    # inside _driver_green_rounds, and restoring a pre-load (empty)
    # snapshot with _loaded already True would wipe the registry for
    # every later test in the process
    reg.load_all()
    saved_q = dict(reg.QUERIES)
    saved_o = dict(reg.ORACLE)
    try:
        for n in ("q_helper_ok", "q_helper_moved", "q_legacy"):
            reg.QUERIES[n] = fake
            reg.ORACLE[n] = "SELECT 1"
        live = qhash.content_hash(fake, "SELECT 1")
        live_helpers = qhash.helper_hash(fake)  # "0"*16 — no helpers
        (tmp_path / "QUERY_HASHES.json").write_text(json.dumps({
            "q_helper_ok": {"hash": live, "helpers": live_helpers,
                            "since_round": 1},
            "q_helper_moved": {"hash": live, "helpers": "feedfacefeedface",
                               "since_round": 1},
            "q_legacy": {"hash": live, "since_round": 1},
        }))
        green = _driver_green_rounds(root=tmp_path)
    finally:
        reg.QUERIES.clear()
        reg.QUERIES.update(saved_q)
        reg.ORACLE.clear()
        reg.ORACLE.update(saved_o)
    assert green == {"q_helper_ok": 2, "q_legacy": 2}, green


def test_helper_hash_tracks_transitive_private_closure():
    """helper_hash must (a) see through the query to module-private
    functions it references — including cross-module `from X import _y`
    inside the body — and (b) change when any helper in the closure
    changes. Checked against the real pair-table consumers."""
    from highload_kafka_streams_spark import qhash
    from highload_kafka_streams_spark import registry as reg

    reg.load_all()
    # the affinity consumers share _affinity_pairs -> _shingle_pair_base
    h_bfs = qhash.helper_hash(reg.QUERIES["q_graph_bfs_distance"])
    h_assort = qhash.helper_hash(reg.QUERIES["q_graph_assortativity"])
    assert h_bfs == h_assort != "0" * 16
    # cross-module lazy import: round6c's random walks reach the same
    # dedup helpers through `from ...dedup import _affinity_pairs`
    h_walks = qhash.helper_hash(reg.QUERIES["q_graph_random_walks"])
    assert h_walks != "0" * 16
    # a no-helper query hashes to the stable sentinel
    assert qhash.helper_hash(reg.QUERIES["q_filter"]) == "0" * 16


def test_query_hash_ledger_helpers_in_sync():
    """The committed ledger's `helpers` hashes must match the live
    transitive closures — i.e. qhash update was re-run after the last
    helper edit. (The main-hash sync test above catches query-body
    drift; this catches helper-only drift.)"""
    from highload_kafka_streams_spark import qhash

    ledger = qhash.load_ledger()
    assert ledger is not None
    cur = qhash.current_helper_hashes()
    stale = sorted(
        n for n, rec in ledger.items()
        if "helpers" in rec and rec["helpers"] != cur.get(n)
    )
    assert not stale, f"run qhash update; helper-stale entries: {stale}"


def test_helper_hash_resolves_relative_imports(tmp_path):
    """r9-advice: `from .dedup import _helper` inside a query body must
    contribute the helper to the hash closure (the old code resolved
    every relative import to the TOP package and silently dropped it).
    A relative-import query must hash identically to an absolute-import
    twin reaching the same helper."""
    import importlib.util
    import sys

    from highload_kafka_streams_spark import qhash

    src = (
        "def q_rel(spark, sf_dir):\n"
        "    from .dedup import _affinity_pairs\n"
        "    return _affinity_pairs(spark, sf_dir)\n"
        "\n"
        "def q_abs(spark, sf_dir):\n"
        "    from highload_kafka_streams_spark.llm.dedup import _affinity_pairs\n"
        "    return _affinity_pairs(spark, sf_dir)\n"
    )
    p = tmp_path / "relmod.py"
    p.write_text(src)
    name = "highload_kafka_streams_spark.llm._test_relmod"
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
        refs = qhash._referenced_private_fns(mod.q_rel)
        assert any(k.endswith("._affinity_pairs") for k in refs), refs
        h_rel = qhash.helper_hash(mod.q_rel)
        h_abs = qhash.helper_hash(mod.q_abs)
        assert h_rel == h_abs != "0" * 16
    finally:
        sys.modules.pop(name, None)
