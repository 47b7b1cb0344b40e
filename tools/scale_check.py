#!/usr/bin/env python
"""Empirical scale-linearity check (VERDICT r4 item 4): run the bench
query sets at a base sf dir and at an N-times-larger derived fixture
(tools/gen_scale_fixture.py), and report per-query time ratios.

A query scaling ~linearly at 10x data on a fixed 32-thread box should
show time ratio <= ~factor (plus amortized fixed overhead, so usually
much less); a ratio well ABOVE the data factor flags super-linear work
(quadratic candidate growth, driver-side accumulation, broadcast of a
data-proportional table). Writes one JSON artifact.

Flag triage protocol (r7, AUTOMATED in r8): a superlinear flag from
this 1-run, ~140-query shared-JVM protocol is a LEAD, not a verdict —
fixed-overhead queries (driver-loop rounds of tiny jobs) are very
sensitive to GC pauses late in the session (observed: 33 s in-context
vs 3 s quiet for the same query+data). Every flag is therefore
re-measured automatically: the flagged queries re-run back-to-back at
both scales in fresh quiet JVMs (SPARK_GRAFT_BENCH_ONLY), and both
samples plus a machine verdict (confirmed_superlinear /
in_context_noise) land under `flag_triage` in the artifact.

Usage:
    python tools/scale_check.py --base /root/testdata/sf0.1 \
        --big .scale/sf1 --factor 10 --out SCALE_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, only: list[str] | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(only)
    # The 10x leg needs real heap: local-mode Spark puts ALL executor
    # memory inside the one driver JVM, and the 8g session default OOMs
    # a broadcast hash relation at sf1 (r7: q_dedup_minhash_lsh died in
    # UnsafeHashedRelation.readExternal). Both legs get the same value
    # so the ratios share a protocol. One timed pass per query for the
    # same reason (ratios, not absolutes).
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "1")
    out = subprocess.run(
        [sys.executable, os.path.join(_HERE, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=_HERE,
        timeout=10800,
    )
    # the JVM can interleave GC warnings into stdout under memory
    # pressure — and bench.py r8+ prints a COMPACT summary (headline
    # queries only) after the full record, so keep the parseable
    # bench line with the LARGEST queries dict, not merely the last
    candidates = []
    for line in out.stdout.strip().splitlines():
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            candidates.append(parsed)
    if candidates:
        return max(candidates, key=lambda d: len(d.get("queries", {})))
    raise RuntimeError(
        f"bench.py produced no JSON line (rc={out.returncode}); "
        f"stderr tail: {out.stderr[-500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", required=True)
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    ns = ap.parse_args()

    print(f"bench @ {ns.base} ...", file=sys.stderr)
    base = run_bench(ns.base)
    print(f"bench @ {ns.big} ...", file=sys.stderr)
    big = run_bench(ns.big)

    ratios = {
        n: round(big["queries"][n] / t, 2)
        for n, t in base["queries"].items()
        if n in big["queries"] and t > 0
    }
    # super-linear = scaling worse than the data factor itself; the
    # interesting band is ratio > factor (time grew MORE than the data)
    superlinear = {n: r for n, r in sorted(ratios.items()) if r > ns.factor}
    # Auto-remeasure (r7 verdict item 3): a flag from the 1-run shared-JVM
    # sweep is a LEAD, not a verdict — late-session GC pauses inflate
    # fixed-overhead queries 10x (observed 33 s in-context vs 3 s quiet).
    # Re-run every flagged query back-to-back at both scales in fresh
    # quiet JVMs and record both samples plus a machine verdict, so the
    # artifact carries its own triage instead of prose.
    triage = {}
    if superlinear:
        flagged = sorted(superlinear)
        print(
            f"remeasuring {len(flagged)} flagged query(ies) quietly ...",
            file=sys.stderr,
        )
        # ONE fresh JVM PER QUERY PER LEG (r8): the prior protocol ran
        # the whole flagged subset through one bench.py subprocess per
        # scale, and the host's sustained-load degradation lives exactly
        # there — an r8 run measured the same query at 27.5 s inside a
        # 6-query sequential leg and 2.35 s in a fresh JVM minutes
        # apart, which minted two false confirmed_superlinear verdicts.
        # Per-query JVMs cost ~10 s startup each but make the verdict
        # trustworthy; a confirmed_superlinear from THIS protocol is
        # actionable.
        for n in flagged:
            tb = run_bench(ns.base, [n])["queries"].get(n)
            tg = run_bench(ns.big, [n])["queries"].get(n)
            r2 = round(tg / tb, 2) if tb and tg else None
            triage[n] = {
                "first_ratio": superlinear[n],
                "remeasure_base_sec": tb,
                "remeasure_big_sec": tg,
                "remeasure_ratio": r2,
                "verdict": (
                    "remeasure_failed"
                    if r2 is None
                    else "confirmed_superlinear"
                    if r2 > ns.factor
                    else "in_context_noise"
                ),
            }
            print(f"  {n}: {tb} -> {tg} ({r2}x)", file=sys.stderr)
    artifact = {
        "metric": "scale_linearity",
        "factor": ns.factor,
        "base_sf_dir": ns.base,
        "big_sf_dir": ns.big,
        "base": {
            "value": base["value"],
            "extended_total_sec": base.get("extended_total_sec"),
            "tpch_total_sec": base.get("tpch_total_sec"),
            "queries": base["queries"],
        },
        "big": {
            "value": big["value"],
            "extended_total_sec": big.get("extended_total_sec"),
            "tpch_total_sec": big.get("tpch_total_sec"),
            "queries": big["queries"],
        },
        "time_ratio_per_query": ratios,
        "superlinear_over_factor": superlinear,
        "flag_triage": triage,
        "headline_ratio": round(big["value"] / base["value"], 2),
    }
    print(json.dumps(artifact))
    if ns.out:
        with open(os.path.join(_HERE, ns.out), "w") as f:
            json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
