"""Per-query content hashes — staleness detection for the driver window.

Round-4 verdict found a blind spot in the self-maintaining window
ordering: a query REWRITTEN after its driver-green round kept its old
evidence rank, so the driver never re-verified the new implementation
(concretely ``q_stream_late_data_drop``: rewritten in round 4, only
driver evidence from round 2, against the OLD code). Fix: every query
gets a content hash over its decorated source (which includes the
``@query`` decorator line and therefore the oracle SQL) plus the
registered oracle string, recorded in ``QUERY_HASHES.json`` at the repo
root as ``{name: {"hash": h, "since_round": N}}`` — "this
implementation has been in place since round N's verification ran".

``registry._driver_green_rounds`` then counts a green CORRECTNESS row
from round R only when the ledger says the CURRENT hash was already in
place at round R (``hash == current and since_round <= R``). A query
whose code or oracle changed after its last green round re-enters the
never-green tier and jumps to the front of the driver window.

Maintenance: run ``python -m highload_kafka_streams_spark.qhash update
--round N`` at the end of round N's build (part of the round-end
ritual). Entries whose hash changed (or are new) get
``since_round = N``; unchanged entries keep their earlier round.

Known limitation (documented, accepted): the hash covers the query
function's own source, not transitively the helpers it calls. A
behavior change hidden entirely in a shared helper will not bump the
hash; in practice every rewrite so far edited the query body, and the
oldest-evidence-first rotation still re-verifies everything eventually.
"""

from __future__ import annotations

import hashlib
import inspect
import json
from pathlib import Path

HASH_FILE = "QUERY_HASHES.json"


def content_hash(fn, oracle: str | None) -> str:
    """Hash of a query implementation: normalized function source
    (trailing-whitespace-insensitive, so formatting churn does not force
    re-verification) + the registered oracle SQL."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        # dynamically-created callable: fall back to stable code-object
        # facets (bytecode + consts repr) so the hash still moves when
        # behavior does
        code = getattr(fn, "__code__", None)
        src = repr((getattr(code, "co_code", b""), getattr(code, "co_consts", ())))
    norm = "\n".join(line.rstrip() for line in src.splitlines()).strip()
    h = hashlib.sha256()
    h.update(norm.encode("utf-8"))
    h.update(b"\x00")
    h.update((oracle or "").strip().encode("utf-8"))
    return h.hexdigest()[:16]


def current_hashes() -> dict[str, str]:
    """Content hash for every registered query (imports all modules)."""
    from . import registry

    registry.load_all()
    return {
        name: content_hash(fn, registry.ORACLE.get(name))
        for name, fn in registry.QUERIES.items()
    }


def repo_root() -> Path:
    return Path(__file__).resolve().parents[1]


def load_ledger(root: Path | None = None) -> dict[str, dict] | None:
    """The recorded ledger, or None if no ledger exists yet (legacy
    behavior: all green rows count)."""
    path = Path(root or repo_root()) / HASH_FILE
    if not path.exists():
        return None
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        return None
    return data if isinstance(data, dict) else None


def update_ledger(round_no: int, root: Path | None = None) -> dict[str, int]:
    """Refresh QUERY_HASHES.json against the live registry.

    Returns {"new": n, "changed": n, "unchanged": n, "removed": n}.
    """
    root = Path(root or repo_root())
    old = load_ledger(root) or {}
    cur = current_hashes()
    out: dict[str, dict] = {}
    stats = {"new": 0, "changed": 0, "unchanged": 0, "removed": 0}
    for name, h in sorted(cur.items()):
        prev = old.get(name)
        if prev is None:
            out[name] = {"hash": h, "since_round": round_no}
            stats["new"] += 1
        elif prev.get("hash") != h:
            out[name] = {"hash": h, "since_round": round_no}
            stats["changed"] += 1
        else:
            out[name] = prev
            stats["unchanged"] += 1
    stats["removed"] = len([n for n in old if n not in cur])
    (root / HASH_FILE).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    return stats


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    up = sub.add_parser("update", help="refresh QUERY_HASHES.json")
    up.add_argument("--round", type=int, required=True, dest="round_no")
    up.add_argument("--root", default=None)
    st = sub.add_parser("stale", help="list queries whose hash diverged from the ledger")
    st.add_argument("--root", default=None)
    ns = ap.parse_args(argv)
    if ns.cmd == "update":
        stats = update_ledger(ns.round_no, ns.root and Path(ns.root))
        print(json.dumps(stats))
    elif ns.cmd == "stale":
        ledger = load_ledger(ns.root and Path(ns.root)) or {}
        cur = current_hashes()
        stale = sorted(
            n for n, h in cur.items() if n not in ledger or ledger[n].get("hash") != h
        )
        print(json.dumps(stale))


if __name__ == "__main__":
    main()
