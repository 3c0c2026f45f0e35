"""Assemble a CORRECTNESS_SCALE_r{N} artifact from scaled-sweep
logs/json parts plus rows carried from a prior round's artifact.

Carried evidence is legitimate (same fixture dir, deterministic
queries/oracles, unchanged code paths) but AGES: since r13 every row
records the round of its newest fresh scaled run (``fresh_round``),
and assembly FAILS if any row's freshest run is older than
MAX_CARRY_AGE rounds (VERDICT r12 #4) — the stratified refresh slice
each round must be chosen to keep the oldest rows inside the bound.

Usage:
  python scripts/assemble_scale_artifact.py OUT.json --round N \
      [--carry PRIOR.json] [--meta k=v ...] LOG_OR_JSON...

  - .json inputs: driver_sim --json-out files ({"results": {...}}) —
    every row in them is FRESH at --round
  - .log inputs:  driver_sim stdout ("name: ok" / "name: MISMATCH...")
  - --carry: a prior artifact; its rows (and their fresh_round map, or
    the round parsed from its filename for pre-r13 artifacts) fill in
    queries not re-run this round
Later inputs override earlier ones per query name; fresh inputs always
override carried rows.
"""

from __future__ import annotations

import json
import re
import sys

#: a row's newest fresh scaled run may be at most this many rounds old.
MAX_CARRY_AGE = 3


def parse_log(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path, errors="replace") as f:
        text = f.read().replace("\r", "\n")
    for line in text.splitlines():
        m = re.match(r"^([a-z][a-z0-9_]*): (ok|rows_only\S*|MISMATCH.*|ERROR.*)$", line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def load_carry(path: str) -> tuple[dict[str, str], dict[str, int]]:
    """(results, fresh_round per query) from a prior artifact. Pre-r13
    artifacts carry no fresh_round map — reconstruct conservatively:
    fresh_r{K} lists pin those rows at K, everything else at the
    artifact's own round minus one ply is unknowable, so fall back to
    the OLDEST round named in the file (carried_from_r{J} → J)."""
    with open(path) as f:
        d = json.load(f)
    point = d.get("point", d)
    results = dict(point["results"])
    fresh: dict[str, int] = {}
    if "fresh_round" in point:
        fresh.update({k: int(v) for k, v in point["fresh_round"].items()})
        return results, fresh
    own = re.search(r"r(\d+)", path)
    own_round = int(own.group(1)) if own else 0
    default = own_round
    for key, val in point.items():
        m = re.match(r"fresh_r(\d+)$", key)
        if m and isinstance(val, list):
            for name in val:
                fresh[name] = int(m.group(1))
        m = re.match(r"carried_from_r(\d+)$", key)
        if m and isinstance(val, list):
            for name in val:
                fresh[name] = int(m.group(1))
            default = min(default, int(m.group(1)))
    for name in results:
        fresh.setdefault(name, default)
    return results, fresh


def main() -> int:
    args = sys.argv[1:]
    out_path = args.pop(0)
    rnd = None
    carry_path = None
    meta: dict[str, str] = {}
    inputs: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--round":
            rnd = int(args.pop(0))
        elif a == "--carry":
            carry_path = args.pop(0)
        elif a == "--meta":
            k, _, v = args.pop(0).partition("=")
            meta[k] = v
        else:
            inputs.append(a)
    if rnd is None:
        print("--round N is required", file=sys.stderr)
        return 2

    results: dict[str, str] = {}
    fresh_round: dict[str, int] = {}
    if carry_path:
        results, fresh_round = load_carry(carry_path)
    fresh_names: list[str] = []
    for p in inputs:
        if p.endswith(".json"):
            with open(p) as f:
                part = json.load(f)["results"]
        else:
            part = parse_log(p)
        results.update(part)
        for name in part:
            fresh_round[name] = rnd
            fresh_names.append(name)

    bad = {
        n: r
        for n, r in results.items()
        if not (r == "ok" or r.startswith("rows_only"))
    }
    stale = {
        n: fresh_round.get(n, 0)
        for n in results
        if rnd - fresh_round.get(n, 0) > MAX_CARRY_AGE
    }
    ages = [rnd - fresh_round.get(n, rnd) for n in results]
    payload = {
        "round": rnd,
        "n": len(results),
        "n_green": len(results) - len(bad),
        "bad": bad,
        "fresh_this_round": sorted(set(fresh_names)),
        "carried": sorted(n for n in results if fresh_round.get(n) != rnd),
        "fresh_round": dict(sorted(fresh_round.items())),
        "max_carry_age": MAX_CARRY_AGE,
        "oldest_age": max(ages) if ages else 0,
        **meta,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        json.dumps(
            {
                "n": len(results),
                "ok": payload["n_green"],
                "bad": list(bad),
                "fresh": len(set(fresh_names)),
                "oldest_age": payload["oldest_age"],
                "stale_over_bound": stale,
            }
        )
    )
    if stale:
        print(
            f"FAIL: {len(stale)} rows' freshest scaled run is older than "
            f"{MAX_CARRY_AGE} rounds — refresh them this round",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
