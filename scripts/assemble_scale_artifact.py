"""Assemble CORRECTNESS_SCALE_r10.json from the x30 full-catalog sweep
logs/json parts plus the standalone re-verifications of queries fixed
mid-sweep (the sweep process imports the registry at launch, so a fix
landing after launch is re-run separately and supersedes the stale
in-process result).

Usage: python scripts/assemble_scale_artifact.py OUT.json LOG_OR_JSON...
  - .json inputs: driver_sim --json-out files ({"results": {...}})
  - .log inputs:  driver_sim stdout (lines "name: ok" / "name: MISMATCH...")
Later inputs override earlier ones per query name.
"""

from __future__ import annotations

import json
import re
import sys


def parse_log(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path, errors="replace") as f:
        text = f.read().replace("\r", "\n")
    for line in text.splitlines():
        m = re.match(r"^([a-z][a-z0-9_]*): (ok|rows_only\S*|MISMATCH.*|ERROR.*)$", line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def main() -> int:
    out_path, *inputs = sys.argv[1:]
    results: dict[str, str] = {}
    for p in inputs:
        if p.endswith(".json"):
            with open(p) as f:
                results.update(json.load(f)["results"])
        else:
            results.update(parse_log(p))
    bad = {n: r for n, r in results.items() if not (r == "ok" or r.startswith("rows_only"))}
    with open(out_path, "w") as f:
        json.dump({"results": results, "n": len(results), "bad": bad}, f, indent=1)
    print(json.dumps({"n": len(results), "ok": len(results) - len(bad), "bad": list(bad)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
