"""Full correctness sweep at multiple scale factors.

The driver samples ~50 of the registered queries per round, so a
regression in an unsampled query could hide indefinitely. This runs
``tools/check_correctness.py`` over EVERY registered query at each SF
(default sf0.001 + sf0.01) and appends one machine-readable record to
``PROGRESS.jsonl`` — the per-round documented green sweep.

Usage: python tools/sweep.py [sf_dir ...]
Exit code = total failures.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def run_sweep(sf_dir: str) -> dict:
    env = dict(os.environ)
    if sf_dir.rstrip("/").endswith("sf0.01"):
        # the committed full-registry artifact: per-query oracle results at
        # the driver's comparison SF, alongside its ~50-query sample
        env["CHECK_JSON_OUT"] = os.path.join(REPO, "CORRECTNESS_FULL.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), sf_dir],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    out = proc.stdout + proc.stderr
    matches = len(re.findall(r"\bMATCH\b", out))
    rows_only = len(re.findall(r"rows-only", out))
    m = re.search(r"(\d+) failures", out)
    failures = int(m.group(1)) if m else -1  # -1: crashed before summary
    return {
        "sf_dir": sf_dir,
        "match": matches,
        "rows_only": rows_only,
        "failures": failures,
        "rc": proc.returncode,
    }


def main() -> int:
    sfs = sys.argv[1:] or DEFAULT_SFS
    results = [run_sweep(sf) for sf in sfs]
    total_failures = sum(max(r["failures"], 0) + (1 if r["failures"] < 0 else 0) for r in results)
    record = {
        "ts": time.time(),
        "type": "correctness_sweep",
        "results": results,
        "green": total_failures == 0,
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    return total_failures


if __name__ == "__main__":
    raise SystemExit(main())
