"""Dump `.explain("formatted")` for named queries to <out_dir>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <query> [<query> ...]

Run with repo_root pointing at a git worktree of an older commit to capture
"before" plans; at the live repo for "after" plans. sf dir fixed at sf0.01
(plan shape is sf-independent; sf0.01 keeps capture fast).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo_root)
    os.makedirs(out_dir, exist_ok=True)
    from stream_loader_spark.session import get_spark

    from stream_loader_spark.plans.queries import QUERIES  # noqa: E402

    spark = get_spark("dump_plans")
    sf_dir = "/root/testdata/sf0.01"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
