"""Dump `explain("formatted")` for a subset of registered queries into
per-query text files — the before/after plan artifacts for optimization
rounds (`plans/r{N}/<query>_{before,after}.txt`).

Usage:
    python tools/dump_plans_subset.py REPO_ROOT SF_DIR OUT_DIR SUFFIX q1 q2 ...

REPO_ROOT may be a detached worktree of an older commit (the "before"
state); its own registry is imported. Queries missing from that
registry are skipped with a note (new registrations have no "before").
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo)

    from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions
    from etl_s3_to_redshift_spark.session import get_spark

    _load_extensions()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"dump_plans_{suffix}")
    for name in names:
        out = os.path.join(out_dir, f"{name}_{suffix}.txt")
        if name not in REGISTRY:
            print(f"SKIP {name}: not registered in {repo}")
            continue
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(out, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
