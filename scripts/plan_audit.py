"""Regenerate PLAN_AUDIT.json: one plans/audit.py row per contract
query.  Plan construction is driver-side; note that ITERATIVE
pipelines (curation_funnel, cluster keepers, leakage split) and the
mirror/index-building gates materialize their stage boundaries during
frame construction by design (localCheckpoint lineage truncation /
layout reuse), so those queries DO execute work here — the audited
plan is the stage-local plan a consumer actually holds.

Usage: python scripts/plan_audit.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"

    import __spark_entry__ as mod

    from dataclasses import asdict

    from integritychecksforvldbs_spark.plans.audit import plan_audit
    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark()
    out = {}
    for name, fn in mod.queries().items():
        try:
            out[name] = asdict(plan_audit(fn(spark, sf_dir)))
        except Exception as exc:  # keep going; record the failure
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"  {name}: {out[name]}")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path} ({len(out)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
