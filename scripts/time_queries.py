"""Ad-hoc per-query timing: run named contract queries N times in one
session (min wall-clock), at any sf dir.  For iterating on plan shape
without full-bench noise.

Usage: python scripts/time_queries.py [sf_dir] [n_reps] [name_substr ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pats = sys.argv[3:] or [""]

    import __spark_entry__ as mod

    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark()
    qs = {
        n: fn
        for n, fn in mod.queries().items()
        if any(p in n for p in pats)
    }
    # warm the session
    spark.range(1).count()
    total = 0.0
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            best = min(best, time.monotonic() - t0)
        total += best
        print(f"  {name}: {best:.2f}s")
    print(f"TOTAL {total:.2f}s over {len(qs)} queries (min of {reps})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
