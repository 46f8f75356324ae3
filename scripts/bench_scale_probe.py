"""One-shot scaling probe over the /tmp replica (see
make_scale_probe.py): times a fixed set of heavy contract queries with
the bench's own method (noop sink, warm-up pass, min-of-N) at
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.  This is EVIDENCE
for the optimization log (BENCH_r14_sf1*.json), not a driver surface —
bench.py and its contract are untouched.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_scale_probe.py \
          [sf_dir] [sf_label] [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "checktable_lineitem",
    "fk_orphans",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "curation_funnel",
    "dedup_pairs",
    "text_winnow",
    "events_hourly_counts",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleprobe/sf1"
    label = sys.argv[2] if len(sys.argv) > 2 else "1.0-replica"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import __spark_entry__ as mod
    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-probe")
    qs = mod.queries()
    names = [n for n in QUERIES if n in qs]
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for n in names:  # warm-up sweep, same discipline as bench.py
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    timings = {}
    for n in names:
        # shed the PREVIOUS query's persisted frames: queries persist
        # intermediates for intra-query reuse and Spark's CacheManager
        # keeps those entries for the session; at this replica's size
        # the accumulated blocks from 5 earlier queries measurably
        # squeezed the later ones (dedup_pairs read 36 s mid-sequence
        # vs 7.8 s in a fresh session at the same core count).  Reps
        # of ONE query keep bench.py's warm-rep semantics.
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[n] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "scale_probe_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": label,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count(),
                "load_1m_at_start": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
