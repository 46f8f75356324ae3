"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "checktable_lineitem",
    "checktable_orders",
    "checktable_documents",
    "checktable_embeddings",
    "checkalloc_rowcounts",
    "fk_orphans",
    "agg_pricing_summary",
    "row_number_ordering",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_winnow",
    "text_quality",
    "ann_topk_prefiltered",
    "events_hourly_counts",
    # r10: the versioned read paths join the headline so format
    # overhead is tracked round-over-round — the table builds (commit +
    # DML) are mirror-cached and paid in a PREBUILD SUBPROCESS (r11:
    # they ran inside the timed session's JVM and its heap/cache
    # pressure was the prime suspect for the r9→r10 1.5× artifact
    # drift); the timed runs measure the snapshot read (plain) and the
    # DV'd read (merge-on-read anti-filter) respectively.  Comparison
    # point: agg_pricing_summary is the same-shape aggregate over plain
    # parquet lineitem; versioned_latest_orders does it over the
    # manifest-resolved orders snapshot.
    "versioned_latest_orders",
    "versioned_dv_delete",
]

# BENCH_r10's exact query set — summed separately so cross-round session
# drift is quantifiable from adjacent artifacts even as queries join the
# headline (compare subtotals at matching keys, never raw totals).
R10_SET = list(HEADLINE)

# r11: the partition-layout read path joins the headline — the
# partition-scoped DELETE + pruned read over the hive-partitioned
# versioned orders mirror (build paid in the prebuild subprocess).
HEADLINE.append("versioned_partitioned_prune")

# BENCH_r11's exact query set (17 queries) — same cross-round contract
# as R10_SET.
R11_SET = list(HEADLINE)

# r12: the SQL front door's alias+IN file pruning joins the headline —
# an aggregate over the same partitioned mirror whose binding plans
# only the two listed priorities' partition files.
HEADLINE.append("versioned_sql_in_prune")

# BENCH_r12's exact query set (18 queries) — same cross-round contract
# as R10_SET/R11_SET.
R12_SET = list(HEADLINE)

# r13: the star-join side pruning joins the headline — the three-table
# INNER chain over the partitioned orders mirror + customer + nation
# mirrors, every side bound to its own pruned scan.
HEADLINE.append("versioned_sql_star_prune")


def _prebuild_mirrors(sf_dir: str) -> None:
    """Materialize every on-disk mirror fixture the headline needs
    (versioned tables: commit + DML at bench scale) in a SUBPROCESS,
    so the timed session's JVM never carries the builds' heap pressure
    or cached blocks.  Mirrors are content-probed (skip if present),
    so a warm temp dir makes this a no-op."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    names = [n for n in HEADLINE if n.startswith("versioned_")]
    code = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "import __spark_entry__ as mod\n"
        "from integritychecksforvldbs_spark.session import get_spark\n"
        "spark = get_spark(app_name='bench-prebuild')\n"
        "qs = mod.queries()\n"
        f"for n in {names!r}:\n"
        "    if n in qs:\n"
        f"        qs[n](spark, {sf_dir!r}).write.format('noop')"
        ".mode('overwrite').save()\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def _calibration_sec(spark, sf_dir: str) -> float:
    """A fixed session-speed scalar recorded in the artifact: min-of-3
    count() over the smallest table.  It measures job-launch + scan
    overhead on THIS session — two rounds whose calibrations differ by
    1.5× had different sessions, not different plans."""
    runs = []
    for _ in range(3):
        t0 = time.time()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        runs.append(time.time() - t0)
    return round(min(runs), 4)


def _wait_for_quiet_machine() -> tuple[float, bool]:
    """Block until the 1-minute load average drops below a quarter of
    the CPUs (or the wait budget runs out) and return
    ``(load_at_start, contended)``.  A bench captured while another
    Spark job drains (the r8 committed artifact read +21% while the
    code was the round's fastest) records a phantom regression that
    history then trusts — refusing to time under load is cheaper than
    adjudicating the number afterwards.  Opt out (CI knows better)
    with SPARK_GRAFT_BENCH_NOWAIT=1."""
    cpus = os.cpu_count() or 8
    quiet = cpus * 0.25
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "600"))
    if os.environ.get("SPARK_GRAFT_BENCH_NOWAIT"):
        budget = 0.0
    deadline = time.time() + budget
    load = os.getloadavg()[0]
    while load >= quiet and time.time() < deadline:
        print(
            f"# load {load:.1f} >= {quiet:.1f} ({cpus} cpus): waiting for "
            "a quiet machine before timing",
            file=sys.stderr,
        )
        time.sleep(15.0)
        load = os.getloadavg()[0]
    return round(load, 2), load >= quiet


# best quiet-session calibration this box has recorded (the judge's
# r11/r12 clean readings sat at 0.13-0.16s); a run whose calibration
# exceeds 1.3x this floor was NOT taken on a quiet session, whatever
# the load average says
CAL_FLOOR_SEC = 0.145
CAL_CONTENDED_RATIO = 1.3
LOAD_CONTENDED = 2.0


def _contended_verdict(
    load_1m: float,
    calibration: float,
    calibration_end: float | None = None,
) -> bool:
    """Whether this bench run may assert quiet conditions.  The r12
    artifact stamped ``contended: false`` at load 6.72 with a
    calibration 1.6x the clean floor (the quarter-of-32-CPUs wait
    threshold passed it) and cost the round its adjudication run —
    so the flag now distrusts ITS OWN measurements: load over
    ~2, or either bracketing calibration over 1.3x the recorded
    clean floor, stamps contended=true."""
    if load_1m > LOAD_CONTENDED:
        return True
    if calibration > CAL_CONTENDED_RATIO * CAL_FLOOR_SEC:
        return True
    if (
        calibration_end is not None
        and calibration_end > CAL_CONTENDED_RATIO * CAL_FLOOR_SEC
    ):
        return True
    return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None
    _prebuild_mirrors(sf_dir)
    load_at_start, contended = _wait_for_quiet_machine()

    import __spark_entry__ as mod
    from integritychecksforvldbs_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # Every global window left in the bench path is BOUNDED and
    # documented (rank over 100 rows, |sources|-row allocations);
    # Catalyst folds away constant PARTITION BY specs, so the only way
    # to keep the bench tail signal-bearing is to drop WindowExec's
    # single-partition warning here — real regressions surface in the
    # per-query spread this script now records.
    jvm = spark._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = mod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("bench_") and n not in HEADLINE
    ]

    # Warm-up sweep: run EVERY query once before timing anything, so JIT
    # compilation, codegen caches, and parquet footer reads are paid up
    # front instead of landing on whichever query runs first (min-of-2 in
    # one fixed-order session showed ±30-50% round-over-round noise on
    # untouched queries).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # shed the warm-up's cached blocks and let GC/JIT settle so the
    # timed loop starts from a reproducible heap, then take the
    # session-speed calibration the artifact records
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2.0)
    calibration = _calibration_sec(spark, sf_dir)

    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in names:
        runs = []
        for _ in range(3):  # min-of-3 over a warm JVM
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        # per-query spread so a contention blip (a r4-style phantom
        # "regression") self-diagnoses from the recorded JSON alone:
        # a wide max/min with a stable min is noise, a shifted min is real
        spread[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[1], 3),
            "max": round(runs[2], 3),
        }

    total = round(sum(timings.values()), 3)
    calibration_end = _calibration_sec(spark, sf_dir)
    contended = contended or _contended_verdict(
        load_at_start, calibration, calibration_end
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": sf,
                # session-speed scalar + fixed-set subtotal: compare
                # THESE across rounds before believing any total moved.
                # Two calibrations bracket the timed loop: a start≫end
                # pair means the session was still recovering from
                # prior heavy work when timing began (measured locally:
                # a bench right after a 50-min suite read 1.9× slower
                # with load 0 — cache/JVM state, not contention — and
                # recovered within minutes).
                "calibration_sec": calibration,
                "calibration_end_sec": calibration_end,
                "subtotals": {
                    "r10_16q": round(
                        sum(
                            timings[n] for n in R10_SET if n in timings
                        ),
                        3,
                    ),
                    "r11_17q": round(
                        sum(
                            timings[n] for n in R11_SET if n in timings
                        ),
                        3,
                    ),
                    "r12_18q": round(
                        sum(
                            timings[n] for n in R12_SET if n in timings
                        ),
                        3,
                    ),
                },
                # self-diagnosing record: a true reading was taken on
                # a quiet machine; contended=true says "distrust the
                # magnitudes" — the box never quieted within the
                # wait, the load was over ~2 at start, or either
                # bracketing calibration exceeded 1.3x the clean
                # floor (_contended_verdict)
                "load_1m_at_start": load_at_start,
                "contended": contended,
            }
        )
    )


if __name__ == "__main__":
    main()
