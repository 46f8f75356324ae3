"""Physical-plan audit: the plan-shape checks the tests pin, exposed
as a reusable inspection tool.

Every operator in this engine ships with a scale contract (shuffle
budget, broadcast-only small sides, column-pruned scans, JVM-side
expressions).  ``plan_audit`` extracts those properties from a
DataFrame's executed plan so a deployment can assert them in CI for
its OWN queries — the same way ``tests/test_plan_shapes.py`` pins
ours — and ``audit_frame`` runs the audit over a whole query
dictionary (e.g. ``__spark_entry__.queries()``) producing one row per
query: the fleet-wide regression radar for "someone added a
repartition of the fact table".
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class PlanAudit:
    data_shuffles: int          # hash/range repartition exchanges
    roundrobin_repartitions: int  # explicit .repartition(n) fan-outs (full data movement, no key)
    single_partition_gathers: int  # Exchange SinglePartition (metadata-sized)
    broadcasts: int             # BroadcastExchange (small-side ships, no repartition)
    scans: int                  # FileScan sources
    scans_with_partition_filters: int  # partition-pruned scans
    scans_with_pushed_filters: int     # row-group/predicate pushdown reaching parquet
    codegen_spans: int          # WholeStageCodegen regions (JVM compiled pipelines)
    python_eval_nodes: int      # Arrow/Pandas eval operators (the sanctioned slow path)
    sorts: int
    bloom_filters: int          # runtime BloomFilter row filters injected on join probe sides


_PATTERNS = {
    "data_shuffles": r"Exchange (?:hash|range)partitioning",
    "roundrobin_repartitions": r"Exchange RoundRobinPartitioning",
    "single_partition_gathers": r"Exchange SinglePartition",
    "broadcasts": r"BroadcastExchange",
    "scans": r"FileScan",
    "codegen_spans": r"\*\(\d+\)",
    "python_eval_nodes": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|PythonMapInArrow",
    "sorts": r"\bSort \[",
    "bloom_filters": r"bloom_filter_agg|BloomFilterMightContain|might_contain",
}


def plan_audit(df: DataFrame) -> PlanAudit:
    """Audit a DataFrame's executed physical plan (static — the plan
    Catalyst chose, before AQE runtime re-planning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        k: len(re.findall(p, plan)) for k, p in _PATTERNS.items()
    }
    # codegen ids repeat on every operator row of a span; count spans
    counts["codegen_spans"] = len(
        set(re.findall(r"\*\((\d+)\)", plan))
    )
    scans = [
        chunk for chunk in plan.split("FileScan")[1:]
    ]
    part_filtered = sum(
        1
        for s in scans
        if re.search(r"PartitionFilters: \[[^\]]", s.split("\n")[0])
    )
    pushed = sum(
        1
        for s in scans
        if re.search(r"PushedFilters: \[[^\]]", s.split("\n")[0])
    )
    return PlanAudit(
        data_shuffles=counts["data_shuffles"],
        roundrobin_repartitions=counts["roundrobin_repartitions"],
        single_partition_gathers=counts["single_partition_gathers"],
        broadcasts=counts["broadcasts"],
        scans=counts["scans"],
        scans_with_partition_filters=part_filtered,
        scans_with_pushed_filters=pushed,
        codegen_spans=counts["codegen_spans"],
        python_eval_nodes=counts["python_eval_nodes"],
        sorts=counts["sorts"],
        bloom_filters=counts["bloom_filters"],
    )


def audit_frame(
    spark: SparkSession,
    queries: dict,
    sf_dir: str,
    names: list[str] | None = None,
) -> DataFrame:
    """One audit row per query callable — (query, *PlanAudit fields).

    Driver-side plan construction only; nothing executes.  Feed it
    ``__spark_entry__.queries()`` and diff against the previous run to
    catch plan regressions before they cost a cluster-day."""
    rows = []
    for name, fn in queries.items():
        if names is not None and name not in names:
            continue
        audit = plan_audit(fn(spark, sf_dir))
        rows.append({"query": name, **asdict(audit)})
    schema = (
        "query string, data_shuffles int, roundrobin_repartitions int, "
        "single_partition_gathers int, "
        "broadcasts int, scans int, scans_with_partition_filters int, "
        "scans_with_pushed_filters int, codegen_spans int, "
        "python_eval_nodes int, sorts int, bloom_filters int"
    )
    return spark.createDataFrame(rows, schema)
