"""Similarity search over embedding columns (BASELINE.json north star).

Three tiers:

1. **Brute-force top-k** (:func:`brute_force_topk`) — broadcast the
   (small) query set against the corpus, score every pair with a
   strict left-to-right double fold (bitwise-portable to the DuckDB
   oracle, see operators.dedup), rank with a window.  Exact; the
   oracle for the other tiers.  The window shuffles |corpus|×|Q|
   score rows — fine to ~10⁹·Q, the verification scale.
2. **Local-top-k prefilter** (:func:`brute_force_topk_prefiltered`) —
   same scores; Spark's partial ``WindowGroupLimit`` (3.5+) keeps each
   partition's top-k per query below the exchange, so shuffle volume
   drops from |corpus|×|Q| to k×|partitions|×|Q| — the 100 TB path —
   with no Python boundary at all.  Output is provably identical to
   tier 1 (global top-k ⊆ union of partition top-ks).
3. **SRP-LSH ANN** (:func:`srp_ann_topk`) — sign-random-projection
   bucketing: b deterministic hyperplanes → b-bit bucket id; corpus
   is scored only inside the query's bucket (multi-probe: buckets
   within hamming ≤ ``probe_hamming``), then exactly re-ranked.
   Sub-linear candidate sets; approximate recall, measured against
   tier 1 in tests.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _dot, with_norm


def _empty_topk(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """Zero-row (query_id, vec_id, rank, cosine) frame with the id
    types of the inputs — the degenerate answer when a driver-side
    parameter probe (dim / quantization range / codebook sample) has
    no row to read."""
    return (
        queries.select("query_id")
        .limit(0)
        .crossJoin(corpus.select("vec_id").limit(0))
        .select(
            "query_id",
            "vec_id",
            F.lit(1).alias("rank"),
            F.lit(0.0).alias("cosine"),
        )
    )


def _score_pairs(corpus: DataFrame, queries: DataFrame) -> DataFrame:
    """Broadcast-join queries × corpus with exact cosine per pair.

    ``queries``: (query_id, embedding).  Self-matches dropped when ids
    collide.  ``cos_raw`` keeps full precision for ranking; ``cosine``
    is the rounded output value.
    """
    c = with_norm(corpus).select(
        F.col("vec_id"), F.col("embedding").alias("cv"), F.col("norm").alias("cn")
    )
    q = with_norm(queries).select(
        F.col("query_id"), F.col("embedding").alias("qv"), F.col("norm").alias("qn")
    )
    return (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, rank, cosine).

    Deterministic tie-break on vec_id so ranks are reproducible and
    portable across engines.
    """
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        _score_pairs(corpus, queries)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def brute_force_topk_prefiltered(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Tier 1 with the per-partition top-k prefilter before the window.

    Spark 3.5+ plans ``row_number() ... WHERE rank <= k`` with a
    partial ``WindowGroupLimit`` BELOW the exchange, so every map task
    already emits at most k rows per query — the exact shuffle
    reduction the old Arrow ``mapInPandas`` nlargest prefilter bought
    (k × |partitions| × |Q| rows), but entirely in the JVM with no
    Python boundary.  The prefilter was therefore redundant: dropping
    it removed the MapInPandas node and its worker round-trip while
    keeping the result provably identical (the global top-k is
    contained in the union of partition top-ks either way).
    """
    return brute_force_topk(corpus, queries, k=k)


def topk_oracle(
    table: str = "embeddings", n_queries: int = 8, k: int = 5
) -> str:
    """DuckDB oracle for tier 1 with queries = vec_id < n_queries.
    Same fold order → bitwise-equal cos_raw → identical ranking."""
    return f"""
WITH nd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x)) AS norm
  FROM {table}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         list_reduce(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]),
                     (acc, x) -> acc + x) / (q.norm * c.norm) AS cos_raw
  FROM nd q JOIN nd c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
),
ranked AS (
  SELECT query_id, vec_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, round(cos_raw, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# SRP-LSH ANN
# ---------------------------------------------------------------------------


def srp_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit Gaussian components)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """b-bit SRP bucket id: bit i = sign of <vec, plane_i>."""
    bits = []
    for i, p in enumerate(planes):
        dot = F.expr(
            f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), "
            f"{_array_sql(p)}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _array_sql(xs: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in xs) + ")"


def _argmax_cell_vec(vec_col: str, centroids: list[list[float]]) -> Column:
    """Vectorized twin of :func:`_cell_expr` (bit-identical folds and
    first-position tie behavior — tests/test_veccompute.py); the
    expression form stays as the semantic reference."""
    from integritychecksforvldbs_spark.functions.veccompute import argmax_cell

    return argmax_cell(vec_col, centroids)


def _neighbors_within_hamming(bucket: int, n_bits: int, h: int) -> list[int]:
    """All bucket ids within hamming distance ≤ h (multi-probe set)."""
    out = {bucket}
    frontier = {bucket}
    for _ in range(h):
        nxt = set()
        for b in frontier:
            for i in range(n_bits):
                nxt.add(b ^ (1 << i))
        out |= nxt
        frontier = nxt
    return sorted(out)


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """IVF training: Lloyd's k-means on a bounded driver-side sample.

    Standard IVF practice — centroids are trained on a sample (their
    quality needs only thousands of points regardless of corpus size),
    then assignment runs distributed.  Deterministic: fixed seed,
    sample = first ``sample`` rows by vec_id."""
    rows = (
        corpus.orderBy("vec_id").limit(sample).select("embedding").collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        d = X @ C.T  # cosine similarity on normalized vectors
        assign = d.argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C.tolist()


def _cell_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """argmax-similarity centroid id as a JVM expression (one pass,
    no Python): array of k dot-product folds → position of the max."""
    dots = ", ".join(
        f"aggregate(zip_with(CAST({vec_col} AS ARRAY<DOUBLE>), {_array_sql(c)}, "
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        for c in centroids
    )
    return (
        F.expr(f"array_position(array({dots}), array_max(array({dots})))")
        .cast("int")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: k-means cells over the corpus, each
    query scores only the ``nprobe`` cells nearest its own position,
    then exact re-rank.  Candidate fraction ≈ nprobe/n_cells of the
    corpus; on a real deployment the corpus is written partitioned by
    cell id so the probe prunes partitions at the scan."""
    centroids = kmeans_centroids(corpus, k=n_cells, seed=seed)
    C = np.array(centroids)
    c = with_norm(corpus).select(
        "vec_id",
        F.col("embedding").alias("cv"),
        F.col("norm").alias("cn"),
        _argmax_cell_vec("embedding", centroids).alias("cell"),
    )
    q_rows = (
        with_norm(queries).filter(F.col("embedding").isNotNull()).collect()
    )  # NULL-embedding queries can match nothing; skip the driver-side prep
    spark = corpus.sparkSession
    probe_rows = []
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qn = np.linalg.norm(qv)
        sims = C @ (qv / max(qn, 1e-12))
        # cells are 1-based (array_position)
        for cell in (np.argsort(-sims)[:nprobe] + 1).tolist():
            probe_rows.append((r["query_id"], int(cell)))
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    # VALUES LocalRelations: createDataFrame(list) ships a Python RDD
    # whose workers re-spin on EVERY action (~0.26 s per frame)
    probes = local_relation(
        spark, probe_rows, [("query_id", "BIGINT"), ("cell", "INT")]
    )
    qdf = local_relation(
        spark,
        [(r["query_id"], list(r["embedding"]), r["norm"]) for r in q_rows],
        [("query_id", "BIGINT"), ("qv", "ARRAY<FLOAT>"), ("qn", "DOUBLE")],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        c.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def srp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-table sign-random-projection LSH.

    ``n_tables`` independent b-bit bucketings (OR-amplification); a
    corpus vector is a candidate if ANY table puts it within
    ``probe_hamming`` of the query's bucket in that table.  Candidates
    are exactly re-ranked.  For neighbors at cosine s, per-bit
    agreement is p = 1 − arccos(s)/π, per-table hit ≈ Σ_{i≤h}
    C(b,i)·p^{b−i}(1−p)^i, and recall = 1 − (1 − hit)^L — e.g. s=0.9,
    b=12, h=1, L=8 → ≈0.99 while scoring ~a few % of the corpus per
    query.  On structure-free (random) corpora no sub-linear method
    retains recall — measured in tests on planted clusters instead.

    Output may have <k rows per query when buckets are sparse (ANN
    semantics).  Scale: the corpus is scanned once to compute L bucket
    ids (one pass, codegen), the probe join is a broadcast hash join
    on (table, bucket), and only candidates are scored.
    """
    probe = (
        queries.filter(F.col("embedding").isNotNull()).select("embedding").first()
    )
    if probe is None:  # no (non-NULL) queries → no rows, but keep the schema
        return _empty_topk(corpus, queries)
    dim = len(probe[0])
    spark = corpus.sparkSession

    c = with_norm(corpus)
    q = with_norm(queries)
    from integritychecksforvldbs_spark.functions.veccompute import (
        srp_bucket_array,
    )

    tables = [srp_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    # corpus side: all n_tables buckets in one vectorized kernel pass
    # (the per-plane expression form stays on the ≤|queries| driver
    # rows below; bit-identical — tests/test_veccompute.py)
    bucket_cols_q = [_bucket_expr("embedding", p) for p in tables]
    c = c.select(
        "vec_id",
        F.col("embedding").alias("cv"),
        F.col("norm").alias("cn"),
        F.posexplode(srp_bucket_array("embedding", tables)).alias(
            "table_id", "bucket"
        ),
    )
    q_rows = q.select(
        "query_id",
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qn"),
        *[b.alias(f"b{t}") for t, b in enumerate(bucket_cols_q)],
    ).collect()

    probe_rows = [
        (r["query_id"], t, nb)
        for r in q_rows
        for t in range(n_tables)
        for nb in _neighbors_within_hamming(r[f"b{t}"], n_planes, probe_hamming)
    ]
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    probes = local_relation(
        spark,
        probe_rows,
        [("query_id", "BIGINT"), ("table_id", "INT"), ("bucket", "INT")],
    )
    qdf = local_relation(
        spark,
        [(r["query_id"], list(r["qv"]), r["qn"]) for r in q_rows],
        [("query_id", "BIGINT"), ("qv", "ARRAY<FLOAT>"), ("qn", "DOUBLE")],
    )
    cands = (
        c.join(F.broadcast(probes), ["table_id", "bucket"])
        .select("query_id", "vec_id", "cv", "cn")
        .dropDuplicates(["query_id", "vec_id"])  # collisions across tables — score once
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        cands.select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF with partition-pruned scans (the 100 TB layout)
# ---------------------------------------------------------------------------


def ivf_write_partitioned(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    seed: int = 42,
) -> list[list[float]]:
    """Write the corpus PARTITIONED BY its IVF cell id, with the
    centroids stored alongside (``_centroids/``, underscore-prefixed
    so table discovery ignores it).

    This is the layout that makes IVF sub-linear at 100 TB: a probe
    of ``nprobe`` cells becomes a partition-pruning filter at the
    parquet scan — only nprobe/n_cells of the files are ever opened,
    verified by the PartitionFilters plan probe in tests.  One-time
    cost: the partitioned write shuffles the corpus once by cell.
    """
    centroids = kmeans_centroids(corpus, k=n_cells, seed=seed)
    spark = corpus.sparkSession
    (
        corpus.withColumn("cell", _argmax_cell_vec("embedding", centroids))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    (
        spark.createDataFrame(
            [(i + 1, c) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(f"{path}/_centroids")
    )
    return centroids


def ivf_topk_partition_pruned(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over a cell-partitioned corpus: load the stored
    centroids, pick each query's ``nprobe`` nearest cells on the
    driver (|Q| × n_cells doubles — metadata-sized), and scan ONLY
    those partitions via an ``isin`` partition filter before the
    exact re-rank.  Same output as :func:`ivf_ann_topk` at equal
    centroids/nprobe."""
    crows = spark.read.json(f"{path}/_centroids").collect()
    centroids = {int(r["cell"]): list(r["centroid"]) for r in crows}
    C = np.array([centroids[i] for i in sorted(centroids)])
    q_rows = (
        with_norm(queries).filter(F.col("embedding").isNotNull()).collect()
    )  # NULL-embedding queries can match nothing; skip the driver-side prep
    probe_rows = []
    probed_cells: set[int] = set()
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        sims = C @ (qv / max(np.linalg.norm(qv), 1e-12))
        for cell in (np.argsort(-sims)[:nprobe] + 1).tolist():
            probe_rows.append((r["query_id"], int(cell)))
            probed_cells.add(int(cell))
    corpus = spark.read.parquet(path).filter(
        F.col("cell").isin(sorted(probed_cells))  # prunes partitions
    )
    c = with_norm(corpus).select(
        "vec_id", F.col("embedding").alias("cv"), F.col("norm").alias("cn"), "cell"
    )
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    # VALUES LocalRelations: createDataFrame(list) ships a Python RDD
    # whose workers re-spin on EVERY action (~0.26 s per frame)
    probes = local_relation(
        spark, probe_rows, [("query_id", "BIGINT"), ("cell", "INT")]
    )
    qdf = local_relation(
        spark,
        [(r["query_id"], list(r["embedding"]), r["norm"]) for r in q_rows],
        [("query_id", "BIGINT"), ("qv", "ARRAY<FLOAT>"), ("qn", "DOUBLE")],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        c.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# tier 4: int8 scalar quantization (compressed-corpus ANN)
# ---------------------------------------------------------------------------

SQ_LEVELS = 255


def sq_params(df: DataFrame, vec_col: str = "embedding") -> tuple[list, list]:
    """Per-dimension (lo, hi) quantization ranges in ONE job:
    posexplode → groupBy(dim) with map-side partial min/max (each
    task emits at most dim rows), dim tiny rows collected.  Replaces
    the former first()-probe + 2·dim-expression wide agg: one job
    instead of two, no O(dim) codegen surface, and no dim ceiling."""
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
        .collect()
    )
    if not rows:
        raise ValueError("sq_params: no non-NULL vectors to quantize")
    rows.sort(key=lambda r: r["pos"])
    return [float(r["lo"]) for r in rows], [float(r["hi"]) for r in rows]


def _lit_array(xs: list) -> str:
    return "array(" + ", ".join(repr(float(x)) for x in xs) + ")"


def sq_quantize(
    df: DataFrame,
    los: list,
    his: list,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Affine per-dimension int8 quantization: code_i = round(255 ·
    (x_i − lo_i)/(hi_i − lo_i)), clamped to [0, 255]; constant
    dimensions (hi = lo) collapse to code 0.  Pure JVM ``transform``
    over literal range arrays — no UDF.  The quantized table is the
    artifact a 100 TB deployment persists: 4× smaller than float32
    (scan time at that scale IS the query time), with the float
    column kept only for the exact re-rank of candidates."""
    lo, hi = _lit_array(los), _lit_array(his)
    codes = F.expr(
        f"transform({vec_col}, (x, i) -> CAST(IF("
        f"element_at({hi}, i + 1) = element_at({lo}, i + 1), 0, "
        f"least({SQ_LEVELS}, greatest(0, round("
        f"(CAST(x AS DOUBLE) - element_at({lo}, i + 1)) * {SQ_LEVELS} / "
        f"(element_at({hi}, i + 1) - element_at({lo}, i + 1)))))) AS INT))"
    )
    return df.withColumn(code_col, codes)


def sq_dequantize_expr(
    los: list, his: list, code_col: str = "codes"
) -> Column:
    """Reconstruction x̂_i = lo_i + code_i·(hi_i − lo_i)/255 as an
    ``array<double>`` expression; max per-dimension error is half a
    quantization step, (hi_i − lo_i)/510."""
    lo, hi = _lit_array(los), _lit_array(his)
    return F.expr(
        f"transform({code_col}, (c, i) -> element_at({lo}, i + 1) + "
        f"CAST(c AS DOUBLE) * (element_at({hi}, i + 1) - element_at({lo}, i + 1))"
        f" / {SQ_LEVELS})"
    )


def sq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    oversample: int = 4,
    los: list | None = None,
    his: list | None = None,
) -> DataFrame:
    """ANN over the int8-quantized corpus with exact re-rank: score
    every (query, vector) pair on the RECONSTRUCTED embedding (reads
    the 4×-smaller code column — at 100 TB the scan is the cost, not
    the FLOPs), keep each query's top ``k·oversample`` candidates,
    then join those candidate ids back to the float column for exact
    cosine and the final top-k.  Output schema matches
    :func:`brute_force_topk`; recall vs the exact tier is pinned in
    tests (8-bit reconstruction ranks so close to exact that modest
    oversampling recovers the true top-k).
    """
    queries = queries.filter(F.col("embedding").isNotNull())
    if los is None or his is None:
        try:
            los, his = sq_params(corpus)
        except ValueError:  # no non-NULL vectors: nothing to rank
            return _empty_topk(corpus, queries)
    qcodes = sq_quantize(corpus, los, his).select("vec_id", "codes")
    recon = sq_dequantize_expr(los, his)
    approx = (
        qcodes.select("vec_id", recon.alias("rv"))
        .select(
            "vec_id",
            F.col("rv").alias("cv"),
            F.sqrt(
                F.aggregate(
                    "rv", F.lit(0.0), lambda a, x: a + x * x
                )
            ).alias("cn"),
        )
        .join(
            F.broadcast(
                with_norm(queries).select(
                    "query_id",
                    F.col("embedding").alias("qv"),
                    F.col("norm").alias("qn"),
                )
            ),
            F.col("vec_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("approx_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_raw").desc(), F.col("vec_id")
    )
    cands = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= k * oversample)
        .select("query_id", "vec_id")
    )
    c = with_norm(corpus).select(
        "vec_id", F.col("embedding").alias("cv"), F.col("norm").alias("cn")
    )
    q = with_norm(queries).select(
        "query_id", F.col("embedding").alias("qv"), F.col("norm").alias("qn")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        cands.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# tier 5: product quantization (PQ-ADC)
# ---------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """PQ codebooks: split the (L2-normalized) vector into ``m``
    subspaces and run Euclidean Lloyd's k-means per subspace on a
    bounded driver-side sample — the same train-on-sample practice as
    IVF (:func:`kmeans_centroids`); codebook quality saturates at
    thousands of points regardless of corpus size.  Returns m × k
    centroids of dim/m.  Deterministic (fixed seed, first-N sample).
    """
    rows = (
        corpus.filter(F.col(vec_col).isNotNull())
        .orderBy("vec_id")
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * d : (j + 1) * d]
        C = S[rng.choice(len(S), size=min(k, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c_i in range(len(C)):
                members = S[assign == c_i]
                if len(members):
                    C[c_i] = members.mean(axis=0)
        books.append(C.tolist())
    return books


def _pq_code_expr(norm_vec_col: str, books: list[list[list[float]]]) -> Column:
    """codes = array of per-subspace argmin-L2 centroid ids (0-based)
    over an ALREADY-normalized vector column — pure JVM folds, no UDF.
    Normalization must be materialized once upstream: inlining the
    norm fold here would replicate it into every one of the m·k
    distance expressions and blow up the codegen tree."""
    d = len(books[0][0])
    parts = []
    for j, book in enumerate(books):
        sub = f"slice({norm_vec_col}, {j * d + 1}, {d})"
        dists = ", ".join(
            f"aggregate(zip_with({sub}, {_array_sql(c)}, "
            "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
            for c in book
        )
        parts.append(
            f"CAST(array_position(array({dists}), array_min(array({dists}))) AS INT) - 1"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Attach the PQ code array (m small ints — dim/m·32× smaller than
    float32; 64-dim → 8 bytes/vector at m=8, k=16).  This is the
    persisted artifact: at 100 TB the float column stays cold and only
    candidate rows are ever fetched for re-rank."""
    from integritychecksforvldbs_spark.functions.veccompute import pq_codes

    # one vectorized kernel pass replaces the m·k interpreted
    # (x-y)² folds per vector (and the ~20 KB dists SQL the expression
    # form parsed per call); parity pinned by tests/test_veccompute.py
    return corpus.withColumn(code_col, pq_codes(vec_col, books))


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    oversample: int = 4,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ-ADC ANN: asymmetric distance computation — each query
    precomputes (driver-side, |Q|·m·k doubles) a lookup table of
    dot(query-subvector, centroid); the approximate score of a corpus
    vector is then m table lookups over its code array, evaluated as
    a JVM fold (no decode, no float vector read).  Top ``k·oversample``
    candidates per query re-rank exactly on the float column.

    The scan cost at scale is m lookups over an 8-byte code column —
    the FAISS IVF-ADC architecture re-expressed declaratively; combine
    with :func:`ivf_write_partitioned` partition pruning for the full
    IVF-PQ layout.  Recall vs the exact tier is pinned in tests on
    clustered data.
    """
    if books is None:
        if corpus.filter(F.col("embedding").isNotNull()).select("vec_id").first() is None:
            return _empty_topk(corpus, queries)
        books = pq_train(corpus, m=m, k=n_codes)
    m = len(books)
    coded = pq_encode(corpus, books).select("vec_id", "pq_codes")

    q_rows = (
        with_norm(queries).filter(F.col("embedding").isNotNull()).collect()
    )  # NULL-embedding queries can match nothing; skip the driver-side prep
    spark = corpus.sparkSession
    lut_rows = []
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qn = qv / max(float(r["norm"]), 1e-12)
        d = len(qn) // m
        lut = [
            [float(np.dot(qn[j * d : (j + 1) * d], np.array(c))) for c in book]
            for j, book in enumerate(books)
        ]
        lut_rows.append((r["query_id"], lut))
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    luts = local_relation(
        spark,
        lut_rows,
        [("query_id", "BIGINT"), ("lut", "ARRAY<ARRAY<DOUBLE>>")],
    )

    adc = (
        f"aggregate(sequence(1, {m}), 0D, (acc, j) -> acc + "
        f"element_at(element_at(lut, j), element_at(pq_codes, j) + 1))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_raw").desc(), F.col("vec_id")
    )
    cands = (
        coded.join(F.broadcast(luts), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(adc).alias("approx_raw"))
        .withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= k * oversample)
        .select("query_id", "vec_id")
    )
    c = with_norm(corpus).select(
        "vec_id", F.col("embedding").alias("cv"), F.col("norm").alias("cn")
    )
    q = with_norm(queries).select(
        "query_id", F.col("embedding").alias("qv"), F.col("norm").alias("qn")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        cands.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# tier 6: IVF-PQ (partition-pruned cells × PQ-ADC scoring)
# ---------------------------------------------------------------------------

import json as _json


def ivf_pq_write(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """The full FAISS-style IVF-PQ layout, declaratively: the corpus
    is written PARTITIONED BY IVF cell with a PQ code column beside
    the float embedding, centroids and codebooks stored alongside as
    underscore-prefixed sidecars.  One shuffle (the partitioned
    write).  Queries then (1) prune to nprobe cells at the parquet
    scan, (2) rank candidates reading ONLY the 8-byte code column —
    column pruning keeps the float column unread, pinned by a
    ReadSchema plan probe — and (3) fetch floats for just the
    candidate rows."""
    centroids = kmeans_centroids(corpus, k=n_cells, seed=seed)
    books = pq_train(corpus, m=m, k=n_codes, seed=seed)
    spark = corpus.sparkSession
    (
        pq_encode(corpus, books)
        .withColumn("cell", _argmax_cell_vec("embedding", centroids))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    (
        spark.createDataFrame(
            [(i + 1, c) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(f"{path}/_centroids")
    )
    (
        spark.createDataFrame(
            [(j, _json.dumps(b)) for j, b in enumerate(books)],
            "subspace int, book string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .json(f"{path}/_pq_books")
    )
    return centroids, books


def ivf_pq_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    oversample: int = 4,
) -> DataFrame:
    """ANN over an :func:`ivf_pq_write` layout: driver-side cell
    probe (|Q| × n_cells doubles), partition-pruned scan of the code
    column, ADC fold against broadcast per-query lookup tables,
    top ``k·oversample`` candidates, exact re-rank on the float
    column of the SAME pruned partitions.  At 100 TB the candidate
    scan reads nprobe/n_cells of the files and 1/32nd of the bytes
    within them — the scan-bound architecture for trillion-row
    vector search."""
    crows = spark.read.json(f"{path}/_centroids").collect()
    centroids = {int(r["cell"]): list(r["centroid"]) for r in crows}
    C = np.array([centroids[i] for i in sorted(centroids)])
    brows = spark.read.json(f"{path}/_pq_books").collect()
    books = [
        _json.loads(r["book"])
        for r in sorted(brows, key=lambda r: int(r["subspace"]))
    ]
    m = len(books)

    q_rows = (
        with_norm(queries).filter(F.col("embedding").isNotNull()).collect()
    )  # NULL-embedding queries can match nothing; skip the driver-side prep
    probe_rows, lut_rows = [], []
    probed_cells: set[int] = set()
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qn = qv / max(float(r["norm"]), 1e-12)
        sims = C @ qn
        for cell in (np.argsort(-sims)[:nprobe] + 1).tolist():
            probe_rows.append((r["query_id"], int(cell)))
            probed_cells.add(int(cell))
        d = len(qn) // m
        lut = [
            [float(np.dot(qn[j * d : (j + 1) * d], np.array(c))) for c in book]
            for j, book in enumerate(books)
        ]
        lut_rows.append((r["query_id"], lut))

    pruned = spark.read.parquet(path).filter(
        F.col("cell").isin(sorted(probed_cells))
    )
    from integritychecksforvldbs_spark.functions.planutil import (
        local_relation,
    )

    probes = local_relation(
        spark, probe_rows, [("query_id", "BIGINT"), ("cell", "INT")]
    )
    luts = local_relation(
        spark,
        lut_rows,
        [("query_id", "BIGINT"), ("lut", "ARRAY<ARRAY<DOUBLE>>")],
    )
    adc = (
        f"aggregate(sequence(1, {m}), 0D, (acc, j) -> acc + "
        f"element_at(element_at(lut, j), element_at(pq_codes, j) + 1))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_raw").desc(), F.col("vec_id")
    )
    cands = (
        pruned.select("vec_id", "pq_codes", "cell")
        .join(F.broadcast(probes), "cell")
        .join(F.broadcast(luts), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(adc).alias("approx_raw"))
        .withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= k * oversample)
        .select("query_id", "vec_id")
    )
    c = with_norm(pruned.select("vec_id", "embedding")).select(
        "vec_id", F.col("embedding").alias("cv"), F.col("norm").alias("cn")
    )
    qdf = local_relation(
        spark,
        [(r["query_id"], list(r["embedding"]), r["norm"]) for r in q_rows],
        [("query_id", "BIGINT"), ("qv", "ARRAY<FLOAT>"), ("qn", "DOUBLE")],
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("vec_id")
    )
    return (
        cands.join(c, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_raw"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )
