"""Similarity search: exact top-k vs numpy, prefiltered == brute
force, SRP-ANN recall and candidate sub-linearity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import similarity
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def numpy_topk(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = n @ n.T

    def topk(qid: int, k: int) -> list[int]:
        sims = S[np.where(ids == qid)[0][0]]
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        return [i for _, i in order[:k]]

    return topk


def test_brute_force_topk_matches_numpy(emb, queries, numpy_topk):
    got = similarity.brute_force_topk(emb, queries, k=5).collect()
    by_q: dict[int, list[tuple[int, int]]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid, pairs in by_q.items():
        ordered = [v for _, v in sorted(pairs)]
        assert ordered == numpy_topk(qid, 5), f"query {qid}"
    assert set(by_q) == {0, 1, 2, 3}


def test_topk_excludes_self(emb, queries):
    got = similarity.brute_force_topk(emb, queries, k=5)
    assert got.filter(F.col("query_id") == F.col("vec_id")).count() == 0


def test_prefiltered_identical_to_bruteforce(emb, queries):
    a = {tuple(r) for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    b = {
        tuple(r)
        for r in similarity.brute_force_topk_prefiltered(emb, queries, k=5).collect()
    }
    assert a == b


def test_srp_ann_recall_on_clustered_data(spark):
    """On a corpus with real neighbor structure (planted clusters at
    cosine ≈0.9+), multi-table SRP ANN recovers nearly all true
    neighbors.  (The fixture embeddings are random — mean pairwise
    cosine ~0; no sub-linear method has recall there, so recall is
    measured where it is information-theoretically possible.)"""
    rng = np.random.default_rng(7)
    dim, n_clusters, per_cluster = 32, 20, 25
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            # noise norm² ≈ 0.06²·32 ≈ 0.12 → cos(v, center) ≈ 0.94
            v = c + 0.06 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id").isin([0, 25, 50, 75])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(corpus, queries, k=5).collect()
    approx = similarity.srp_ann_topk(
        corpus, queries, k=5, n_planes=12, n_tables=8, probe_hamming=1
    ).collect()
    true_sets: dict[int, set[int]] = {}
    for r in exact:
        true_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict[int, set[int]] = {}
    for r in approx:
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_srp_buckets_deterministic(emb):
    planes = similarity.srp_planes(64, 8, seed=42)
    b1 = emb.select(
        "vec_id", similarity._bucket_expr("embedding", planes).alias("b")
    ).collect()
    b2 = emb.select(
        "vec_id", similarity._bucket_expr("embedding", planes).alias("b")
    ).collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))
    buckets = {r["b"] for r in b1}
    assert len(buckets) > 8  # spread across the 256 possible buckets


def test_neighbors_within_hamming():
    out = similarity._neighbors_within_hamming(0b0000, 4, 1)
    assert out == [0b0000, 0b0001, 0b0010, 0b0100, 0b1000]
    assert len(similarity._neighbors_within_hamming(0, 8, 2)) == 1 + 8 + 28


def test_ivf_ann_recall_on_clustered_data(spark):
    """IVF with nprobe cells recovers nearly all true neighbors on a
    clustered corpus while scoring ~nprobe/n_cells of it."""
    rng = np.random.default_rng(11)
    dim, n_clusters, per_cluster = 32, 20, 25
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.06 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id").isin([0, 25, 50, 75])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(corpus, queries, k=5).collect()
    approx = similarity.ivf_ann_topk(
        corpus, queries, k=5, n_cells=16, nprobe=4
    ).collect()
    true_sets: dict[int, set[int]] = {}
    for r in exact:
        true_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict[int, set[int]] = {}
    for r in approx:
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_cells_cover_corpus(spark, emb):
    cents = similarity.kmeans_centroids(emb, k=8)
    assert len(cents) == 8
    cells = emb.select(
        similarity._cell_expr("embedding", cents).alias("cell")
    ).groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == emb.count()
    assert all(1 <= r["cell"] <= 8 for r in cells)


def test_ivf_deterministic(spark, emb):
    a = similarity.kmeans_centroids(emb, k=8, seed=7)
    b = similarity.kmeans_centroids(emb, k=8, seed=7)
    assert a == b


def test_ivf_partition_pruned_matches_inmemory(spark, emb, tmp_path):
    """The cell-partitioned layout returns exactly the in-memory IVF
    result at equal centroids/nprobe, and the probe REACHES THE SCAN:
    the parquet read carries a partition filter on cell, so only
    nprobe-worth of partitions are listed."""
    path = str(tmp_path / "emb_ivf")
    similarity.ivf_write_partitioned(emb, path, n_cells=8, seed=42)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pruned = similarity.ivf_topk_partition_pruned(
        spark, path, queries, k=5, nprobe=3
    )
    in_mem = similarity.ivf_ann_topk(
        emb, queries, k=5, n_cells=8, nprobe=3, seed=42
    )
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in pruned.collect()
    ) == sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in in_mem.collect()
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:1500]


def test_ivf_partitioned_layout_on_disk(spark, emb, tmp_path):
    """partitionBy(cell) produces one directory per cell and the
    centroid sidecar is ignored by table discovery."""
    import os

    path = str(tmp_path / "emb_ivf2")
    similarity.ivf_write_partitioned(emb, path, n_cells=4, seed=1)
    cells = sorted(d for d in os.listdir(path) if d.startswith("cell="))
    assert len(cells) >= 2  # k-means found multiple populated cells
    assert os.path.isdir(f"{path}/_centroids")
    back = spark.read.parquet(path)
    assert back.count() == emb.count()
    assert "cell" in back.columns


# ---------------------------------------------------------------------------
# int8 scalar quantization tier
# ---------------------------------------------------------------------------


def test_sq_roundtrip_error_bound(spark):
    """Reconstruction error per dimension is at most half a
    quantization step, (hi-lo)/510."""
    rows = [(i, [float(i) / 7.0, -3.0 + 0.37 * i, 5.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    los, his = similarity.sq_params(df)
    assert los[2] == his[2] == 5.0  # constant dimension
    out = (
        similarity.sq_quantize(df, los, his)
        .select(
            "vec_id",
            "embedding",
            similarity.sq_dequantize_expr(los, his).alias("recon"),
        )
        .collect()
    )
    for r in out:
        for d, (x, xh) in enumerate(zip(r["embedding"], r["recon"])):
            step = (his[d] - los[d]) / similarity.SQ_LEVELS if his[d] > los[d] else 0.0
            assert abs(x - xh) <= step / 2 + 1e-9, (r["vec_id"], d)


def test_sq_codes_in_range(emb):
    los, his = similarity.sq_params(emb)
    q = similarity.sq_quantize(emb, los, his)
    bad = q.filter(
        F.exists("codes", lambda c: (c < 0) | (c > similarity.SQ_LEVELS))
    ).count()
    assert bad == 0


def test_sq_ann_recall_vs_exact(emb, queries):
    """8-bit reconstruction with 4x oversampling recovers the exact
    top-k on the fixture corpus."""
    k = 5
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(emb, queries, k=k).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.sq_ann_topk(emb, queries, k=k, oversample=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, recall


def test_sq_ann_schema_and_ranks(emb, queries):
    out = similarity.sq_ann_topk(emb, queries, k=3).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3], (q, ranks)


# ---------------------------------------------------------------------------
# product quantization tier
# ---------------------------------------------------------------------------


def test_pq_codes_shape_and_range(emb):
    books = similarity.pq_train(emb, m=8, k=16, sample=256)
    assert len(books) == 8 and all(len(b) <= 16 for b in books)
    rows = similarity.pq_encode(emb, books).select("pq_codes").collect()
    for r in rows:
        assert len(r["pq_codes"]) == 8
        assert all(0 <= c < 16 for c in r["pq_codes"])


def test_pq_encode_deterministic(emb):
    books = similarity.pq_train(emb, m=4, k=8, sample=256)
    a = similarity.pq_encode(emb, books).orderBy("vec_id").collect()
    b = similarity.pq_encode(emb, books).orderBy("vec_id").collect()
    assert [r["pq_codes"] for r in a] == [r["pq_codes"] for r in b]


def test_pq_ann_recall_on_clustered_data(spark):
    """Same planted-cluster corpus as the SRP/IVF recall tests: PQ-ADC
    with exact re-rank recovers nearly all true neighbors."""
    rng = np.random.default_rng(11)
    dim, n_clusters, per_cluster = 32, 20, 25
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.06 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id").isin([0, 25, 50, 75])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(corpus, queries, k=5).collect()
    approx = similarity.pq_ann_topk(
        corpus, queries, k=5, m=8, n_codes=16, oversample=6
    ).collect()
    true_sets: dict[int, set[int]] = {}
    for r in exact:
        true_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict[int, set[int]] = {}
    for r in approx:
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_pq_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=7)


# ---------------------------------------------------------------------------
# IVF-PQ layout
# ---------------------------------------------------------------------------


def _clustered_corpus(spark, seed=13):
    rng = np.random.default_rng(seed)
    dim, n_clusters, per_cluster = 32, 16, 30
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.06 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_pq_recall_on_clustered_data(spark, tmp_path):
    corpus = _clustered_corpus(spark)
    path = str(tmp_path / "ivfpq")
    similarity.ivf_pq_write(corpus, path, n_cells=16, m=8, n_codes=16)
    queries = corpus.filter(F.col("vec_id").isin([0, 30, 60, 90])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(corpus, queries, k=5).collect()
    approx = similarity.ivf_pq_topk(
        spark, path, queries, k=5, nprobe=4, oversample=6
    ).collect()
    true_sets: dict[int, set[int]] = {}
    for r in exact:
        true_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_sets: dict[int, set[int]] = {}
    for r in approx:
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(true_sets[q] & got_sets.get(q, set())) for q in true_sets)
    total = sum(len(s) for s in true_sets.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_pq_candidate_scan_prunes_partitions_and_columns(spark, tmp_path):
    """The two 100 TB properties of the layout, pinned in the plan:
    the candidate scan carries a partition filter (only nprobe cells'
    files open) and reads ONLY the code column (the float embedding
    never leaves disk until re-rank)."""
    corpus = _clustered_corpus(spark)
    path = str(tmp_path / "ivfpq2")
    similarity.ivf_pq_write(corpus, path, n_cells=16, m=8, n_codes=16)
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = similarity.ivf_pq_topk(spark, path, queries, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln for ln in plan.splitlines() if "FileScan parquet" in ln
    ]
    cand = [
        ln
        for ln in scans
        if "pq_codes" in ln.split("ReadSchema")[-1]
        and "embedding" not in ln.split("ReadSchema")[-1]
    ]
    assert cand, scans
    assert any("PartitionFilters: [cell" in ln or "cell#" in ln.split("PartitionFilters")[-1].split("]")[0] for ln in cand), cand


def test_ivf_pq_sidecars_roundtrip(spark, tmp_path):
    corpus = _clustered_corpus(spark)
    path = str(tmp_path / "ivfpq3")
    centroids, books = similarity.ivf_pq_write(
        corpus, path, n_cells=8, m=4, n_codes=8
    )
    crows = spark.read.json(f"{path}/_centroids").collect()
    assert len(crows) == len(centroids)
    brows = spark.read.json(f"{path}/_pq_books").collect()
    assert len(brows) == 4
