"""SRP-LSH embedding near-dup: exact equality with the quadratic tier
on a corpus with genuine near-dups, real candidate pruning, and the
scale-invariance that makes the gate's scaled-twin recall exact."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import dedup


@pytest.fixture(scope="module")
def twin_corpus(spark):
    """40 random unit-ish vectors + 8 noisy twins (cosine ~0.99)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    twins = base[:8] + 0.05 * rng.standard_normal((8, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(twins)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _pair_set(df):
    return {(r["vec_id_a"], r["vec_id_b"], r["cosine"]) for r in df.collect()}


def test_lsh_equals_bruteforce_on_twins(twin_corpus):
    exact = _pair_set(dedup.cosine_dup_pairs(twin_corpus, threshold=0.9))
    approx = _pair_set(dedup.cosine_dup_pairs_lsh(twin_corpus, threshold=0.9))
    assert len(exact) >= 8  # every twin found by the oracle tier
    assert approx == exact  # recall 1 at shipped params, precision exact


def test_lsh_actually_prunes(twin_corpus):
    """The candidate set must be well under all-pairs, or the LSH tier
    is just brute force with extra steps."""
    n = twin_corpus.count()
    nd = dedup.with_norm(twin_corpus).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v"), "norm"
    )
    cands = dedup._lsh_candidate_pairs(nd, dim=16, n_bits=8, n_tables=8, seed=42)
    assert cands.count() < (n * (n - 1) // 2) * 0.5


def test_scaled_twin_is_always_recalled(twin_corpus):
    """SRP buckets are scale-invariant (sign(<cv, p>) == sign(<v, p>)
    for c > 0), so a positively-scaled copy lands in the same bucket
    in EVERY table — recall 1 by construction, which is what the gate
    relies on for its injected twins."""
    aug = twin_corpus.unionByName(
        twin_corpus.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 5000).alias("vec_id"),
            F.expr(
                "transform(embedding, x -> CAST(x AS DOUBLE) * 1.01D)"
            ).alias("embedding"),
        )
    )
    pairs = _pair_set(dedup.cosine_dup_pairs_lsh(aug, threshold=0.999))
    assert (0, 5000, 1.0) in pairs
