"""Vectorized, bit-exact replacements for the interpreted vector
expressions (dot folds, SRP buckets, IVF cell assignment).

Catalyst interprets higher-order-function lambdas (no codegen), so the
``aggregate(zip_with(...))`` dot product costs ~µs per element; at
corpus scale the fold IS the query.  Every kernel here reproduces the
exact expression semantics (guide §4.2 — hand whole batches to
vectorized native code, but keep the arithmetic identical):

- Folds loop over the DIMENSION axis (``acc = acc + A[:, j] * B[:, j]``)
  vectorizing over the ROW axis, so each per-row sum is the same strict
  left-to-right IEEE-double fold the SQL ``aggregate`` lambda (and
  DuckDB's ``list_reduce`` in the oracles) computes — proven
  bit-identical in tests.
- NULL arrays and ragged pairs produce true SQL NULLs (``zip_with``
  NULL-padding makes the expression fold NULL); NaN values stay NaN.
- Spark orders NaN above every double (``NaN >= 0`` is TRUE), so the
  SRP bit test is ``(dot >= 0) | isnan(dot)``.

NULL-element handling (ADVICE r13): Arrow delivers a NULL *element
inside* a float array as NaN, indistinguishable from a genuine NaN
value post-conversion — so every kernel pre-nulls such rows JVM-side
(``exists(v, x -> x IS NULL)``) before the Python boundary.  A vector
containing a NULL element therefore takes the NULL-row arm, which is
exactly what the expression path computes for it in pair_dot (NULL
fold → NULL), SRP (NULL fold → no bit set → bucket 0) and argmax
(all-NULL dots → NULL position).  For PQ codes the raw expression
path instead emits an artifact — ``greatest`` skips the NULL norm, so
unaffected subspaces get codes computed on a 1e-12-normalized vector
— which this guard normalizes to the corrupt-vector arm (array of m
NULLs) everywhere the kernel runs; the fixtures contain no NULL
elements, so no declared result changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _guarded(vec_col: str | Column) -> Column:
    """NULL out any array containing a NULL element (cheap codegen'd
    check relative to the folds the kernels replace) so the Python
    side never confuses a NULL element with NaN."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.when(F.exists(c, lambda x: x.isNull()), F.lit(None)).otherwise(c)


def _lens(s: pd.Series) -> np.ndarray:
    return np.array([-1 if x is None else len(x) for x in s], dtype=np.int64)


def _fold_dot(va: pd.Series, vb: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(values, nullmask) of the strict left-fold dot per row."""
    n = len(va)
    arr = np.full(n, np.nan, dtype=np.float64)
    la, lb = _lens(va), _lens(vb)
    nullmask = (la < 0) | (lb < 0) | (la != lb)
    valid = ~nullmask
    for d in np.unique(la[valid]):
        idx = np.nonzero(valid & (la == d))[0]
        A = np.stack([np.asarray(va.iloc[i], dtype=np.float64) for i in idx])
        B = np.stack([np.asarray(vb.iloc[i], dtype=np.float64) for i in idx])
        acc = np.zeros(len(idx), dtype=np.float64)
        for j in range(int(d)):  # dimension-axis loop: exact fold order
            acc = acc + A[:, j] * B[:, j]
        arr[idx] = acc
    return arr, nullmask


_PAIR_DOT = None


def _pair_dot():
    """Lazily built so importing the module needs no live session
    (``asNondeterministic`` resolves the return type eagerly)."""
    global _PAIR_DOT
    if _PAIR_DOT is None:

        @F.pandas_udf("double")
        def _pair_dot_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
            arr, nullmask = _fold_dot(va, vb)
            return pd.Series(pd.arrays.FloatingArray(arr, nullmask))

        # nondeterministic mark: the dot feeds filter predicates one
        # projection up; without it the pushed-down filter re-evaluates
        # the UDF below the projection and every row pays the Python
        # boundary twice (guide §4.4)
        _PAIR_DOT = _pair_dot_udf.asNondeterministic()
    return _PAIR_DOT


def pair_dot(a: str | Column, b: str | Column) -> Column:
    """Strict left-to-right double fold of ``sum(a[i] * b[i])`` —
    bit-identical to
    ``aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),
    (x, y) -> x * y), 0D, (acc, x) -> acc + x)``."""
    return _pair_dot()(_guarded(a), _guarded(b))


def self_dot(v: str | Column) -> Column:
    """``aggregate(v, 0D, (acc, x) -> acc + x * x)`` — the norm² fold;
    multiply-then-accumulate per element in order, same as pair_dot of
    a column with itself."""
    g = _guarded(v)
    return _pair_dot()(g, g)


def srp_bucket_array(vec_col: str | Column, planes_tables: list[list[list[float]]]) -> Column:
    """array<int> of per-table SRP bucket ids, exactly matching the
    expression form (per plane: strict-fold dot; bit i set when
    ``dot >= 0`` under Spark NaN ordering, i.e. also for NaN; a NULL /
    ragged / NULL-fold row contributes 0 for every bit — the
    ``when(...).otherwise(0)`` arm)."""
    P = [np.asarray(t, dtype=np.float64) for t in planes_tables]  # (bits, dim) each
    dim = P[0].shape[1] if P else 0
    n_tables = len(P)

    @F.pandas_udf("array<int>")
    def _buckets(v: pd.Series) -> pd.Series:
        n = len(v)
        lv = _lens(v)
        valid = lv == dim
        out = np.zeros((n, n_tables), dtype=np.int32)
        idx = np.nonzero(valid)[0]
        if len(idx):
            V = np.stack([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
            for t, planes in enumerate(P):
                bucket = np.zeros(len(idx), dtype=np.int32)
                for i, p in enumerate(planes):
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for j in range(dim):  # exact fold order
                        acc = acc + V[:, j] * p[j]
                    bit = (acc >= 0) | np.isnan(acc)  # Spark: NaN >= 0 TRUE
                    bucket = bucket + (bit.astype(np.int32) << i)
                out[idx, t] = bucket
        return pd.Series([row for row in out])

    return _buckets(_guarded(vec_col))


def pq_codes(vec_col: str | Column, books: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace argmin-L2 centroid ids over the
    row-normalized vector — the vectorized twin of similarity's
    ``_pq_code_expr`` over its ``__nv`` normalization (m·k interpreted
    folds per vector otherwise).  Exact reproduction: norm² as the
    multiply-accumulate fold, per-element ``x / max(norm, 1e-12)``,
    per-centroid ``(x-y)²`` folds in dimension order, first-position
    argmin (NaN dists sort above every double in Spark's array_min, so
    they are replaced with +inf before argmin); a NULL/ragged vector
    yields the expression's array of m NULLs."""
    B = [np.asarray(b, dtype=np.float64) for b in books]  # (k, d) each
    msub = len(B)
    d = B[0].shape[1] if msub else 0
    dim = msub * d

    @F.pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        n = len(v)
        out: list = [[None] * msub] * n
        lv = _lens(v)
        idx = np.nonzero(lv == dim)[0]
        if len(idx):
            V = np.stack([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
            nacc = np.zeros(len(idx), dtype=np.float64)
            for j in range(dim):  # exact norm² fold
                nacc = nacc + V[:, j] * V[:, j]
            norms = np.maximum(np.sqrt(nacc), 1e-12)
            NV = V / norms[:, None]  # per-element divide, same as transform
            codes = np.empty((len(idx), msub), dtype=np.int32)
            for j, book in enumerate(B):
                k = book.shape[0]
                dists = np.empty((len(idx), k), dtype=np.float64)
                S = NV[:, j * d : (j + 1) * d]
                for c in range(k):
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for t in range(d):  # exact (x-y)² fold order
                        diff = S[:, t] - book[c, t]
                        acc = acc + diff * diff
                    dists[:, c] = acc
                dists = np.where(np.isnan(dists), np.inf, dists)
                codes[:, j] = np.argmin(dists, axis=1).astype(np.int32)
            rows = list(out)
            for pos, i in enumerate(idx):
                rows[i] = codes[pos].tolist()
            out = rows
        return pd.Series(out)

    return _codes(_guarded(vec_col))


def argmax_cell(vec_col: str | Column, centroids: list[list[float]]) -> Column:
    """1-based id of the max-dot centroid — exactly
    ``array_position(array(dots...), array_max(array(dots...)))`` with
    the same strict fold per dot and first-position tie behavior; a
    NULL/ragged vector yields NULL (the expression's NULL max)."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    k, dim = C.shape

    @F.pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        n = len(v)
        res = np.zeros(n, dtype=np.int32)
        lv = _lens(v)
        valid = lv == dim
        nullmask = ~valid
        idx = np.nonzero(valid)[0]
        if len(idx):
            V = np.stack([np.asarray(v.iloc[i], dtype=np.float64) for i in idx])
            dots = np.empty((len(idx), k), dtype=np.float64)
            for c in range(k):
                acc = np.zeros(len(idx), dtype=np.float64)
                for j in range(dim):  # exact fold order
                    acc = acc + V[:, j] * C[c, j]
                dots[:, c] = acc
            # np.argmax returns the first max (and the first NaN when
            # present) — the same element array_position(max) finds
            res[idx] = np.argmax(dots, axis=1).astype(np.int32) + 1
        return pd.Series(pd.arrays.IntegerArray(res, nullmask))

    return _cell(_guarded(vec_col))
