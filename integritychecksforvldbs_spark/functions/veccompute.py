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

The kernels are ARROW-native UDFs (Spark 4.1 ``arrow_udf``): each
batch arrives as a ``pyarrow.Array`` whose list layout (offsets +
child validity bitmap) is read directly — rows materialize into a
matrix with ONE fancy-index gather instead of a per-row Python loop,
and a NULL *element inside* an array is distinguished from a genuine
NaN by the validity bitmap at zero per-row expression cost (the
pandas form conflated the two — ADVICE r13; an expression-side
``exists()`` guard was measured at +46-77% on the embedding queries
and rejected).  A row containing a NULL element takes the corrupt-
vector arm: pair_dot → NULL, SRP → bucket 0 in every table, argmax →
NULL — each exactly what the expression path computes for it (NULL
fold → NULL / no bit set / NULL position).  PQ codes normalize such
rows to the array of m NULLs, replacing the raw expression path's
artifact (``greatest`` skips the NULL norm, coding unaffected
subspaces on a 1e-12-normalized vector) — divergence on that one
input class is deliberate and documented; the fixtures contain no
NULL elements, so no declared result changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf


def _list_layout(
    v: pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lens, starts, flat, bad) of a list-of-float arrow array:
    ``lens[i]`` = element count (−1 for a NULL row), ``starts[i]`` =
    row i's offset into ``flat`` (float64, NaN at null elements),
    ``bad[i]`` = row i carries a NULL *element* (validity bitmap —
    exact, never conflated with a NaN value)."""
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if pa.types.is_fixed_size_list(v.type):
        v = v.cast(pa.list_(v.type.value_type))
    n = len(v)
    null_row = v.is_null().to_numpy(zero_copy_only=False)
    offsets = v.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    child = v.values
    flat = child.to_numpy(zero_copy_only=False).astype(np.float64)
    starts, ends = offsets[:-1], offsets[1:]
    lens = (ends - starts).astype(np.int64)
    lens[null_row] = -1
    if child.null_count:
        cn = np.concatenate(
            ([0], np.cumsum(child.is_null().to_numpy(zero_copy_only=False)))
        )
        bad = (cn[ends] - cn[starts]) > 0
        bad &= ~null_row
    else:
        bad = np.zeros(n, dtype=bool)
    return lens, starts, flat, bad


def _gather(flat: np.ndarray, starts: np.ndarray, idx: np.ndarray, d: int) -> np.ndarray:
    """(len(idx), d) matrix of rows ``idx`` — one vectorized gather."""
    if d == 0:
        return np.empty((len(idx), 0), dtype=np.float64)
    return flat[starts[idx][:, None] + np.arange(d)[None, :]]


_PAIR_DOT = None


def _pair_dot():
    """Lazily built so importing the module needs no live session
    (``asNondeterministic`` resolves the return type eagerly)."""
    global _PAIR_DOT
    if _PAIR_DOT is None:

        @arrow_udf("double")
        def _pair_dot_udf(va: pa.Array, vb: pa.Array) -> pa.Array:
            la, sa, fa, ba = _list_layout(va)
            lb, sb, fb, bb = _list_layout(vb)
            n = len(la)
            arr = np.full(n, np.nan, dtype=np.float64)
            nullmask = (la < 0) | (lb < 0) | (la != lb) | ba | bb
            valid = ~nullmask
            for d in np.unique(la[valid]):
                idx = np.nonzero(valid & (la == d))[0]
                A = _gather(fa, sa, idx, int(d))
                B = _gather(fb, sb, idx, int(d))
                acc = np.zeros(len(idx), dtype=np.float64)
                for j in range(int(d)):  # dimension-axis: exact fold order
                    acc = acc + A[:, j] * B[:, j]
                arr[idx] = acc
            return pa.array(arr, type=pa.float64(), mask=nullmask)

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
    (x, y) -> x * y), 0D, (acc, x) -> acc + x)`` (including NULL for a
    NULL element, via the validity bitmap)."""
    return _pair_dot()(a, b)


def self_dot(v: str | Column) -> Column:
    """``aggregate(v, 0D, (acc, x) -> acc + x * x)`` — the norm² fold;
    multiply-then-accumulate per element in order, same as pair_dot of
    a column with itself."""
    return _pair_dot()(v, v)


def srp_bucket_array(vec_col: str | Column, planes_tables: list[list[list[float]]]) -> Column:
    """array<int> of per-table SRP bucket ids, exactly matching the
    expression form (per plane: strict-fold dot; bit i set when
    ``dot >= 0`` under Spark NaN ordering, i.e. also for NaN; a NULL /
    ragged / NULL-element row contributes 0 for every bit — the
    ``when(...).otherwise(0)`` arm)."""
    P = [np.asarray(t, dtype=np.float64) for t in planes_tables]  # (bits, dim) each
    dim = P[0].shape[1] if P else 0
    n_tables = len(P)

    @arrow_udf("array<int>")
    def _buckets(v: pa.Array) -> pa.Array:
        lens, starts, flat, bad = _list_layout(v)
        n = len(lens)
        out = np.zeros((n, n_tables), dtype=np.int32)
        idx = np.nonzero((lens == dim) & ~bad)[0]
        if len(idx):
            V = _gather(flat, starts, idx, dim)
            for t, planes in enumerate(P):
                bucket = np.zeros(len(idx), dtype=np.int32)
                for i, p in enumerate(planes):
                    acc = np.zeros(len(idx), dtype=np.float64)
                    for j in range(dim):  # exact fold order
                        acc = acc + V[:, j] * p[j]
                    bit = (acc >= 0) | np.isnan(acc)  # Spark: NaN >= 0 TRUE
                    bucket = bucket + (bit.astype(np.int32) << i)
                out[idx, t] = bucket
        return pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * n_tables, type=pa.int32()),
            pa.array(out.reshape(-1), type=pa.int32()),
        )

    return _buckets(vec_col)


def pq_codes(vec_col: str | Column, books: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace argmin-L2 centroid ids over the
    row-normalized vector — the vectorized twin of similarity's
    ``_pq_code_expr`` over its ``__nv`` normalization (m·k interpreted
    folds per vector otherwise).  Exact reproduction: norm² as the
    multiply-accumulate fold, per-element ``x / max(norm, 1e-12)``,
    per-centroid ``(x-y)²`` folds in dimension order, first-position
    argmin (NaN dists sort above every double in Spark's array_min, so
    they are replaced with +inf before argmin); a NULL / ragged /
    NULL-element vector yields the array of m NULLs."""
    B = [np.asarray(b, dtype=np.float64) for b in books]  # (k, d) each
    msub = len(B)
    d = B[0].shape[1] if msub else 0
    dim = msub * d

    @arrow_udf("array<int>")
    def _codes(v: pa.Array) -> pa.Array:
        lens, starts, flat, bad = _list_layout(v)
        n = len(lens)
        code_vals = np.zeros((n, msub), dtype=np.int32)
        elem_null = np.ones((n, msub), dtype=bool)
        idx = np.nonzero((lens == dim) & ~bad)[0]
        if len(idx):
            V = _gather(flat, starts, idx, dim)
            nacc = np.zeros(len(idx), dtype=np.float64)
            for j in range(dim):  # exact norm² fold
                nacc = nacc + V[:, j] * V[:, j]
            norms = np.maximum(np.sqrt(nacc), 1e-12)
            NV = V / norms[:, None]  # per-element divide, same as transform
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
                code_vals[idx, j] = np.argmin(dists, axis=1).astype(np.int32)
            elem_null[idx] = False
        return pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * msub, type=pa.int32()),
            pa.array(code_vals.reshape(-1), type=pa.int32(),
                     mask=elem_null.reshape(-1)),
        )

    return _codes(vec_col)


def argmax_cell(vec_col: str | Column, centroids: list[list[float]]) -> Column:
    """1-based id of the max-dot centroid — exactly
    ``array_position(array(dots...), array_max(array(dots...)))`` with
    the same strict fold per dot and first-position tie behavior; a
    NULL / ragged / NULL-element vector yields NULL (the expression's
    NULL max)."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    k, dim = C.shape

    @arrow_udf("int")
    def _cell(v: pa.Array) -> pa.Array:
        lens, starts, flat, bad = _list_layout(v)
        n = len(lens)
        res = np.zeros(n, dtype=np.int32)
        valid = (lens == dim) & ~bad
        nullmask = ~valid
        idx = np.nonzero(valid)[0]
        if len(idx):
            V = _gather(flat, starts, idx, dim)
            dots = np.empty((len(idx), k), dtype=np.float64)
            for c in range(k):
                acc = np.zeros(len(idx), dtype=np.float64)
                for j in range(dim):  # exact fold order
                    acc = acc + V[:, j] * C[c, j]
                dots[:, c] = acc
            # np.argmax returns the first max (and the first NaN when
            # present) — the same element array_position(max) finds
            res[idx] = np.argmax(dots, axis=1).astype(np.int32) + 1
        return pa.array(res, type=pa.int32(), mask=nullmask)

    return _cell(vec_col)
