"""Vectorized fixed-depth binary search over row-sorted CSR rows.

This is the TPU-native replacement for every ragged membership test in the
reference:

- negative-sample rejection ``while negitem in posForUser``
  (`/root/reference/negative_sample.py:121-126`),
- eval hit-labels ``x in groundTrue`` (`/root/reference/metric.py:50-58`),
- train-positive masking before top-K (`/root/reference/trainer.py:137`).

A membership query against user u's sorted positives costs O(log nnz) with a
**static** iteration count, so the whole thing jits into straight-line vector code
with no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.graph import CSR

__all__ = ["lower_bound", "csr_contains", "csr_gather_padded", "csr_row_ids"]

_SEARCH_ITERS = 32  # default: supports nnz < 2^32


def lower_bound(
    indices: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    vals: jnp.ndarray,
    iters: int = _SEARCH_ITERS,
) -> jnp.ndarray:
    """First position p in [lo, hi) with indices[p] >= vals (elementwise batched).

    All of lo/hi/vals share one broadcastable shape. ``iters`` must be
    >= ceil(log2(max(hi - lo) + 1)); every iteration is a random 4-byte gather,
    so callers that know the max row length should pass a tight bound — this is
    the sampler's hot loop (PERF: dropped epoch sampling 3.4s -> ~0.4s at 1.5M
    draws by using log2(max_degree) instead of 32).

    The search runs over RAVELED index arrays: a [N, K]-shaped scalar gather
    lowers ~6x worse per element than the same gather flattened to [N*K]
    (measured 510 -> ~90 ms on the 1.5M x 4 sampler membership test,
    benchmarks/sampler_bench.py; PERF.md "sampler probes").
    """
    nnz = indices.shape[0]
    lo_b, hi_b, vals_b = jnp.broadcast_arrays(lo, hi, vals)
    shape = lo_b.shape
    lo_b, hi_b, vals_f = lo_b.ravel(), hi_b.ravel(), vals_b.ravel()

    def body(_, carry):
        lo_c, hi_c = carry
        active = lo_c < hi_c
        mid = (lo_c + hi_c) // 2
        v = indices[jnp.clip(mid, 0, max(nnz - 1, 0))]
        go_right = v < vals_f
        lo_n = jnp.where(active & go_right, mid + 1, lo_c)
        hi_n = jnp.where(active & ~go_right, mid, hi_c)
        return lo_n, hi_n

    lo_f, _ = jax.lax.fori_loop(0, max(iters, 1), body, (lo_b, hi_b))
    return lo_f.reshape(shape)


def csr_contains(
    csr: CSR, rows: jnp.ndarray, vals: jnp.ndarray, max_row_len: int | None = None
) -> jnp.ndarray:
    """Elementwise: is ``vals`` a member of row ``rows``? rows/vals broadcast.

    Returns a bool array of the broadcast shape. Pass max_row_len (static) to
    bound the binary-search depth at log2 of the longest row.
    """
    iters = _SEARCH_ITERS if max_row_len is None else max(int(max_row_len).bit_length(), 1)
    rows = jnp.asarray(rows)
    vals = jnp.asarray(vals)
    rows_b, vals_b = jnp.broadcast_arrays(rows, vals)
    shape = rows_b.shape
    rows_f, vals_f = rows_b.ravel(), vals_b.ravel()  # flat gathers: see lower_bound
    lo = csr.indptr[rows_f]
    hi = csr.indptr[rows_f + 1]
    pos = lower_bound(csr.indices, lo, hi, vals_f, iters=iters)
    nnz = csr.indices.shape[0]
    in_row = pos < hi
    found = csr.indices[jnp.clip(pos, 0, max(nnz - 1, 0))] == vals_f
    return (in_row & found).reshape(shape)


def csr_row_ids(csr: CSR) -> jnp.ndarray:
    """[nnz] row index of each CSR entry (ascending — usable as sorted segment
    ids). Computed on device via searchsorted so it fuses into jitted programs."""
    nnz = csr.indices.shape[0]
    positions = jnp.arange(nnz, dtype=csr.indptr.dtype)
    return (jnp.searchsorted(csr.indptr, positions, side="right") - 1).astype(jnp.int32)


def csr_gather_padded(csr: CSR, rows: jnp.ndarray, pad_to: int, fill: int = -1):
    """Gather each row's indices into a [*, pad_to] dense block with a validity
    mask. Rows longer than pad_to are truncated (callers choose pad_to >= the max
    degree they care about).

    Returns (vals [.., pad_to] int32, mask [.., pad_to] bool).
    """
    rows = jnp.asarray(rows)
    nnz = csr.indices.shape[0]
    start = csr.indptr[rows]
    deg = csr.indptr[rows + 1] - start
    offs = jnp.arange(pad_to, dtype=jnp.int32)
    idx = start[..., None] + offs
    mask = offs < deg[..., None]
    # flat gather: multi-dim-shaped scalar gathers lower ~6x worse (lower_bound)
    vals = csr.indices[jnp.clip(idx, 0, max(nnz - 1, 0)).ravel()].reshape(idx.shape)
    vals = jnp.where(mask, vals, fill)
    return vals, mask
