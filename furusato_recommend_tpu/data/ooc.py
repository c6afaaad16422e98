"""Out-of-core numeric features (the ``dask`` variant, TPU-native).

The reference's dask TextSAGE holds the numeric counter matrices as lazy dask
arrays loaded from disk (`/root/reference/model/textsage_dask.py:117-119`) and
(in its commented-out forward) gathers `.compute().todense()` rows per batch
(`/root/reference/model/textsage_dask.py:300-334`). On TPU, per-batch host
round-trips inside a compiled epoch are a non-starter; the idiomatic shape is:

* the raw [N, Fn] matrix never touches HBM — it lives on disk as an ``np.load
  (mmap_mode="r")`` memmap;
* what the model needs on device is only its d-dim projection ``X @ W + b``
  ([N, d], tiny next to [N, Fn]), recomputed ONCE per epoch by streaming X
  through in chunks with the host->device transfer double-buffered
  (train/prefetch.py) while the previous chunk's matmul runs;
* the projection enters the compiled epoch as an argument, so inside the epoch
  it behaves exactly like the cached initial-embedding tables (train_emb=False
  linearization); its per-step cotangents are accumulated on device and the
  numeric linear's gradient ``X^T @ G`` is computed by a second streamed pass
  after the epoch (epoch-delayed update — same staleness class as the
  reference's per-epoch ``get_initial_embedding`` recipe,
  `/root/reference/model/graphsage.py:368-394`).

Deviation (flagged): the reference's dask forward never actually uses the
numeric features — the block is commented out (`textsage_dask.py:300-305`), so
its `dask` model trains with numerics silently dropped. Here the streamed
projection IS used and trained (epoch-delayed); strictly more capability.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MemmapNumeric", "stream_project", "stream_project_grad"]


class MemmapNumeric:
    """Handle on an on-disk [N, Fn] float32 matrix, opened as a read-only
    memmap. Host-side object — never part of a jit pytree."""

    def __init__(self, path: str):
        self.path = str(path)
        self._mm = np.load(self.path, mmap_mode="r")
        if self._mm.ndim != 2:
            raise ValueError(f"{path}: expected a 2-D numeric matrix, got {self._mm.shape}")

    @staticmethod
    def write(path: str, array: np.ndarray) -> "MemmapNumeric":
        arr = np.ascontiguousarray(np.asarray(array, dtype=np.float32))
        np.save(path, arr)
        p = str(path)
        return MemmapNumeric(p if p.endswith(".npy") else p + ".npy")

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self._mm.shape)

    def chunk(self, lo: int, hi: int) -> np.ndarray:
        """Materialize rows [lo, hi) as float32 (the only disk read)."""
        return np.asarray(self._mm[lo:hi], dtype=np.float32)

    def iter_chunks(self, chunk: int) -> Iterator[np.ndarray]:
        n = self.shape[0]
        for lo in range(0, n, chunk):
            yield self.chunk(lo, min(lo + chunk, n))


def _pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


@jax.jit
def _proj_chunk(x, w, b):
    return x @ w + b


def stream_project(mm: MemmapNumeric, w, b, chunk: int = 65536) -> jnp.ndarray:
    """[N, d] = X @ w + b computed in row chunks; transfer of chunk i+1 overlaps
    the matmul of chunk i (prefetch thread). All chunks are padded to the same
    shape so exactly one executable serves the whole stream."""
    from ..train.prefetch import prefetch_to_device

    n = mm.shape[0]
    chunk = min(chunk, n)
    outs = []
    for xc in prefetch_to_device(
        (_pad_rows(c, chunk) for c in mm.iter_chunks(chunk)), size=2
    ):
        outs.append(_proj_chunk(xc, w, b))
    y = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return y[:n]


@jax.jit
def _grad_chunk(x, g):
    return x.T @ g, jnp.sum(g, axis=0)


def stream_project_grad(mm: MemmapNumeric, g, chunk: int = 65536):
    """(grad_w, grad_b) of ``sum(cotangent * (X @ w + b))`` = (X^T @ G, sum G),
    streamed over the same chunking. ``g`` is the epoch-accumulated [N, d]
    cotangent (device array)."""
    from ..train.prefetch import prefetch_to_device

    n, fn = mm.shape
    chunk = min(chunk, n)
    d = g.shape[1]
    gw = jnp.zeros((fn, d), jnp.float32)
    gb = jnp.zeros((d,), jnp.float32)
    n_chunks = math.ceil(n / chunk)
    g_pad = jnp.concatenate(
        [g, jnp.zeros((n_chunks * chunk - n, d), g.dtype)], axis=0
    ) if n_chunks * chunk != n else g

    for i, xc in enumerate(
        prefetch_to_device((_pad_rows(c, chunk) for c in mm.iter_chunks(chunk)), size=2)
    ):
        dw, db = _grad_chunk(xc, jax.lax.dynamic_slice_in_dim(g_pad, i * chunk, chunk))
        gw = gw + dw
        gb = gb + db
    return gw, gb
