"""SpMM perf investigation on the real TPU chip (round-2, VERDICT weak #2).

Measures, on the PERF.md graph shape (50k users / 20k items / ~1.45M
interactions -> 2.9M directed joint-space edges, d=64):

1. raw gather throughput x[idx] as a function of row width and dtype —
   distinguishes issue-rate-bound from bandwidth-bound gathers,
2. padded_spmm fwd / fwd+bwd across hub_count settings,
3. (as added) candidate kernel variants.

Dev script: prints one JSON dict per measurement line; NOT the driver bench.
Run from the repo root on the tunneled chip:  python benchmarks/spmm_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    build_padded_adj,
    PaddedAdjPair,
    padded_spmm,
)


# ---------------------------------------------------------------------------
# Timing over the axon tunnel. CRITICAL: block_until_ready() does NOT wait on
# the tunneled chip, and each host fetch costs a ~25 ms RPC round-trip.
# Correct recipe: enqueue `iters` executions with VARYING inputs (identical
# (executable, args) pairs can be served from cache), then force one tiny
# fetch (executes after the whole queue drains) and subtract the RPC baseline.
# ---------------------------------------------------------------------------

_RPC_BASELINE = None


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def rpc_baseline():
    global _RPC_BASELINE
    if _RPC_BASELINE is None:
        x = jnp.zeros((8,))
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(x + 1.0)
        _RPC_BASELINE = (time.perf_counter() - t0) / 5
    return _RPC_BASELINE


def timeit(fn, make_arg, iters=20):
    """fn(*make_arg(i)) timed as (queue-drain wall time - RPC baseline)/iters.
    make_arg must vary at least one input with i."""
    base = rpc_baseline()
    out = fn(*make_arg(0))
    _sync(out)  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_arg(1 + i))
    _sync(out)
    dt = time.perf_counter() - t0
    return max(dt - base, 1e-9) / iters


def log(**kw):
    print(json.dumps(kw), flush=True)


def gather_bench(n_rows, n_idx, rng):
    """Materialized gather y = x[idx] (write cost included — XLA collapses any
    linear reduction of a gather into a histogram contraction, so reductions
    measure nothing). A same-shape streaming copy isolates the write side."""
    idx = jnp.asarray(rng.integers(0, n_rows, n_idx).astype(np.int32))
    for d in (64, 128):
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32"), (jnp.int8, "int8")):
            x = jnp.asarray(rng.standard_normal((n_rows, d)), dtype=jnp.float32).astype(dtype)
            big = jnp.zeros((n_idx, d), dtype)

            if jnp.issubdtype(dtype, jnp.floating):
                copy = jax.jit(lambda b, i: b + jnp.asarray(i, dtype))
                gat = jax.jit(lambda x, i, j: x[i] + jnp.asarray(j, dtype))
            else:
                copy = jax.jit(lambda b, i: b + jnp.asarray(i, jnp.int8))
                gat = jax.jit(lambda x, i, j: x[i] + jnp.asarray(j, jnp.int8))
            dt_copy = timeit(lambda b, i: copy(b, i), lambda i: (big, i), iters=10)
            dt = timeit(lambda x, i, j: gat(x, i, j), lambda j: (x, idx, j), iters=10)
            bytes_row = n_idx * d * x.dtype.itemsize
            log(
                bench="gather",
                d=d,
                dtype=name,
                gather_ms=round(dt * 1e3, 3),
                copy_ms=round(dt_copy * 1e3, 3),
                ns_per_row=round(dt / n_idx * 1e9, 3),
                eff_gbps_rw=round(2 * bytes_row / dt / 1e9, 2),
            )


def spmm_bench(ds):
    g = ds.graph
    src = np.asarray(g.norm_edges.src)
    dst = np.asarray(g.norm_edges.dst)
    w = np.asarray(g.norm_edges.weight)
    nn = g.num_nodes
    E = len(src)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((nn, 64)).astype(np.float32))

    for hub in (0, 1024, 4096, 8192):
        adj = build_padded_adj(src, dst, w, nn, hub_count=hub)
        pair = PaddedAdjPair(fwd=adj, bwd=adj)
        fwd = jax.jit(lambda x, i: padded_spmm(pair, x + jnp.float32(i)))
        dt_f = timeit(fwd, lambda i: (x64, i), iters=10)

        def loss(x):
            return jnp.sum(padded_spmm(pair, x) ** 2)

        both = jax.jit(lambda x, i: jax.grad(loss)(x + jnp.float32(i)))
        dt_b = timeit(both, lambda i: (x64, i), iters=10)
        tail_edges = sum(int((np.asarray(w_) > 0).sum()) for w_ in adj.bucket_weights)
        log(
            bench="padded_spmm",
            hub=hub,
            fwd_ms=round(dt_f * 1e3, 2),
            fwd_bwd_ms=round(dt_b * 1e3, 2),
            edges=E,
            tail_edges=tail_edges,
            hub_rows=0 if adj.hub_ids is None else int(adj.hub_ids.shape[0]),
        )


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    log(bench="start", backend=jax.default_backend())

    # 1. raw gather wall
    gather_bench(70_000, 2_900_000, rng)

    # 2. padded SpMM across hub settings
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=29, seed=0)
    log(bench="dataset", edges=int(2 * ds.train_size))
    spmm_bench(ds)


if __name__ == "__main__":
    main()
