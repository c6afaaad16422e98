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


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    return (time.perf_counter() - t0) / iters


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

            copy = jax.jit(lambda b: b + b)
            dt_copy = timeit(copy, big)
            gat = jax.jit(lambda x, i: x[i])
            dt = timeit(gat, x, idx)
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
        fwd = jax.jit(lambda x: padded_spmm(pair, x))
        dt_f = timeit(fwd, x64)

        def loss(x):
            return jnp.sum(padded_spmm(pair, x) ** 2)

        both = jax.jit(jax.grad(loss))
        dt_b = timeit(both, x64)
        hub_edges = 0 if adj.hub_weights is None else int(
            E - sum(int((w_ > 0).sum()) for w_ in adj.bucket_weights)
        )
        log(
            bench="padded_spmm",
            hub=hub,
            fwd_ms=round(dt_f * 1e3, 2),
            fwd_bwd_ms=round(dt_b * 1e3, 2),
            edges=E,
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
