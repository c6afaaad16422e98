"""Pallas streaming top-k vs XLA matmul+top_k crossover table (round-1 verdict
weak #3: measure where the kernel actually wins; ship or delete accordingly).

Run from the repo root on the tunneled chip: python benchmarks/topk_bench.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.spmm_bench import log, rpc_baseline, timeit  # noqa: E402
from furusato_recommend_tpu.ops.pallas_topk import streaming_topk  # noqa: E402


def xla_topk(u, items, k):
    s = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


def main():
    log(bench="rpc_baseline_ms", v=round(rpc_baseline() * 1e3, 2))
    rng = np.random.default_rng(0)
    d, k = 64, 32
    for B in (256, 1024):
        for M in (200_000, 1_000_000):
            items = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
            u0 = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

            f_x = jax.jit(lambda u, i: xla_topk(u + jnp.float32(i), items, k))
            dt_x = timeit(f_x, lambda i: (u0, i), iters=8)

            f_p = jax.jit(lambda u, i: streaming_topk(u + jnp.float32(i), items, k))
            dt_p = timeit(f_p, lambda i: (u0, i), iters=8)

            # correctness spot-check on this shape
            vx, ix = jax.jit(lambda u: xla_topk(u, items, k))(u0)
            vp, ip = jax.jit(lambda u: streaming_topk(u, items, k))(u0)
            ok = bool(jnp.allclose(jnp.sort(vx, axis=1), jnp.sort(vp, axis=1), rtol=1e-5))
            log(
                bench="topk",
                B=B,
                M=M,
                xla_ms=round(dt_x * 1e3, 2),
                pallas_ms=round(dt_p * 1e3, 2),
                speedup=round(dt_x / dt_p, 2),
                values_match=ok,
            )


if __name__ == "__main__":
    main()
