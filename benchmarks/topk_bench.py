"""Pallas streaming top-k vs XLA matmul+top_k crossover table (round-1 verdict
weak #3: measure where the kernel actually wins; ship or delete accordingly).

Timing: in-program repetition — a fori_loop chains R dependent invocations
(the next query batch is nudged by the previous top value, forcing sequential
execution) and two repetition counts are differenced, which cancels dispatch
and tunnel-RPC noise exactly (same recipe as spmm_bench).

Run from the repo root on the tunneled chip: python benchmarks/topk_bench.py
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.spmm_bench import log, timeit  # noqa: E402
from furusato_recommend_tpu.ops.pallas_topk import streaming_topk  # noqa: E402


def xla_topk(u, items, k):
    s = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)


def chain_prog(fn, k, R):
    """R dependent fn invocations inside one program; items flows as an
    argument (a closed-over item table would be baked into the executable —
    256 MB at M=1M overflows the tunnel's remote-compile payload)."""

    def run(u, items, i):
        def body(_, u):
            v, _ids = fn(u, items, k)
            return u + v[:, :1] * 1e-9  # forces sequential dependency

        return lax.fori_loop(0, R, body, u + jnp.float32(i))

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    d, k = 64, 32
    for B, M in ((256, 200_000), (1024, 200_000), (256, 1_000_000)):
        items = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
        u0 = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

        def per_op(fn):
            # R=1 vs R=21: a 20-op signal rides above tunnel RPC jitter
            f1 = chain_prog(fn, k, 1)
            f2 = chain_prog(fn, k, 21)
            t1 = timeit(f1, lambda i: (u0, items, i), iters=3)
            t2 = timeit(f2, lambda i: (u0, items, i), iters=3)
            return (t2 - t1) / 20

        dt_x = per_op(xla_topk)
        dt_p = per_op(lambda u, it, kk: streaming_topk(u, it, kk))

        # correctness spot-check on this shape
        vx, _ = jax.jit(lambda u, it: xla_topk(u, it, k))(u0, items)
        vp, _ = jax.jit(lambda u, it: streaming_topk(u, it, k))(u0, items)
        ok = bool(jnp.allclose(jnp.sort(vx, axis=1), jnp.sort(vp, axis=1), rtol=1e-5))
        log(
            bench="topk",
            B=B,
            M=M,
            xla_ms=round(dt_x * 1e3, 2),
            pallas_ms=round(dt_p * 1e3, 2),
            speedup=round(dt_x / max(dt_p, 1e-9), 2),
            values_match=ok,
        )


if __name__ == "__main__":
    main()
