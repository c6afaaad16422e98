"""Cap-ladder growth probe on the PRODUCTION SpMM config (src-hub=1024 +
dst-hub, the adopted design) — the last ~0.5 ms/step lever PERF.md lists.

A finer ladder (growth < 1.26) trades more buckets (more concatenate segments,
more program) for fewer padded slots on the issue-rate-bound tail. Measures
fwd and fwd+bwd per apply by chained in-program repetition (dispatch/RPC noise
cancels in the (t(12)-t(2))/10 difference; see spmm_bench.py header for why
wall timings over the axon tunnel lie).

Run from the repo root on the tunneled chip:
  python benchmarks/capladder_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from benchmarks.spmm_bench import log, timeit  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    PaddedAdjPair,
    build_padded_adj,
    padded_spmm,
)


def main():
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=29, seed=0)
    u, it = ds.train_user, ds.train_item
    nn = ds.n_users + ds.m_items
    src = np.concatenate([u, it + ds.n_users])
    dst = np.concatenate([it + ds.n_users, u])
    w = np.ones_like(src, dtype=np.float32)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((nn, 64)).astype(np.float32))

    def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
        f1, f2 = make_prog(r1), make_prog(r2)
        t1 = timeit(f1, make_arg, iters=iters)
        t2 = timeit(f2, make_arg, iters=iters)
        return (t2 - t1) / (r2 - r1)

    for growth in (1.26, 1.15, 1.08, 1.04):
        adj = build_padded_adj(
            src, dst, w, nn, hub_count=1024, dst_hub_count=1024, num_src=nn,
            hub_mem_budget=4 * 1024**3, cap_growth=growth,
        )
        pair = PaddedAdjPair(fwd=adj, bwd=adj)

        def fwd_prog(R):
            return jax.jit(
                lambda p, x, i: lax.fori_loop(
                    0, R, lambda _, y: padded_spmm(p, y), x + jnp.float32(i)
                )
            )

        def grad_prog(R):
            def run(p, x, i):
                g = jax.grad(lambda z: jnp.sum(padded_spmm(p, z) ** 2))
                return lax.fori_loop(0, R, lambda _, y: g(y), x + jnp.float32(i))

            return jax.jit(run)

        ma = lambda i: (pair, x64, i)
        dt_f = per_op(fwd_prog, ma)
        dt_b = per_op(grad_prog, ma)
        log(
            bench="capladder",
            cap_growth=growth,
            n_buckets=len(adj.bucket_nbrs),
            tail_edges=sum(int((np.asarray(wb) > 0).sum()) for wb in adj.bucket_weights),
            pad_slots=sum(int(np.prod(n.shape)) for n in adj.bucket_nbrs),
            fwd_ms=round(dt_f * 1e3, 2),
            fwd_bwd_ms=round(dt_b * 1e3, 2),
        )


if __name__ == "__main__":
    main()
