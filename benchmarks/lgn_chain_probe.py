"""Why does LGN propagate (2 applies + concat/mean/slice) cost 4.5 ms when one
_apply is 1.0 ms? Ladder: L=0/1/2-layer propagate variants and a bare 2-apply
chain, all carry-chained under scan with per_op differencing.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import _apply, padded_spmm  # noqa: E402

_RPC_BASELINE = None


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])


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


def timeit(fn, make_arg, iters=3):
    base = rpc_baseline()
    out = fn(*make_arg(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_arg(1 + i))
    _sync(out)
    return max(time.perf_counter() - t0 - base, 1e-9) / iters


def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
    f1, f2 = make_prog(r1), make_prog(r2)
    t1 = timeit(f1, make_arg, iters=iters)
    t2 = timeit(f2, make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    g = ds.graph
    pair = g.norm_padded
    adj = pair.fwd

    N, d = g.num_nodes, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)

    def rep(body):
        def make(R):
            def run(a, x, i):
                x = x + jnp.float32(i) * 1e-9

                def step(c, _):
                    return body(a, c) * (1.0 - 1e-12), None

                y, _ = lax.scan(step, x, None, length=R)
                return y

            return jax.jit(run)

        return make

    # 1. one apply (sanity)
    dt = per_op(rep(lambda a, z: _apply(a, z, jnp.bfloat16)), lambda i: (adj, x, i))
    log(bench="chain", variant="one_apply", ms=round(dt * 1e3, 2))

    # 2. two chained applies per step
    dt = per_op(
        rep(lambda a, z: _apply(a, _apply(a, z, jnp.bfloat16), jnp.bfloat16)),
        lambda i: (adj, x, i),
    )
    log(bench="chain", variant="two_applies", ms=round(dt * 1e3, 2))

    # 3. propagate-shaped: acc chain + mean, L-layer ladder (padded_spmm w/ vjp)
    for L in (0, 1, 2):
        def prop(a, z, L=L):
            acc = z
            h = z
            for _ in range(L):
                h = padded_spmm(a, h, jnp.bfloat16)
                acc = acc + h
            return acc / (L + 1)

        dt = per_op(rep(prop), lambda i: (pair, x, i))
        log(bench="chain", variant=f"prop_L{L}", ms=round(dt * 1e3, 2))

    # 4. two chained applies with acc adds but NO custom_vjp wrapper
    def prop_raw(a, z):
        h1 = _apply(a, z, jnp.bfloat16)
        h2 = _apply(a, h1, jnp.bfloat16)
        return (z + h1 + h2) / 3.0

    dt = per_op(rep(prop_raw), lambda i: (adj, x, i))
    log(bench="chain", variant="prop_raw", ms=round(dt * 1e3, 2))

    # 5. same with an optimization_barrier forcing h1 to materialize — if XLA
    # was fusing apply-1's inv_perm/scatter epilogue into apply-2's gathers
    # (dependent two-level gathers), this should restore ~2x one_apply
    def prop_bar(a, z):
        h1 = jax.lax.optimization_barrier(_apply(a, z, jnp.bfloat16))
        h2 = _apply(a, h1, jnp.bfloat16)
        return (z + h1 + h2) / 3.0

    dt = per_op(rep(prop_bar), lambda i: (adj, x, i))
    log(bench="chain", variant="prop_barrier", ms=round(dt * 1e3, 2))

    # 6. L=2 propagate-shaped with barriers (the production-shaped candidate)
    def prop_L2_bar(a, z):
        acc = z
        h = z
        for _ in range(2):
            h = jax.lax.optimization_barrier(padded_spmm(a, h, jnp.bfloat16))
            acc = acc + h
        return acc / 3.0

    dt = per_op(rep(prop_L2_bar), lambda i: (pair, x, i))
    log(bench="chain", variant="prop_L2_barrier", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
