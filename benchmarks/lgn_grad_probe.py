"""Isolate why grad(propagate) costs ~11.3 ms when one _apply is 0.85 ms and
norm_padded is self-transpose (fwd == bwd object). Pieces:
  1. propagate fwd only (2 applies + concat/mean/slices)
  2. grad of ONE padded_spmm call (fwd+bwd = 2 applies expected)
  3. grad of full propagate (4 applies expected)
One JSON line per measurement; run from repo root on the real chip.
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
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
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
    cfg = Config(model="lgn", latent_dim=64, n_layers=2, bpr_batch_size=8192, lr=1e-3)
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=30, seed=0)
    g = ds.graph
    pair = g.norm_padded
    adj = pair.fwd
    model = build_model("lgn", cfg, g)
    params = model.init(jax.random.PRNGKey(0))

    N, d = g.num_nodes, cfg.latent_dim
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

    # 1. one apply fwd / bwd (same object, sanity)
    dt = per_op(rep(lambda a, z: _apply(a, z, jnp.bfloat16)), lambda i: (adj, x, i))
    log(bench="grad_probe", variant="one_apply_fwd", ms=round(dt * 1e3, 2))
    dt = per_op(rep(lambda a, z: _apply(a, z, jnp.bfloat16)), lambda i: (pair.bwd, x, i))
    log(bench="grad_probe", variant="one_apply_bwd", ms=round(dt * 1e3, 2))

    # 2. grad of ONE padded_spmm (expect ~2 applies)
    def spmm_grad(a, z):
        return jax.grad(
            lambda q: jnp.sum(padded_spmm(a, q) * jax.lax.stop_gradient(q))
        )(z)

    dt = per_op(rep(spmm_grad), lambda i: (pair, x, i))
    log(bench="grad_probe", variant="spmm_grad", ms=round(dt * 1e3, 2))

    # 3. propagate fwd only (expect ~2 applies)
    def prop_fwd(params, gg, i):
        u, it = model.propagate(params, gg)
        return jnp.sum(u) + jnp.sum(it)

    def prop_make(R):
        def run(params, gg, i):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda t: t * (1.0 - 1e-12), c)
                s = prop_fwd(p, gg, 0)
                p = jax.tree_util.tree_map(lambda t: t + s * 1e-20, p)
                return p, None

            p, _ = lax.scan(step, params, None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(prop_make, lambda i: (params, g, i))
    log(bench="grad_probe", variant="propagate_fwd", ms=round(dt * 1e3, 2))

    # 4. grad of propagate with a LINEAR loss (sum of outputs): cotangent is
    # ones, forward can be DCE'd except the applies feed nothing -> XLA may
    # DCE the whole forward; use stop_gradient coupling to keep it
    def prop_grad_make(R):
        def run(params, gg, i):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda t: t * (1.0 - 1e-12), c)
                gr = jax.grad(
                    lambda q: sum(
                        jnp.sum(e * jax.lax.stop_gradient(e))
                        for e in model.propagate(q, gg)
                    )
                )(p)
                return gr, None

            p, _ = lax.scan(step, params, None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(prop_grad_make, lambda i: (params, g, i))
    log(bench="grad_probe", variant="propagate_grad_sg", ms=round(dt * 1e3, 2))

    # 5. same but linear loss (forward result unused beyond applies)
    def prop_grad_lin_make(R):
        def run(params, gg, i):
            def step(c, _):
                p = jax.tree_util.tree_map(lambda t: t * (1.0 - 1e-12), c)
                gr = jax.grad(
                    lambda q: sum(jnp.sum(e) for e in model.propagate(q, gg))
                )(p)
                return gr, None

            p, _ = lax.scan(step, params, None, length=R)
            return p

        return jax.jit(run)

    dt = per_op(prop_grad_lin_make, lambda i: (params, g, i))
    log(bench="grad_probe", variant="propagate_grad_linear", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
