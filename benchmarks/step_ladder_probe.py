"""Full train-step ladders: n_layers in {0,1,2} x batch in {1024, 8192, 32768}.
Per-layer increment = fwd+bwd apply pair cost in the real step; L=0 row = the
batch-dependent + optimizer floor. Pins where the non-apply ~3.6 ms/step goes.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import BPRBatch  # noqa: E402

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
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    for L in (0, 1, 2):
        cfg = Config(model="lgn", latent_dim=64, n_layers=L, bpr_batch_size=8192, lr=1e-3)
        model = build_model("lgn", cfg, g)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        for B in ((1024, 8192, 32768) if L == 2 else (8192,)):
            batch = BPRBatch(
                user=jnp.asarray(rng.integers(0, g.n_users, B), jnp.int32),
                pos=jnp.asarray(rng.integers(0, g.m_items, B), jnp.int32),
                neg=jnp.asarray(rng.integers(0, g.m_items, B), jnp.int32),
                valid=jnp.ones((B,), bool),
            )

            def step_make(R, model=model, opt=opt):
                def run(params, opt_state, gg, batch, i):
                    def step(carry, _):
                        p, s = carry
                        (_loss, _aux), grads = jax.value_and_grad(
                            model.loss, has_aux=True
                        )(p, gg, batch, key)
                        updates, s = opt.update(grads, s, p)
                        p = optax.apply_updates(p, updates)
                        return (p, s), None

                    (p, s), _ = lax.scan(step, (params, opt_state), None, length=R)
                    return p

                return jax.jit(run)

            dt = per_op(step_make, lambda i: (params, opt_state, g, batch, i))
            log(bench="step_ladder", L=L, B=B, ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
