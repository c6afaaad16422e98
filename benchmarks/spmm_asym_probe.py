"""Probe: why does the SpMM grad program cost ~4x one forward apply?

The LightGCN normalized adjacency is SYMMETRIC, so the transpose apply in the
VJP is structurally identical to the forward — fwd+bwd should be ~2x fwd, but
PERF.md measures ~4.2x at the bench shape. Decompose by elimination:

  1. one apply                      (baseline)
  2. two CHAINED applies A(A(x))    (is a dependent second apply 2x or 4x?)
  3. bwd-adj apply alone            (is the transpose adjacency itself slower?)
  4. jax.grad of sum(A x * c)       (linear loss: cotangent is a constant)
  5. jax.grad of sum((A x)^2)       (the spmm_bench formulation)

One JSON line per measurement. Run from the repo root on the real chip.
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

from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    PaddedAdjPair,
    _apply,
    build_padded_adj,
    padded_spmm,
)

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


def rep(body):
    """Chain R dependent applications of body(adj_or_pair, x) with a tiny
    perturbation so XLA cannot CSE across iterations. The adjacency flows as
    an ARGUMENT — closing over it bakes it into the executable as constants
    and overflows the remote-compile payload (PERF.md, data_to_bind note)."""

    def make(R):
        def run(a, x, i):
            x = x + jnp.float32(i) * 1e-9

            def step(c, _):
                return body(a, c) * (1.0 - 1e-12), None

            y, _ = lax.scan(step, x, None, length=R)
            return y

        return jax.jit(run)

    return make


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n_users, m_items, n_edges, d = 50_000, 20_000, 1_500_000, 64
    N = n_users + m_items
    u = rng.integers(0, n_users, n_edges)
    v = rng.choice(  # Zipf items like the bench synthetic graph
        m_items, size=n_edges, p=(p := 1.0 / np.arange(1, m_items + 1) ** 0.8) / p.sum()
    )
    src = np.concatenate([u, n_users + v])
    dst = np.concatenate([n_users + v, u])
    w = np.ones(len(src), np.float32)
    adj = build_padded_adj(src, dst, w, N, hub_count=1024, dst_hub_count=1024, num_src=N)
    pair = PaddedAdjPair(fwd=adj, bwd=adj)
    tail = sum(int(np.sum(b > -1)) for b in []) or sum(a.shape[0] * a.shape[1] for a in adj.bucket_nbrs)
    log(bench="shape", pad_slots=tail, buckets=len(adj.bucket_nbrs))

    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)

    dt = per_op(rep(lambda a, z: _apply(a, z, jnp.bfloat16)), lambda i: (adj, x, i))
    log(bench="spmm_asym", variant="one_apply", ms=round(dt * 1e3, 2))

    dt = per_op(
        rep(lambda a, z: _apply(a, _apply(a, z, jnp.bfloat16), jnp.bfloat16)),
        lambda i: (adj, x, i),
    )
    log(bench="spmm_asym", variant="two_chained_applies", ms=round(dt * 1e3, 2))

    # loss = sum(A q * sg(q)): cotangent to y is sg(z) (carry-dependent, not
    # hoistable) and the custom VJP keeps no residuals, so the fwd apply is
    # DCE'd — this times the BACKWARD (transpose) apply alone.
    dt = per_op(
        rep(
            lambda p, z: jax.grad(
                lambda q: jnp.sum(padded_spmm(p, q) * jax.lax.stop_gradient(q))
            )(z)
        ),
        lambda i: (pair, x, i),
    )
    log(bench="spmm_asym", variant="grad_bwd_apply_only", ms=round(dt * 1e3, 2))

    dt = per_op(
        rep(lambda p, z: jax.grad(lambda q: jnp.sum(padded_spmm(p, q) ** 2))(z)),
        lambda i: (pair, x, i),
    )
    log(bench="spmm_asym", variant="grad_square_loss", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
