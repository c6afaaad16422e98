"""initial_tables fwd + pullback cost per feature flag (dev probe).

probe2 measured the flagship (n/w/t) all-entity initial-embedding stage at
8.29 ms fwd / 3.92 ms pullback — several-fold above its HBM cost model
(~1.5 / ~1.1 ms). Which feature path is responsible? Build the same model
with each flag subset and time fwd / fwd+pull with in-program chained
repetition ((t(R2)-t(R1))/(R2-R1) cancels dispatch + RPC noise — the PERF.md
timing discipline; single-dispatch timings of this stage read 0.0 over the
tunnel).

Run from the repo root: python benchmarks/tables_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402

from spmm_bench import log, timeit  # noqa: E402

R1, R2 = 2, 12


def main():
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    nu, mi = 100_000, 30_000

    for flags in ("n", "w", "t", "nw", "nwt"):
        cfg = ddp_flagship_config().replace(
            topks=(10, 20), user_feature=flags, item_feature=flags
        )
        feats = synthetic_features(ds, cfg, seed=0)
        model = build_model("textsage", cfg, ds.graph, features=feats)
        params = model.init(jax.random.PRNGKey(0))
        bound = model.data_to_bind()
        d = model.node_dim
        gu = jax.random.normal(jax.random.PRNGKey(3), (nu, d))
        gi = jax.random.normal(jax.random.PRNGKey(4), (mi, d))

        def make(mode, R):
            def run(params, bound, c0, gu, gi):
                with model.bind(bound):
                    def body(i, c):
                        # perturb EVERY param multiplicatively: a knob on one
                        # leaf lets XLA hoist all loop-invariant compute out of
                        # the fori chain (reads 0.0); same for the cotangent.
                        # .sum() over everything: a [0,0] probe lets XLA slice
                        # the whole stage down to one row (also reads 0.0).
                        s = 1.0 + c * 1e-20
                        p = jax.tree_util.tree_map(lambda x: x * s, params)
                        if mode == "fwd":
                            u, it = model.initial_tables(p)
                            return c + (u.sum() + it.sum()) * 1e-12
                        _, pull = jax.vjp(model.initial_tables, p)
                        (g,) = pull((gu * s, gi * s))
                        tot = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
                        return c + tot * 1e-12

                    return lax.fori_loop(0, R, body, c0)

            return jax.jit(run)

        out = {}
        for mode in ("fwd", "pull"):
            ts = {}
            for R in (R1, R2):
                fn = make(mode, R)
                ts[R] = timeit(
                    fn,
                    lambda i: (params, bound, jnp.float32(i) * 1e-6, gu, gi),
                    iters=3,
                )
            out[mode] = (ts[R2] - ts[R1]) / (R2 - R1)
        log(
            bench="tables",
            flags=flags,
            fwd_ms=round(out["fwd"] * 1e3, 2),
            fwd_pull_ms=round(out["pull"] * 1e3, 2),
            pull_ms=round((out["pull"] - out["fwd"]) * 1e3, 2),
        )


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
