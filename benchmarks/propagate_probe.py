"""Full-graph propagate() cost at the flagship shape (dev probe).

eval_probe: Evaluator device time 3.55 s. eval_probe2: the eval scan itself
(score+mask+topk+metrics over 98 tiles) is only 0.51 s. The difference can
only be the model's full-graph propagation — measure it standalone, chained
(PERF.md timing discipline), plus the padded interaction-graph SpMM applies
it is made of.

Run from the repo root: python benchmarks/propagate_probe.py
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
from furusato_recommend_tpu.ops.padded_adj import padded_spmm  # noqa: E402

from spmm_bench import log, timeit  # noqa: E402

R1, R2 = 2, 8


def main():
    cfg = ddp_flagship_config().replace(topks=(10, 20))
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    params = model.init(jax.random.PRNGKey(0))
    bound = model.data_to_bind()
    graph = ds.graph
    print(f"# padded adj present: user_agg={graph.user_agg is not None} "
          f"item_agg={graph.item_agg is not None}", flush=True)

    def make_prop(R):
        def run(params, graph, bound, c0):
            with model.bind(bound):
                def body(i, c):
                    s = 1.0 + c * 1e-20
                    p = jax.tree_util.tree_map(lambda x: x * s, params)
                    u, it = model.propagate(p, graph, None)
                    return c + (u.sum() + it.sum()) * 1e-12

                return lax.fori_loop(0, R, body, c0)

        return jax.jit(run)

    ts = {}
    for R in (R1, R2):
        fn = make_prop(R)
        ts[R] = timeit(fn, lambda i: (params, graph, bound, jnp.float32(i) * 1e-6), iters=3)
    log(bench="propagate", ms=round((ts[R2] - ts[R1]) / (R2 - R1) * 1e3, 2))

    # the 2 interaction-graph applies per layer, isolated
    if graph.user_agg is not None:
        x_item = jax.random.normal(jax.random.PRNGKey(1), (ds.m_items, model.node_dim))
        x_user = jax.random.normal(jax.random.PRNGKey(2), (ds.n_users, model.node_dim))

        def make_applies(R):
            def run(xu, xi, graph, c0):
                def body(i, c):
                    ua = padded_spmm(graph.user_agg, xi + c * 1e-20, jnp.bfloat16)
                    ia = padded_spmm(graph.item_agg, xu + c * 1e-20, jnp.bfloat16)
                    return c + (ua.sum() + ia.sum()) * 1e-12

                return lax.fori_loop(0, R, body, c0)

            return jax.jit(run)

        ts = {}
        for R in (R1, R2):
            fn = make_applies(R)
            ts[R] = timeit(fn, lambda i: (x_user, x_item, graph, jnp.float32(i) * 1e-6), iters=3)
        log(bench="agg_pair", ms=round((ts[R2] - ts[R1]) / (R2 - R1) * 1e3, 2))


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
