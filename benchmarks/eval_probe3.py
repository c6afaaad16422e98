"""Chained re-measurement of the REAL Evaluator program (dev probe).

eval_probe (single-dispatch wall time) read 3.55 s device time for the
flagship eval; eval_probe2 (chained, same scan structure with precomputed
embeddings) read 0.51 s and propagate_probe read 10 ms — they cannot both be
right. Chain the actual Evaluator._evaluate_inner R times and difference two
repetition counts: if this reads ~0.5 s the single-dispatch wall number was
tunnel artifact, and PERF.md's "3.7 s warm eval" line must be corrected.

Run from the repo root: python benchmarks/eval_probe3.py
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402

from spmm_bench import log, timeit  # noqa: E402

R1, R2 = 1, 3


def main():
    cfg = ddp_flagship_config().replace(topks=(10, 20))
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    params = model.init(jax.random.PRNGKey(0))
    bound = model.data_to_bind()
    max_deg = int(np.max(np.bincount(ds.train_user, minlength=ds.n_users)))
    ev = Evaluator(model, ds.graph, cfg, max_train_degree=max_deg)
    cats = np.random.default_rng(0).integers(0, 50, (ds.m_items, 4)).astype(np.int32)
    data = build_eval_data(ds, cfg.eval_user_batch, item_categories=cats)

    def make(R):
        def run(graph, params, data, bound, c0):
            def body(i, c):
                s = 1.0 + c * 1e-20
                p = jax.tree_util.tree_map(lambda x: x * s, params)
                sums, cold, cov, topks = ev._evaluate(graph, p, data, bound)
                return c + (sums["recall"][0] + jnp.sum(topks[:1, :1]) * 1e-9) * 1e-9

            return lax.fori_loop(0, R, body, c0)

        return jax.jit(run)

    ts = {}
    for R in (R1, R2):
        fn = make(R)
        ts[R] = timeit(
            fn, lambda i: (ev.graph, params, data, bound, jnp.float32(i) * 1e-6),
            iters=3,
        )
    per = (ts[R2] - ts[R1]) / (R2 - R1)
    log(bench="evaluator_chained", total_s=round(per, 3),
        users_per_s=int(100_000 / max(per, 1e-9)),
        t1=round(ts[R1], 3), t3=round(ts[R2], 3))


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
