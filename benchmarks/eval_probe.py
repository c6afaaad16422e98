"""Full-catalog eval decomposition at the flagship shape (dev probe).

PERF.md reports 3.7 s warm for the 100k-user eval — but how much of that is
device compute vs the host fetch of the [n_users, Kmax] top-k id buffer over
the axon tunnel (8 MB), vs the host-side coverage/unexpectedness numpy?

  run        Evaluator._run dispatch + metric-sums fetch only (tiny transfer)
  fetch      device_get of the stored topks buffer
  call       the full Evaluator.__call__ (includes both + host coverage)

Run from the repo root: python benchmarks/eval_probe.py
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.eval.evaluate import Evaluator, build_eval_data  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402

from spmm_bench import log  # noqa: E402


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

    # warmup/compile
    res, shown = ev(params, data, bound=bound)
    print(f"# warm results recall@10={res['recall@10']:.5f}", flush=True)

    # run-only: dispatch + fetch the tiny sums (the with_topk=False shape)
    t0 = time.perf_counter()
    sums, cold, cov, topks = ev._run(ev.graph, params, data, bound)
    s = jax.device_get(sums)
    c = jax.device_get(cov)
    t_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    t_np = jax.device_get(topks)
    t_fetch = time.perf_counter() - t0

    t0 = time.perf_counter()
    res, shown = ev(params, data, bound=bound)
    t_call = time.perf_counter() - t0

    log(
        bench="eval_decomp",
        run_s=round(t_run, 3),
        topk_fetch_s=round(t_fetch, 3),
        full_call_s=round(t_call, 3),
        topk_bytes=int(np.asarray(t_np).nbytes),
    )


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
