"""Online-serving latency/throughput at the flagship shape (round 3).

Measures serve.Recommender on the real chip: one-time propagate (index build)
and per-request masked-top-K latency across request batch sizes — the number
behind the production-serving tier claim. Timing uses the spmm_bench recipe
(queue-drain minus RPC baseline) because single-dispatch walls over the axon
tunnel carry ~25 ms of RPC noise.

Run from the repo root: python benchmarks/serve_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.serve import Recommender  # noqa: E402
from spmm_bench import rpc_baseline, timeit  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    log(bench="start", backend=jax.default_backend())
    cfg = ddp_flagship_config().replace(topks=(10, 20))
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    params = model.init(jax.random.PRNGKey(0))

    t0 = time.time()
    rec = Recommender(model, ds, cfg, params, use_inference_edges=False)
    np.asarray(rec._user_emb[:1, :1])  # force (block_until_ready lies over the tunnel)
    log(bench="serve_index_build", propagate_s=round(time.time() - t0, 2))

    # ---- co-located device time of the request path (round-4 verdict #6) ----
    # In-program repetition of the exact serving computation (score + exclusion
    # mask + top-K, the jitted _topk tile recommend() dispatches): a thin jitted
    # varier rotates the user tile on device, so the measurement excludes the
    # tunnel RPC that dominates the wall numbers below. This is the latency a
    # co-located client (reference serving: same-host GPU) would see.
    import jax.numpy as jnp  # noqa: E402 (local: keep module import surface flat)

    rng = np.random.default_rng(0)
    n_users = ds.n_users

    def request_path(u, i, ue, ie, mg):
        return rec._topk((u + i) % n_users, ue, ie, mg, 20)

    req_j = jax.jit(request_path)
    for tile in (8, 64, 512, 4096):
        u0 = jnp.asarray(rng.integers(0, n_users, tile).astype(np.int32))
        dt = timeit(
            req_j,
            lambda i: (u0, i, rec._user_emb, rec._item_emb, rec._mask_graph),
            iters=30,
        )
        log(
            bench="serve_device_time",
            tile=tile,
            k=20,
            device_ms=round(dt * 1e3, 3),
            users_per_sec=round(tile / dt, 1),
        )

    base = rpc_baseline()
    for bs in (1, 8, 64, 512, 4096):
        users = rng.integers(0, ds.n_users, (40, bs)).astype(np.int32)
        rec.recommend(users[0], k=20)  # compile the tile
        t0 = time.perf_counter()
        for i in range(40):
            # recommend() fetches results (host RPC each call) — that IS the
            # serving path, so walls include it; subtract one RPC baseline
            rec.recommend(users[i], k=20)
        dt = (time.perf_counter() - t0) / 40
        log(
            bench="serve_latency",
            batch=bs,
            k=20,
            ms_per_request=round(dt * 1e3, 2),
            users_per_sec=round(bs / dt, 1),
            rpc_baseline_ms=round(base * 1e3, 1),
        )


if __name__ == "__main__":
    main()
