"""Is whole-epoch weighted sampling intrinsically 2.3 s / 2.1M triplets, or
only when compiled into the same program as the train scan?

trainer_epoch_probe.py measured the flagship epoch at 20.75 ms/step with
in-program sampling vs 15.33 ms/step with presampled batches — a 2.27 s/epoch
delta, ~10x the standalone sampler numbers (PERF.md). This probe times the
SAME sample_bpr call (2.105M weighted triplets, flagship graph + capped edge
alias) as its own jitted program, syncing every output leaf, plus the uniform
path for reference.

One JSON line per measurement; run from the repo root:
    python benchmarks/sample_incontext_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.sampling.bpr import sample_bpr  # noqa: E402
from furusato_recommend_tpu.sampling.weights import (  # noqa: E402
    capped_positive_edge_weights,
    edge_alias_from_weights,
)

from spmm_bench import log, timeit  # noqa: E402


def main():
    cfg = ddp_flagship_config()
    ds = synthetic_dataset(n_users=100_000, m_items=30_000, avg_degree=8, seed=0)
    graph = ds.graph
    n = 421 * cfg.bpr_batch_size  # the flagship epoch's 2.105M triplets
    w = capped_positive_edge_weights(ds, n, cfg.positive_num_limit)
    alias = edge_alias_from_weights(w)

    def run(variant, edge_alias):
        fn = jax.jit(
            lambda k, g, a: sample_bpr(
                k, g, n, neg_candidates=cfg.neg_candidates, edge_alias=a
            ),
            static_argnames=(),
        )

        def call(k, g, a):
            s = fn(k, g, a)
            # depend on every leaf so nothing is pruned
            return s.user[0] + s.pos[0] + s.neg[0] + s.valid[0].astype(jnp.int32)

        dt = timeit(call, lambda i: (jax.random.PRNGKey(i), graph, edge_alias), iters=5)
        log(
            bench="sample_standalone",
            variant=variant,
            n=n,
            ms=round(dt * 1e3, 1),
            ns_per_triplet=round(dt / n * 1e9, 1),
        )

    run("weighted", alias)
    run("uniform", None)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
