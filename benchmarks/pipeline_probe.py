"""Epoch-dispatch pipelining probe (round-4 verdict #6).

Measures --pipeline_dispatch at the flagship shape (TextSAGE ddp_recipe R=1,
100k x 30k): wall time per epoch with the synchronous dispatch order
(sample -> scan -> loss sync) vs the prefetched order (sample e+1 enqueued
before e's loss sync, device queue never drains). Results-identical paths
(tests/test_models_e2e.py::test_pipeline_dispatch_equals_sync); this probe
decides whether the flag defaults on. Adopt at a measured win, else record
the null (the capladder standard).

Run on the chip from the repo root: python benchmarks/pipeline_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from quality_curve import load_dataset  # noqa: E402

from furusato_recommend_tpu.config import ddp_flagship_config  # noqa: E402
from furusato_recommend_tpu.data.features import synthetic_features  # noqa: E402
from furusato_recommend_tpu.models.registry import build_model  # noqa: E402
from furusato_recommend_tpu.train.trainer import Trainer  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def run(pipeline: bool, ds, epochs: int = 5):
    cfg = ddp_flagship_config().replace(
        eval_user_batch=2048, topks=(10, 20), pipeline_dispatch=pipeline,
        compile_cache="/tmp/pipeline_probe_xla_cache",
    )
    feats = synthetic_features(ds, cfg, seed=0)
    model = build_model("textsage", cfg, ds.graph, features=feats)
    tr = Trainer(cfg, ds, model, ddp_recipe=True)
    params, opt = tr.init_state()
    t0 = time.time()
    params, opt, _ = tr.train_one_epoch(params, opt)  # compile + warmup
    log(mode="pipeline" if pipeline else "sync", warmup_s=round(time.time() - t0, 1))
    times = []
    for _ in range(epochs):
        t0 = time.time()
        params, opt, loss = tr.train_one_epoch(params, opt)
        times.append(time.time() - t0)
    sps = tr.samples_per_epoch / (sum(times) / len(times))
    log(
        mode="pipeline" if pipeline else "sync",
        epochs=epochs,
        epoch_s=[round(t, 3) for t in times],
        mean_epoch_s=round(sum(times) / len(times), 3),
        samples_per_s=round(sps),
        loss=round(loss, 4),
    )
    return sum(times) / len(times)


def main():
    log(bench="pipeline_probe", backend=jax.default_backend())
    ds = load_dataset()
    t_sync = run(False, ds)
    t_pipe = run(True, ds)
    log(bench="verdict", speedup=round(t_sync / t_pipe, 4))


if __name__ == "__main__":
    main()
