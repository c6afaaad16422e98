"""Persistent XLA compilation cache (Config.compile_cache).

The flagship epoch program costs ~4 min of XLA compile per process start; the
cache makes restarts (preemption recovery, serving hot-reload) reload the
executable from disk. TPU-native addition — the reference (eager torch) has no
compile step. Cross-process behavior needs subprocesses: the cache is written
at compile time and read by a FRESH process compiling the same program.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from furusato_recommend_tpu.config import Config
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.data.features import synthetic_features
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.train.trainer import Trainer

# textsage: its epoch program clears the 1 s persistence threshold (a toy mf
# compiles in <1 s and is deliberately NOT cached)
cfg = Config(model="textsage", latent_dim=8, bpr_batch_size=64, epochs=1,
             topks=(5,), eval_user_batch=32, user_feature="nt",
             item_feature="nt", compile_cache={cache!r})
ds = synthetic_dataset(n_users=60, m_items=40, avg_degree=5, seed=0)
feats = synthetic_features(ds, cfg, seed=0)
model = build_model(cfg.model, cfg, ds.graph, features=feats)
tr = Trainer(cfg, ds, model)
params, opt = tr.init_state()
params, opt, loss = tr.train_one_epoch(params, opt)
print("LOSS", float(loss))
"""


def _run(cache_dir: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo, cache=cache_dir)],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_compile_cache_persists_across_processes(tmp_path):
    cache = str(tmp_path / "xla_cache")
    _run(cache)
    entries = set(os.listdir(cache))
    assert entries, "first run wrote no cache entries"
    sizes = {e: os.path.getsize(os.path.join(cache, e)) for e in entries}
    _run(cache)
    # same program in a fresh process: every first-run entry survives with its
    # content intact, and no new compile-scale entry appears (a miss would
    # re-serialize the epoch/eval executables as fresh large entries). Metadata
    # touches by future JAX versions (mtime/LRU bookkeeping) are tolerated.
    after = {e: os.path.getsize(os.path.join(cache, e)) for e in os.listdir(cache)}
    for e, sz in sizes.items():
        assert after.get(e) == sz, f"first-run cache entry {e} changed or vanished"
    new_large = [e for e in after if e not in sizes and after[e] > 64 * 1024]
    assert not new_large, f"second run recompiled (new large entries: {new_large})"


def test_compile_cache_off_by_default(tmp_path):
    from furusato_recommend_tpu.config import Config

    assert Config().compile_cache == ""
