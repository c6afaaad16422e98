"""Structural multi-host validation (SURVEY §5.8): two REAL processes join a
jax.distributed world over CPU and run a collective through a global mesh.

The reference's equivalent is the NCCL rendezvous in
`/root/reference/ddp.py:884-891`; here the world is 2 processes x 2 CPU
devices. This cannot prove TPU-ICI performance, but it proves the
initialize_multihost contract (world-size validation, loud failure),
host-divergent sampling keys, and that a global-mesh reduction produces the
same result on every host — the pieces a v5e-16 launch would exercise.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

pid = int(sys.argv[1]); coord = sys.argv[2]; sys.path.insert(0, sys.argv[3])
from furusato_recommend_tpu.core.distributed import (
    host_divergent_key, initialize_multihost, is_primary_host,
)

initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(jax.devices(), ("data",))
# each process contributes its local shards of a length-4 global array
global_x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("data")),
    lambda idx: jnp.arange(4.0)[idx],
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(global_x)
k = jax.random.PRNGKey(0)
kd = host_divergent_key(k)
print(json.dumps({
    "pid": pid,
    "total": float(jax.device_get(total)),
    "primary": is_primary_host(),
    "divergent_key": [int(v) for v in jax.device_get(jax.random.key_data(kd))],
}), flush=True)
"""


def test_two_process_world():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), coord, _REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # the global reduction saw all four shards on both hosts
    assert outs[0]["total"] == outs[1]["total"] == 6.0
    assert outs[0]["primary"] is True and outs[1]["primary"] is False
    # per-host sampling streams diverge
    assert outs[0]["divergent_key"] != outs[1]["divergent_key"]


_CHILD_TRAINER = r"""
import json, sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); coord = sys.argv[2]; sys.path.insert(0, sys.argv[3])
mesh_data, mesh_model = int(sys.argv[4]), int(sys.argv[5]); ckpt = sys.argv[6]
from furusato_recommend_tpu.core.distributed import initialize_multihost, is_primary_host
initialize_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

from furusato_recommend_tpu.config import Config, MeshConfig
from furusato_recommend_tpu.data import synthetic_dataset
from furusato_recommend_tpu.models.registry import build_model
from furusato_recommend_tpu.train.trainer import Trainer

ds = synthetic_dataset(n_users=64, m_items=80, avg_degree=6, seed=3)
cfg = Config(model="lgn", latent_dim=16, bpr_batch_size=64, lr=0.05,
             eval_user_batch=32, topks=(5,),
             mesh=MeshConfig(data=mesh_data, model=mesh_model),
             donate_params=False)
model = build_model("lgn", cfg, ds.graph)
tr = Trainer(cfg, ds, model)
params, opt = tr.init_state()
losses = []
for _ in range(2):
    params, opt, loss = tr.train_one_epoch(params, opt)
    losses.append(float(loss))
res = tr.test(params)
# global |param| sum through a jitted replicated reduction (works even when
# leaves are sharded across processes)
from jax.sharding import NamedSharding, PartitionSpec as P
psum = jax.jit(
    lambda p: sum(abs(v).sum() for v in jax.tree_util.tree_leaves(p)),
    out_shardings=NamedSharding(tr.mesh, P()),
)(params)
saved = ""
if ckpt != "-":
    # per-pid target so each child observes only ITS OWN write: the guard must
    # make the secondary's save a no-op
    path = os.path.join(ckpt, f"h{pid}_state.ckpt")
    tr.save(params, opt, path=path)
    saved = path if os.path.exists(path) else ""
print(json.dumps({
    "pid": pid, "losses": losses, "recall": float(res["recall@5"]),
    "ndcg": float(res["ndcg@5"]), "psum": float(jax.device_get(psum)),
    "primary": is_primary_host(), "saved": saved,
}), flush=True)
"""


def _spawn_two(child_src, extra_args, timeout=420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child_src, str(pid), coord, _REPO, *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.parametrize("mesh_spec", [(4, 1), (2, 2)])
def test_two_process_trainer_equals_single_process(mesh_spec, tmp_path):
    """The REAL Trainer — on-device sampling, whole-epoch scan, sharded eval,
    checkpoint — executed in a true 2-process jax.distributed world (round-4
    verdict #2): losses, eval metrics, and params must be identical on both
    hosts AND equal to the single-process single-device run of the same
    config; only the primary host writes the checkpoint. Multi-host launch
    (MIGRATION.md) therefore adds jax.distributed env wiring and nothing else."""
    d, m = mesh_spec
    ckpt = str(tmp_path) if mesh_spec == (4, 1) else "-"
    outs = _spawn_two(_CHILD_TRAINER, [str(d), str(m), ckpt])

    # baseline: same config, single process, single device
    import jax
    import numpy as np

    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.train.trainer import Trainer

    ds = synthetic_dataset(n_users=64, m_items=80, avg_degree=6, seed=3)
    cfg = Config(model="lgn", latent_dim=16, bpr_batch_size=64, lr=0.05,
                 eval_user_batch=32, topks=(5,), donate_params=False)
    model = build_model("lgn", cfg, ds.graph)
    tr = Trainer(cfg, ds, model)
    params, opt = tr.init_state()
    base_losses = []
    for _ in range(2):
        params, opt, loss = tr.train_one_epoch(params, opt)
        base_losses.append(float(loss))
    base = tr.test(params)
    base_psum = float(sum(float(abs(np.asarray(v)).sum())
                          for v in jax.tree_util.tree_leaves(params)))

    for o in outs:
        np.testing.assert_allclose(o["losses"], base_losses, rtol=1e-4)
        np.testing.assert_allclose(o["recall"], base["recall@5"], rtol=1e-4)
        np.testing.assert_allclose(o["ndcg"], base["ndcg@5"], rtol=1e-4)
        np.testing.assert_allclose(o["psum"], base_psum, rtol=1e-4)
    assert outs[0]["primary"] and not outs[1]["primary"]
    if ckpt != "-":
        # single-writer: primary wrote, secondary's save was a guarded no-op
        assert outs[0]["saved"] and not outs[1]["saved"]


_CHILD_BADCOORD = r"""
import sys
import jax
jax.config.update('jax_platforms','cpu')
sys.path.insert(0, sys.argv[1])
from furusato_recommend_tpu.core.distributed import initialize_multihost
try:
    initialize_multihost(coordinator_address='127.0.0.1:1',
                         num_processes=2, process_id=1, timeout_s=5)
except Exception:
    print('RAISED'); raise SystemExit(0)
print('NO RAISE')
raise SystemExit(1)
"""


def test_unreachable_coordinator_fails_loudly():
    """A requested world that cannot be realized must fail LOUDLY, never
    degrade to single-host. Two loud modes are acceptable: a Python exception
    (our wrapper re-raises), or the coordination client's fatal process abort
    ("JAX distributed service detected fatal errors"). Run in a subprocess:
    jax.distributed.initialize mutates global state either way."""
    r = subprocess.run(
        [sys.executable, "-c", _CHILD_BADCOORD, _REPO],
        capture_output=True,
        text=True,
        timeout=120,
    )
    raised = r.returncode == 0 and "RAISED" in r.stdout
    aborted = r.returncode != 0 and (
        "detected fatal errors" in r.stderr or "DEADLINE_EXCEEDED" in r.stderr
    )
    assert raised or aborted, (r.returncode, r.stdout, r.stderr[-2000:])
    assert "NO RAISE" not in r.stdout  # silent degradation is the one failure
