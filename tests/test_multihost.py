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
