"""Embedding-lookup throughput (BASELINE.md target #2 bullet: "embedding
lookups/s/chip").

Measures the two lookup regimes the framework actually runs:
- forward gather: rows = table[ids] (training/serving reads),
- fwd+bwd: gather + the transposed scatter-add of the cotangent into the
  table (the training update path's table gradient).

Shapes mirror the bench graph's joint table ([70k, 64] f32) with 1M uniform
ids per call. Timing is the in-program-repetition recipe (spmm_bench.timeit):
R dependent applies chained in one program, two repetition counts differenced,
which cancels dispatch + tunnel RPC exactly.

Run on the chip from the repo root: python benchmarks/lookup_bench.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from spmm_bench import timeit  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
    f1, f2 = make_prog(r1), make_prog(r2)
    t1 = timeit(f1, make_arg, iters=iters)
    t2 = timeit(f2, make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def main():
    log(bench="lookup_bench", backend=jax.default_backend())
    V, d, N = 70_000, 64, 1_000_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    # forward gather: chain R gathers with a data dependency through the ids
    # (rows' first column re-indexes, keeping every gather live)
    def fwd_prog(R):
        def run(tb, ids0, i):
            def body(_, idv):
                rows = tb[idv]
                return (idv + rows[:, 0].astype(jnp.int32)) % V

            return lax.fori_loop(0, R, body, (ids0 + i) % V)

        return jax.jit(run)

    dt_f = per_op(fwd_prog, lambda i: (table, ids, jnp.int32(i)))
    log(bench="lookup_fwd", ids_per_call=N,
        ms_per_call=round(dt_f * 1e3, 3),
        lookups_per_sec=round(N / dt_f / 1e6, 1),
        unit="M lookups/s ([70k,64] f32 table, 1M uniform ids)")

    # fwd+bwd: grad of sum(table[ids] * g) w.r.t. table = scatter-add
    def bwd_prog(R):
        def run(tb, ids0, i):
            gfn = jax.grad(lambda t: jnp.sum(t[(ids0 + i) % V] ** 2))
            return lax.fori_loop(0, R, lambda _, t: gfn(t) + tb, tb)

        return jax.jit(run)

    dt_b = per_op(bwd_prog, lambda i: (table, ids, jnp.int32(i)))
    log(bench="lookup_fwd_bwd", ids_per_call=N,
        ms_per_call=round(dt_b * 1e3, 3),
        lookups_per_sec=round(N / dt_b / 1e6, 1),
        unit="M lookups/s incl. scatter-add table grad")


if __name__ == "__main__":
    main()
