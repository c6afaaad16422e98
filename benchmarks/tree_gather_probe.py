"""Shaped vs flat ROW gathers + their scatter-add VJPs at the TextSAGE tree shape.

The sampler probes found shaped SCALAR gathers lower ~6x worse than flat
(raveled-index) ones (PERF.md "sampler probes"). The TextSAGE tree path gathers
d=32 ROWS at [B], [B,F], [B,F,F]-shaped indices (models/sage.py:encode_seeds)
and its VJP is the 3.3 ms/step dense-table scatter-add (textsage_probe
scatter_only - tables_const). Does raveling indices before the row gather help
either direction?

One JSON line per measurement; run from the repo root:
    python benchmarks/tree_gather_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from spmm_bench import log, timeit  # noqa: E402

N, D = 130_000, 32
B, F = 5000, 5
R = 10  # in-program repetitions (dependent chain) per timing


def chain(fn):
    """Repeat fn R times with a dependent perturbation so XLA can't CSE."""

    def run(table, idxs):
        def body(i, t):
            out = fn(t, idxs)
            return t + 1e-12 * out[:1].sum()

        t = jax.lax.fori_loop(0, R, body, table)
        return t[0, 0]

    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, D), dtype=jnp.float32)
    # one seed tree's levels: [B], [B,F], [B,F,F] (x3 trees in the real step)
    ks = jax.random.split(key, 3)
    levels = [
        jax.random.randint(ks[0], (B,), 0, N),
        jax.random.randint(ks[1], (B, F), 0, N),
        jax.random.randint(ks[2], (B, F, F), 0, N),
    ]

    def gather_shaped(t, idxs):
        return jnp.concatenate([t[i].reshape(-1, D) for i in idxs], axis=0)

    def gather_flat(t, idxs):
        return jnp.concatenate(
            [t[i.reshape(-1)] for i in idxs], axis=0
        )

    def vjp_of(g):
        def run(t, idxs):
            out, vjp = jax.vjp(lambda tt: g(tt, idxs), t)
            (gt,) = vjp(jnp.ones_like(out))
            return gt

        return run

    variants = {
        "fwd_shaped": gather_shaped,
        "fwd_flat": gather_flat,
        "fwdbwd_shaped": vjp_of(gather_shaped),
        "fwdbwd_flat": vjp_of(gather_flat),
    }
    rows = sum(int(jnp.size(i)) for i in levels)
    for name, fn in variants.items():
        f = chain(fn)
        dt = timeit(f, lambda i: (table + i * 1e-9, levels), iters=3)
        log(
            bench="tree_gather",
            variant=name,
            rows=rows,
            ms_per_apply=round(dt / R * 1e3, 3),
            ns_per_row=round(dt / R / rows * 1e9, 2),
        )


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
