"""Row scatter-add shoot-out on the real chip: XLA .at[].add vs the Pallas
VMEM-accumulator kernel (ops/pallas_scatter.py), at the flagship g_t shapes.

Dev script (one JSON line per measurement), run from the repo root:
    python benchmarks/scatter_probe.py
"""

from __future__ import annotations

import sys

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.ops.pallas_scatter import scatter_add_rows  # noqa: E402
from spmm_bench import log, timeit  # noqa: E402


def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
    t1 = timeit(make_prog(r1), make_arg, iters=iters)
    t2 = timeit(make_prog(r2), make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def main():
    rng = np.random.default_rng(0)
    for n, r in ((30_000, 285_000), (100_000, 180_000), (130_000, 465_000)):
        d = 32
        ids = jnp.asarray(rng.integers(0, n, r).astype(np.int32))
        rows = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))

        def xla_prog(R):
            def run(ids, rows, i):
                def body(_, rws):
                    y = jnp.zeros((n, d)).at[ids].add(rws)
                    return rws + y[:1, :1] * 1e-20  # chain

                return lax.fori_loop(0, R, body, rows + jnp.float32(i))

            return jax.jit(run)

        def pallas_prog(R):
            def run(ids, rows, i):
                def body(_, rws):
                    y = scatter_add_rows(ids, rws, n)
                    return rws + y[:1, :1] * 1e-20

                return lax.fori_loop(0, R, body, rows + jnp.float32(i))

            return jax.jit(run)

        dt_x = per_op(xla_prog, lambda i: (ids, rows, i))
        log(
            bench="scatter",
            impl="xla_at_add",
            n=n,
            r=r,
            ms=round(dt_x * 1e3, 2),
            ns_per_row=round(dt_x / r * 1e9, 2),
        )
        try:
            dt_p = per_op(pallas_prog, lambda i: (ids, rows, i))
            log(
                bench="scatter",
                impl="pallas_vmem",
                n=n,
                r=r,
                ms=round(dt_p * 1e3, 2),
                ns_per_row=round(dt_p / r * 1e9, 2),
            )
            # correctness on-chip
            got = scatter_add_rows(ids, rows, n)
            ref = jnp.zeros((n, d)).at[ids].add(rows)
            err = float(jnp.max(jnp.abs(got - ref)))
            log(bench="scatter_check", n=n, max_abs_err=err)
        except Exception as e:  # keep the rest of the probes alive
            log(bench="scatter", impl="pallas_vmem", n=n, error=str(e)[:200])


def einsum_probe():
    """The transpose-hub backward matmul: D^T @ g with a 300k-long contraction
    and a tiny [H, d] output — check XLA lowers it at HBM speed and compare
    formulations."""
    rng = np.random.default_rng(1)
    m, h, d = 300_000, 448, 16
    D = jnp.asarray(rng.standard_normal((m, h)).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))

    forms = {
        "einsum_mh_md_hd": lambda D, g: jnp.einsum(
            "mh,md->hd", D, g.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ),
        "dot_gT_D_T": lambda D, g: jnp.dot(
            g.astype(jnp.bfloat16).T, D, preferred_element_type=jnp.float32
        ).T,
        "fwd_D_x": lambda D, g: jnp.dot(  # the forward direction, for reference
            D, g[:h].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ),
    }
    for name, f in forms.items():
        def prog(R, f=f):
            def run(D, g, i):
                def body(_, gg):
                    y = f(D, gg)
                    # fold the FULL output back in — a scalar chain lets XLA
                    # dead-code-eliminate all but one output element
                    return gg.at[: y.shape[0]].add(y[:, :d] * 1e-20)

                return lax.fori_loop(0, R, body, g + jnp.float32(i))

            return jax.jit(run)

        dt = per_op(prog, lambda i: (D, g, i))
        log(bench="hub_bwd_matmul", form=name, ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    einsum_probe()
    main()
