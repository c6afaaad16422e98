"""Pallas row scatter-add: acc[ids[i]] += rows[i] with a VMEM-resident
accumulator.

Why: the VJP of a table gather (tables[tree_node_ids] in the SAGE sampled
trees) is XLA scatter-add, measured at ~15 ns/row on v5e — it read-modify-
writes HBM per row. Keeping the [N, D] accumulator in VMEM turns the RMW into
register-speed vector ops; the ids stream through SMEM (scalar prefetch) and
the update rows through VMEM blocks.

Fits when N * D * 4B <= ~12 MB (v5e VMEM is 16 MB minus streaming buffers) —
true for the recommender tables this framework trains (e.g. 100k x 32 f32 =
12.8 MB is the flagship's largest side; larger tables fall back to XLA).

Status: STANDALONE, measured-loses-to-XLA inventory — NOT wired into any
production path. The table-cotangent scatter it targets was probe-measured as
random-access issue-rate bound (PERF.md "Round-2 (late) step probes": bf16
payload, fused single-scatter, and this kernel all null), so the production
VJP stays on XLA scatter-add. Kept as a validated kernel (tests/test_pallas.py,
benchmarks/scatter_probe.py) for table shapes where a VMEM-resident
accumulator could win; do not call it from models without a new measurement.
``table_gather`` here is the kernel's own custom-VJP wrapper for those probes,
not the one models/sage.py uses. Reference slot it would occupy:
`/root/reference/model/textsage.py:370-383` (autograd over index_select).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["scatter_add_rows", "table_gather", "PALLAS_SCATTER_MAX_BYTES"]

# accumulator budget: leave room for the row-block double buffers
PALLAS_SCATTER_MAX_BYTES = 13 * 1024 * 1024
_CHUNK = 2048  # ids per grid step
_UNROLL = 8


def _make_scatter_kernel(d: int, pack: int):
    """pack table rows of width d into 128-lane VMEM rows (pack = 128 // d):
    a [n, d<128] f32 accumulator would be lane-padded to 128 by Mosaic's
    T(8,128) layout — 4x VMEM for d=32, which OOMs the flagship user table."""

    def kernel(ids_ref, rows_ref, acc_ref):
        # ids arrive as a per-grid-step SMEM block (a full [R] scalar-prefetch
        # operand would overflow the 1 MB SMEM at production R)
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(i, _):
            # manual unroll: overlap the serial address-generation chain
            for u in range(_UNROLL):
                j = i * _UNROLL + u
                idx = ids_ref[j]
                v = rows_ref[pl.ds(j, 1), :]
                if pack == 1:
                    acc_ref[pl.ds(idx, 1), :] += v
                else:
                    row = idx // pack
                    sub = idx % pack
                    # static lane slices under predication (dynamic lane
                    # offsets are not supported by the lowering)
                    for k in range(pack):
                        @pl.when(sub == k)
                        def _(v=v, row=row, k=k):
                            acc_ref[pl.ds(row, 1), k * d : (k + 1) * d] += v
            return 0

        jax.lax.fori_loop(0, _CHUNK // _UNROLL, body, 0, unroll=False)

    return kernel


@partial(jax.jit, static_argnames=("num_rows", "interpret"))
def scatter_add_rows(
    ids: jnp.ndarray, rows: jnp.ndarray, num_rows: int, interpret: bool = False
) -> jnp.ndarray:
    """sum_i onehot(ids[i]) outer rows[i] -> [num_rows, D] (f32).

    ids: [R] int32 (R padded to a multiple of the chunk by the caller or here);
    rows: [R, D] f32. Out-of-range ids must be pre-clipped by the caller.
    """
    r, d = rows.shape
    r_pad = -(-r // _CHUNK) * _CHUNK
    if r_pad != r:
        # pad with id 0 / zero rows (contribute nothing)
        ids = jnp.concatenate([ids, jnp.zeros((r_pad - r,), ids.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros((r_pad - r, d), rows.dtype)])
    grid = r_pad // _CHUNK
    pack = max(128 // d, 1) if 128 % d == 0 else 1
    n_packed = -(-num_rows // pack)
    out = pl.pallas_call(
        _make_scatter_kernel(d, pack),
        grid_spec=pl.GridSpec(
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_CHUNK,), lambda g: (g,), memory_space=pltpu.SMEM),
                pl.BlockSpec((_CHUNK, d), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_packed, d * pack), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_packed, d * pack), jnp.float32),
        interpret=interpret,
    )(ids.astype(jnp.int32), rows.astype(jnp.float32))
    return out.reshape(n_packed * pack, d)[:num_rows]


def _fits(num_rows: int, d: int) -> bool:
    # VMEM cost of the packed accumulator, including lane padding when d does
    # not divide 128 (T(8,128) layout pads the minor dim)
    if 128 % d == 0:
        pack, lanes = max(128 // d, 1), 128
    else:
        pack, lanes = 1, -(-d // 128) * 128
    return (-(-num_rows // pack)) * lanes * 4 <= PALLAS_SCATTER_MAX_BYTES


@partial(jax.custom_vjp, nondiff_argnums=())
def table_gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] whose VJP is the Pallas VMEM scatter-add (XLA fallback when
    the table exceeds the VMEM budget). ids may be any shape; out-of-range
    behavior follows jnp (clipped)."""
    return table[ids]


def _gather_fwd(table, ids):
    # residuals must be JAX types: a [n, 0] empty array carries the table's
    # row count and dtype without holding any data
    return table[ids], (ids, jnp.empty((table.shape[0], 0), table.dtype))


def _gather_bwd(res, g):
    ids, proto = res
    n, dtype = proto.shape[0], proto.dtype
    d = g.shape[-1]
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, d)
    # trace-time gate: the compiled kernel is TPU-only (tests run the XLA
    # fallback on CPU; the kernel itself is unit-tested in interpret mode) and
    # single-device-only (under a >1-device mesh the table may be row-sharded;
    # pallas_call carries no partitioning rule, so defer to XLA scatter there)
    use_pallas = (
        jax.default_backend() not in ("cpu",)
        and len(jax.devices()) == 1
        and _fits(n, d)
        and flat_ids.shape[0] >= 4 * _CHUNK
    )
    if use_pallas:
        gt = scatter_add_rows(flat_ids, flat_g, n)
    else:
        gt = jnp.zeros((n, d), jnp.float32).at[flat_ids].add(
            flat_g.astype(jnp.float32)
        )
    return gt.astype(dtype), None


table_gather.defvjp(_gather_fwd, _gather_bwd)
