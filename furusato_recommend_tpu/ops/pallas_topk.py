"""Pallas streaming full-catalog scoring + top-k.

The eval hot path scores every user tile against the whole catalog
(`/root/reference/trainer.py:124-143`): U[B,d] @ I[M,d]^T then top-K. The XLA
path materializes the [B, M] score matrix in HBM (at M ~ 10^5-10^6 that is the
dominant eval bandwidth cost) before a separate top_k pass. This kernel streams
item tiles through VMEM flash-attention-style: per grid step it computes the
[B, T] tile scores on the MXU and folds them into a persistent [B, K] running
top-K scratch via iterative masked argmax — the full score matrix never exists.

HBM traffic drops from O(B*M) scores + O(M*d) items to O(M*d) items only.

Measured (v5e, B=256, M=200k, d=64, K=32): XLA matmul+top_k 8.2 ms, this kernel
10.0 ms — XLA's fused path wins on raw time at this M because the score buffer
still fits HBM comfortably; the kernel's O(B*K) working set is the win when
B*M scores would not (multi-million-item catalogs, or eval concurrent with
training on the same chip). Exposed behind ``Config.use_pallas_topk``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["streaming_topk"]

NEG_INF = -3.0e38


def _kernel(u_ref, i_ref, vals_ref, ids_ref, best_v, best_i, *, k, tile, num_tiles, m):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        best_v[:] = jnp.full_like(best_v, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    scores = jnp.dot(
        u_ref[:], i_ref[:].T, preferred_element_type=jnp.float32
    )  # [B, T]
    b = scores.shape[0]
    tile_ids = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
    scores = jnp.where(tile_ids < m, scores, NEG_INF)  # catalog padding

    # fold tile into running top-k: concat candidates then k iterative
    # max-extractions. All ops stay 2-D with keepdims (Mosaic vector-layout
    # constraint: 1-D argmax/iota patterns crash ApplyVectorLayout).
    cand_v = jnp.concatenate([best_v[:], scores], axis=1)  # [B, K+T]
    cand_i = jnp.concatenate([best_i[:], tile_ids], axis=1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    width = k + tile
    col_w = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)

    def select(j, carry):
        cand_v, new_v, new_i = carry
        v = jnp.max(cand_v, axis=1, keepdims=True)  # [B, 1]
        is_max = cand_v == v
        # tie-break to one column per row: smallest column index among maxima
        # (no cumsum — unsupported in Mosaic)
        cmin = jnp.min(jnp.where(is_max, col_w, width), axis=1, keepdims=True)
        sel = is_max & (col_w == cmin)
        i = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)  # [B, 1]
        onej = col_k == j
        new_v = jnp.where(onej, v, new_v)
        new_i = jnp.where(onej, i, new_i)
        cand_v = jnp.where(sel, NEG_INF, cand_v)
        return cand_v, new_v, new_i

    _, new_v, new_i = jax.lax.fori_loop(
        0, k, select, (cand_v, jnp.zeros_like(best_v[:]), jnp.zeros_like(best_i[:]))
    )
    best_v[:] = new_v
    best_i[:] = new_i

    @pl.when(t == num_tiles - 1)
    def _():
        vals_ref[:] = best_v[:]
        ids_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def streaming_topk(
    user_emb: jnp.ndarray,  # [B, d]
    item_emb: jnp.ndarray,  # [M, d]
    k: int,
    tile: int = 2048,
    interpret: bool = False,
):
    """Returns (values [B, k] f32, ids [B, k] i32) of the top-k inner products.
    M is padded to a tile multiple; padded columns are masked to -inf in-kernel.
    """
    b, d = user_emb.shape
    m = item_emb.shape[0]
    m_pad = -(-m // tile) * tile
    if m_pad != m:
        item_emb = jnp.concatenate(
            [item_emb, jnp.zeros((m_pad - m, d), item_emb.dtype)], axis=0
        )
    num_tiles = m_pad // tile
    kernel = functools.partial(_kernel, k=k, tile=tile, num_tiles=num_tiles, m=m)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(user_emb, item_emb)
    return vals, ids
