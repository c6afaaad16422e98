"""Pallas streaming full-catalog scoring + top-k.

The eval hot path scores every user tile against the whole catalog
(`/root/reference/trainer.py:124-143`): U[B,d] @ I[M,d]^T then top-K. The XLA
path materializes the [B, M] score matrix in HBM (at M ~ 10^5-10^6 that is the
dominant eval bandwidth cost) before a separate top_k pass. This kernel streams
item tiles through VMEM flash-attention-style: per grid step it computes the
[B, T] tile scores on the MXU and folds them into a persistent [B, K] running
top-K scratch via iterative masked argmax — the full score matrix never exists.

HBM traffic drops from O(B*M) scores + O(M*d) items to O(M*d) items only.

Status: STANDALONE, not wired into the Evaluator. Measured crossover table
(v5e, d=64, K=32, in-program-repetition timing, benchmarks/topk_bench.py):

    B=256   M=200k   XLA  <0.5 ms   kernel 0.48 ms
    B=1024  M=200k   XLA   2.4 ms   kernel 5.25 ms
    B=256   M=1M     XLA   3.2 ms   kernel 4.51 ms

XLA's matmul+top_k runs at the HBM speed-of-light of its own score-buffer
traffic and wins at every shape that fits memory; the threshold-gated fold
below still pays ~a few full [B, T] scans per tile. Per the round-1 verdict
("kernel >= XLA or delete the flag"), the Config flag and Evaluator path were
removed; the kernel is kept as a validated O(B*K)-working-set alternative for
catalogs where the [B, M] score buffer cannot exist at all (M >> 10^7).
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
    # grid = (B tiles, item tiles); item tiles iterate innermost, so the
    # running-top-k scratch is (re)initialized at t==0 for every B tile
    t = pl.program_id(1)

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

    # Threshold-gated streaming fold: a while_loop that each iteration moves
    # ONE improving candidate per row (all rows in parallel) from the tile into
    # that row's current-min top-k slot, and exits as soon as NO row has a
    # remaining candidate above its kth. Cost is O(actual improvements), not
    # O(k) per tile — once the running top-k is warm, most tiles fold in zero
    # or a handful of iterations (the round-1 kernel burned k=32 full passes
    # over [B, K+T] on every tile, 50x the matmul cost). All ops stay 2-D
    # with keepdims (Mosaic vector-layout constraint).
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)

    def cond(carry):
        cand_v, bv, bi = carry
        return jnp.any(
            jnp.max(cand_v, axis=1, keepdims=True) > jnp.min(bv, axis=1, keepdims=True)
        )

    def body(carry):
        cand_v, bv, bi = carry
        v = jnp.max(cand_v, axis=1, keepdims=True)  # [B, 1] best remaining
        is_max = cand_v == v
        cmin = jnp.min(jnp.where(is_max, col_t, tile), axis=1, keepdims=True)
        sel = is_max & (col_t == cmin)  # one column per row
        i = jnp.sum(jnp.where(sel, tile_ids, 0), axis=1, keepdims=True)
        kth = jnp.min(bv, axis=1, keepdims=True)
        improving = v > kth  # [B, 1]
        # the row's min slot in best (first among ties)
        is_min = bv == kth
        kmin = jnp.min(jnp.where(is_min, col_k, k), axis=1, keepdims=True)
        slot = is_min & (col_k == kmin)
        bv = jnp.where(slot & improving, v, bv)
        bi = jnp.where(slot & improving, i, bi)
        cand_v = jnp.where(sel, NEG_INF, cand_v)  # consume (guarantees progress)
        return cand_v, bv, bi

    _, new_v, new_i = jax.lax.while_loop(cond, body, (scores, best_v[:], best_i[:]))
    best_v[:] = new_v
    best_i[:] = new_i

    @pl.when(t == num_tiles - 1)
    def _():
        # emit in descending-value order (lax.top_k contract downstream)
        bv, bi = best_v[:], best_i[:]
        out_v = jnp.zeros_like(bv)
        out_i = jnp.zeros_like(bi)

        def emit(j, carry):
            bv, out_v, out_i = carry
            v = jnp.max(bv, axis=1, keepdims=True)
            is_max = bv == v
            cmin = jnp.min(jnp.where(is_max, col_k, k), axis=1, keepdims=True)
            sel = is_max & (col_k == cmin)
            i = jnp.sum(jnp.where(sel, bi, 0), axis=1, keepdims=True)
            onej = col_k == j
            out_v = jnp.where(onej, v, out_v)
            out_i = jnp.where(onej, i, out_i)
            bv = jnp.where(sel, NEG_INF, bv)
            return bv, out_v, out_i

        _, out_v, out_i = jax.lax.fori_loop(0, k, emit, (bv, out_v, out_i))
        vals_ref[:] = out_v
        ids_ref[:] = out_i


@functools.partial(jax.jit, static_argnames=("k", "tile", "b_tile", "interpret"))
def streaming_topk(
    user_emb: jnp.ndarray,  # [B, d]
    item_emb: jnp.ndarray,  # [M, d]
    k: int,
    tile: int = 2048,
    b_tile: int = 256,
    interpret: bool = False,
):
    """Returns (values [B, k] f32, ids [B, k] i32) of the top-k inner products.
    M is padded to a tile multiple; padded columns are masked to -inf in-kernel.
    B is processed in ``b_tile`` row blocks (an un-tiled B=1024 overflows the
    16 MB VMEM scoped allocation: the [B, tile] f32 score tile alone is 8 MB).
    """
    b, d = user_emb.shape
    m = item_emb.shape[0]
    m_pad = -(-m // tile) * tile
    if m_pad != m:
        item_emb = jnp.concatenate(
            [item_emb, jnp.zeros((m_pad - m, d), item_emb.dtype)], axis=0
        )
    b_tile = min(b_tile, b)
    b_pad = -(-b // b_tile) * b_tile
    if b_pad != b:
        user_emb = jnp.concatenate(
            [user_emb, jnp.zeros((b_pad - b, d), user_emb.dtype)], axis=0
        )
    num_tiles = m_pad // tile
    kernel = functools.partial(_kernel, k=k, tile=tile, num_tiles=num_tiles, m=m)
    vals, ids = pl.pallas_call(
        kernel,
        grid=(b_pad // b_tile, num_tiles),
        in_specs=[
            pl.BlockSpec((b_tile, d), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda bi, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, k), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda bi, t: (bi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_tile, k), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(user_emb, item_emb)
    return vals[:b], ids[:b]
