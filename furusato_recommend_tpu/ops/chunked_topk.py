"""Sequential chunked top-k over a huge last axis.

``lax.top_k`` over a [B, M] score tile lowers to a full sort whose temps run
~6x the input block: at the 10x-scale flagship shape (B=1024, M=300k) that
crashed the 16G v5e worker (PERF.md "10x-scale validation"; the crash run is
recorded in scale500k.jsonl). Splitting M into segments and running the
per-segment top-k SEQUENTIALLY (``lax.map``) bounds the sort temps at one
[B, chunk] block, with a final [B, S*k] merge — turning the documented
"eval_user_batch <= 256 at M=300k" limitation into a non-issue.

Tie order matches ``lax.top_k`` exactly (value desc, index asc): segment s
contributes only indices in [s*chunk, (s+1)*chunk), so the merge's
position-order tiebreak reproduces the global index-order tiebreak.

No reference analogue — torch.topk on GPU has no comparable memory cliff at
the reference's catalog sizes (`/root/reference/trainer.py:83-113` calls it
on [B, M] directly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["chunked_top_k", "CHUNKED_TOPK_MIN_M"]

#: engage the chunked path at-or-above this catalog size (single-device eval);
#: below it plain lax.top_k is faster and its temps are harmless
CHUNKED_TOPK_MIN_M = 1 << 17  # 131072


def chunked_top_k(scores: jnp.ndarray, k: int, chunk: int = 32768):
    """(values [B, k], indices [B, k]) of the top-k per row of [B, M]."""
    B, M = scores.shape
    if M <= chunk:
        return jax.lax.top_k(scores, k)
    S = -(-M // chunk)
    pad = S * chunk - M
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    segs = jnp.moveaxis(scores.reshape(B, S, chunk), 1, 0)  # [S, B, chunk]
    kk = min(k, chunk)
    v, i = jax.lax.map(lambda s: jax.lax.top_k(s, kk), segs)  # [S, B, kk]
    i = i + (jnp.arange(S, dtype=i.dtype) * chunk)[:, None, None]
    v = jnp.moveaxis(v, 0, 1).reshape(B, S * kk)
    i = jnp.moveaxis(i, 0, 1).reshape(B, S * kk)
    vt, j = jax.lax.top_k(v, k)
    return vt, jnp.take_along_axis(i, j, axis=1)
