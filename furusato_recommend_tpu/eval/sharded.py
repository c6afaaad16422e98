"""Item-sharded full-catalog scoring with distributed top-K merge.

SURVEY.md §7.3 names this a hard part: at M ~ 10^5-10^6 items the reference's
single-device "[B, M] scores, mask to -2^10, topk" (`/root/reference/trainer.py:124-143`)
neither fits nor parallelizes. Here the catalog is row-sharded over the mesh
``model`` axis; under shard_map each shard

1. scores its local item block on the MXU ([B, d] x [d, M/S]),
2. masks the train positives that fall inside its block (each user's padded
   positive list is replicated; a positive is local iff it lands in the shard's
   id range),
3. takes a local lax.top_k(k),
4. all-gathers the S local candidate sets ([S, B, k]) over the model axis and
   re-top-ks the [B, S*k] union — the classic distributed top-K merge; exact,
   because the global top-k is a subset of the per-shard top-ks.

The user batch is additionally sharded over the ``data`` axis (each data shard
ranks its own user rows; the merge collective rides the model axis only), so an
eval tile uses every chip of a (data, model) mesh. This is the production eval
path the `Evaluator` routes through whenever a mesh is active.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["sharded_masked_topk"]

MASK_SENTINEL = -(1 << 10)


def sharded_masked_topk(
    user_emb: jnp.ndarray,  # [B, d]
    item_emb: jnp.ndarray,  # [M, d] (row-sharded over the model axis)
    pos_ids: jnp.ndarray,  # [B, P] padded train positives per user
    pos_mask: jnp.ndarray,  # [B, P] bool
    k: int,
    mesh,
    sigmoid: bool = False,
    m_valid: int | None = None,
):
    """Returns (values [B, k], ids [B, k]) of the masked global top-k.

    Catalogs whose size is not divisible by the model-axis extent are padded
    with sentinel-scored rows; ``m_valid`` (default: item_emb rows) marks where
    real items end. The user batch must be divisible by the data-axis extent.
    """
    shards = mesh.shape[MODEL_AXIS]
    data_shards = mesh.shape[DATA_AXIS]
    m = item_emb.shape[0]
    if m_valid is None:
        m_valid = m
    if m % shards:
        pad = shards - m % shards
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
        m = m + pad
    m_local = m // shards
    if user_emb.shape[0] % data_shards:
        raise ValueError(
            f"user batch {user_emb.shape[0]} not divisible by data axis {data_shards}"
        )

    def body(u, items_local, pos_ids, pos_mask):
        shard = jax.lax.axis_index(MODEL_AXIS)
        lo = shard * m_local
        s = jnp.dot(u, items_local.T, preferred_element_type=jnp.float32)  # [B, Ml]
        if sigmoid:
            s = jax.nn.sigmoid(s)
        # sentinel out the catalog padding (rows beyond m_valid)
        gid = lo + jnp.arange(m_local, dtype=jnp.int32)
        s = jnp.where(gid[None, :] < m_valid, s, MASK_SENTINEL)
        # mask local train positives
        local = pos_ids - lo
        in_range = (local >= 0) & (local < m_local) & pos_mask
        cols = jnp.where(in_range, local, m_local)
        s = s.at[jnp.arange(u.shape[0])[:, None], cols].set(MASK_SENTINEL, mode="drop")
        v, i = jax.lax.top_k(s, k)  # local candidates
        gi = i + lo
        # distributed merge: union of per-shard top-ks, re-top-k
        vg = jax.lax.all_gather(v, MODEL_AXIS)  # [S, B, k]
        ig = jax.lax.all_gather(gi, MODEL_AXIS)
        b = u.shape[0]
        v_all = jnp.transpose(vg, (1, 0, 2)).reshape(b, -1)  # [B, S*k]
        i_all = jnp.transpose(ig, (1, 0, 2)).reshape(b, -1)
        mv, mi = jax.lax.top_k(v_all, k)
        return mv, jnp.take_along_axis(i_all, mi, axis=1)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(MODEL_AXIS, None), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        # outputs are replicated over `model` by construction (identical
        # post-all_gather merge on every shard); the static VMA checker can't
        # see that
        check_vma=False,
    )(user_emb, item_emb, pos_ids, pos_mask)
