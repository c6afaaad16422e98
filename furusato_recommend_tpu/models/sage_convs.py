"""Conv plugins for the SAGE family.

Each conv is a pair of pure functions over one layer's params:

- ``sampled(lp, target, aggr, ctx)`` — training path over fanout-sampled
  neighbor sets; ``ctx["neighbors"]`` holds the raw [..., F, d] neighbor block
  for convs that need more than the mean (attention, recency, relational).
- ``full_graph(lp, x_self, aggr, other_x, side, ctx)`` — exact full-graph
  inference path.

Reference conv menu (`--conv`, `/root/reference/model/gnn.py:185-232`, plus the
per-model variants): gcn, sage, gat, transformer, ggnn; TextSAGE's own
W[cat(self, aggr)] combine (`/root/reference/model/textsage.py:378-383`);
FastSAGE's SAGEConv (`/root/reference/model/fastsage.py:215-217`); LightSAGE's
parameterless target+aggr (`/root/reference/model/lightsage.py:274-290`);
PinSAGE's q-transform (`/root/reference/model/pinsage.py:342-356`); TGRec(2)'s
TransformerConv (`/root/reference/model/tgrec.py:161-171`,
`/root/reference/model/tgrec2.py:286-287`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

N_HEADS = 8  # TransformerConv heads (/root/reference/model/tgrec.py:161-171)


def _xavier(key, shape, gain=1.0):
    fan_in, fan_out = shape[0], shape[-1]
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


@dataclass(frozen=True)
class Conv:
    init: Callable  # (key, dim, gain, features=...) -> layer params dict
    sampled: Callable  # (lp, target, aggr, ctx) -> new target
    full_graph: Callable  # (lp, x_self, aggr, other_x, side, ctx) -> new x


# ---- textsage: W [cat(self, aggr)] ----
def _cat_init(key, dim, gain, **_):
    k1, _ = jax.random.split(key)
    return {"w": _xavier(k1, (2 * dim, dim), gain), "b": jnp.zeros((dim,))}


def _cat_sampled(lp, target, aggr, ctx):
    return jnp.concatenate([target, aggr], axis=-1) @ lp["w"] + lp["b"]


def _cat_full(lp, x_self, aggr, other_x, side, ctx):
    return jnp.concatenate([x_self, aggr], axis=-1) @ lp["w"] + lp["b"]


# ---- fastsage: separate self/neighbor weights (SAGEConv) ----
def _w2_init(key, dim, gain, **_):
    k1, k2 = jax.random.split(key)
    return {
        "w_self": _xavier(k1, (dim, dim), gain),
        "w_nbr": _xavier(k2, (dim, dim), gain),
        "b": jnp.zeros((dim,)),
    }


def _w2_sampled(lp, target, aggr, ctx):
    return target @ lp["w_self"] + aggr @ lp["w_nbr"] + lp["b"]


def _w2_full(lp, x_self, aggr, other_x, side, ctx):
    return x_self @ lp["w_self"] + aggr @ lp["w_nbr"] + lp["b"]


# ---- lightsage: parameterless target + aggr ----
def _light_init(key, dim, gain, **_):
    return {}


def _light_sampled(lp, target, aggr, ctx):
    return target + aggr


def _light_full(lp, x_self, aggr, other_x, side, ctx):
    return x_self + aggr


# ---- pinsage: transform sources before aggregation ----
def _pin_init(key, dim, gain, **_):
    k1, k2 = jax.random.split(key)
    return {
        "q_w": _xavier(k1, (dim, dim), gain),
        "q_b": jnp.zeros((dim,)),
        "w": _xavier(k2, (2 * dim, dim), gain),
        "b": jnp.zeros((dim,)),
    }


def _pin_sampled(lp, target, aggr, ctx):
    # aggregate relu(q(source)) — recompute mean from raw neighbors
    nbrs = ctx["neighbors"]
    q = jax.nn.relu(nbrs @ lp["q_w"] + lp["q_b"])
    aggr_q = jnp.mean(q, axis=-2)
    return jnp.concatenate([target, aggr_q], axis=-1) @ lp["w"] + lp["b"]


def _pin_full(lp, x_self, aggr, other_x, side, ctx):
    # exact: mean over neighbors of relu(q(x)); by linearity of mean we can't
    # push relu(q(.)) through the precomputed mean, so recompute via segment ops
    from ..ops.csr_search import csr_row_ids
    from ..ops.segment import segment_mean

    graph = ctx["graph"]
    q_other = jax.nn.relu(other_x @ lp["q_w"] + lp["q_b"])
    if side == "user":
        rows = csr_row_ids(graph.prop_user_pos)
        aggr_q = segment_mean(q_other[graph.prop_user_pos.indices], rows, graph.n_users)
    else:
        rows = csr_row_ids(graph.prop_item_pos)
        aggr_q = segment_mean(q_other[graph.prop_item_pos.indices], rows, graph.m_items)
    return jnp.concatenate([x_self, aggr_q], axis=-1) @ lp["w"] + lp["b"]


# ---- gcn: mean over neighbors+self, then linear ----
def _gcn_init(key, dim, gain, **_):
    return {"w": _xavier(key, (dim, dim), gain), "b": jnp.zeros((dim,))}


def _gcn_sampled(lp, target, aggr, ctx):
    F = ctx["neighbors"].shape[-2]
    mixed = (aggr * F + target) / (F + 1)
    return mixed @ lp["w"] + lp["b"]


def _gcn_full(lp, x_self, aggr, other_x, side, ctx):
    mixed = 0.5 * (aggr + x_self)
    return mixed @ lp["w"] + lp["b"]


# ---- gat: single-head additive attention over sampled neighbors ----
def _gat_init(key, dim, gain, **_):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": _xavier(k1, (dim, dim), gain),
        "a_src": _xavier(k2, (dim, 1), gain),
        "a_dst": _xavier(k3, (dim, 1), gain),
        "b": jnp.zeros((dim,)),
    }


def _gat_sampled(lp, target, aggr, ctx):
    nbrs = ctx["neighbors"] @ lp["w"]  # [..., F, d]
    tgt = target @ lp["w"]  # [..., d]
    e = jax.nn.leaky_relu(
        (nbrs @ lp["a_src"])[..., 0] + (tgt @ lp["a_dst"])[..., 0][..., None], 0.2
    )  # [..., F]
    alpha = jax.nn.softmax(e, axis=-1)
    out = jnp.sum(alpha[..., None] * nbrs, axis=-2)
    return out + tgt + lp["b"]


def _gat_full(lp, x_self, aggr, other_x, side, ctx):
    from ..ops.segment import segment_softmax_aggregate

    graph = ctx["graph"]
    csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
    nbr_proj = other_x @ lp["w"]
    self_proj = x_self @ lp["w"]
    num = x_self.shape[0]
    scores_src = (nbr_proj @ lp["a_src"])[..., 0]
    scores_dst = (self_proj @ lp["a_dst"])[..., 0]
    out = segment_softmax_aggregate(
        csr, scores_src, scores_dst, nbr_proj, num, activation="leaky_relu"
    )
    return out + self_proj + lp["b"]


# ---- transformer (tgrec): multi-head dot-product attention, root_weight ----
def _tf_init_factory(root_weight: bool, cat_combine: bool):
    def init(key, dim, gain, **_):
        ks = jax.random.split(key, 5)
        p = {
            "wq": _xavier(ks[0], (dim, dim), gain),
            "wk": _xavier(ks[1], (dim, dim), gain),
            "wv": _xavier(ks[2], (dim, dim), gain),
        }
        if root_weight:
            p["w_skip"] = _xavier(ks[3], (dim, dim), gain)
        if cat_combine:
            p["w_out"] = _xavier(ks[4], (2 * dim, dim), gain)
            p["b_out"] = jnp.zeros((dim,))
        return p

    return init


def _mh_attention(lp, target, nbrs):
    d = target.shape[-1]
    dh = d // N_HEADS
    q = (target @ lp["wq"]).reshape(target.shape[:-1] + (N_HEADS, dh))
    k = (nbrs @ lp["wk"]).reshape(nbrs.shape[:-1] + (N_HEADS, dh))
    v = (nbrs @ lp["wv"]).reshape(nbrs.shape[:-1] + (N_HEADS, dh))
    # scores over F neighbors per head
    e = jnp.einsum("...hd,...fhd->...fh", q, k) / jnp.sqrt(dh)
    alpha = jax.nn.softmax(e, axis=-2)
    out = jnp.einsum("...fh,...fhd->...hd", alpha, v)
    return out.reshape(target.shape)


def _tf_sampled_factory(root_weight: bool, cat_combine: bool):
    def sampled(lp, target, aggr, ctx):
        out = _mh_attention(lp, target, ctx["neighbors"])
        if cat_combine:
            # tgrec2: W[cat(aggr, x)] (/root/reference/model/tgrec2.py:286-287)
            return jnp.concatenate([out, target], axis=-1) @ lp["w_out"] + lp["b_out"]
        if root_weight:
            return out + target @ lp["w_skip"]
        return out

    return sampled


def _tf_full_factory(root_weight: bool, cat_combine: bool):
    def full(lp, x_self, aggr, other_x, side, ctx):
        from ..ops.segment import segment_mh_attention

        graph = ctx["graph"]
        csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
        out = segment_mh_attention(lp, x_self, other_x, csr, N_HEADS)
        if cat_combine:
            return jnp.concatenate([out, x_self], axis=-1) @ lp["w_out"] + lp["b_out"]
        if root_weight:
            return out + x_self @ lp["w_skip"]
        return out

    return full


# ---- ggnn: GRU-gated update ----
def _ggnn_init(key, dim, gain, **_):
    ks = jax.random.split(key, 6)
    return {
        "wz": _xavier(ks[0], (dim, dim), gain),
        "uz": _xavier(ks[1], (dim, dim), gain),
        "wr": _xavier(ks[2], (dim, dim), gain),
        "ur": _xavier(ks[3], (dim, dim), gain),
        "wh": _xavier(ks[4], (dim, dim), gain),
        "uh": _xavier(ks[5], (dim, dim), gain),
    }


def _ggnn_update(lp, x, m):
    z = jax.nn.sigmoid(m @ lp["wz"] + x @ lp["uz"])
    r = jax.nn.sigmoid(m @ lp["wr"] + x @ lp["ur"])
    h = jnp.tanh(m @ lp["wh"] + (r * x) @ lp["uh"])
    return (1 - z) * x + z * h


def _ggnn_sampled(lp, target, aggr, ctx):
    return _ggnn_update(lp, target, aggr)


def _ggnn_full(lp, x_self, aggr, other_x, side, ctx):
    return _ggnn_update(lp, x_self, aggr)


_CONVS: Dict[str, Conv] = {
    "sage_cat": Conv(_cat_init, _cat_sampled, _cat_full),
    "sage_w2": Conv(_w2_init, _w2_sampled, _w2_full),
    "light": Conv(_light_init, _light_sampled, _light_full),
    "pinsage": Conv(_pin_init, _pin_sampled, _pin_full),
    "gcn": Conv(_gcn_init, _gcn_sampled, _gcn_full),
    "gat": Conv(_gat_init, _gat_sampled, _gat_full),
    "transformer": Conv(
        _tf_init_factory(True, False),
        _tf_sampled_factory(True, False),
        _tf_full_factory(True, False),
    ),
    "transformer_cat": Conv(
        _tf_init_factory(False, True),
        _tf_sampled_factory(False, True),
        _tf_full_factory(False, True),
    ),
    "ggnn": Conv(_ggnn_init, _ggnn_sampled, _ggnn_full),
}


def get_conv(name: str) -> Conv:
    # reference --conv {sage, mean} map onto the textsage combine
    aliases = {"sage": "sage_cat", "mean": "sage_cat"}
    name = aliases.get(name, name)
    if name not in _CONVS:
        raise KeyError(f"unknown conv {name!r}; available: {sorted(_CONVS)}")
    return _CONVS[name]


# ---------------------------------------------------------------------------
# Edge-feature convs: relational (rsage), temporal (tgsrec), recency (sasgnn).
# Edge features (timestamps, relation labels) are stored in the MESSAGE
# user-CSR edge order (prop_user_pos — equals user_pos unless extra relation
# edge sets exist); item-side lookups go through graph.prop_item_edge_perm.
# ---------------------------------------------------------------------------


def _edge_feat(ctx, feat_user_order):
    pos = ctx["edge_pos"]
    if ctx["side"] == "user":
        return feat_user_order[pos]
    return feat_user_order[ctx["graph"].prop_item_edge_perm[pos]]


def _edge_feat_full(graph, side, feat_user_order):
    if side == "user":
        return feat_user_order
    return feat_user_order[graph.prop_item_edge_perm]


# ---- relational (RSAGE): relation embeddings mixed into source messages
# (`/root/reference/model/rsage.py:361-378`). multi_relational: 'sum' branch
# CONCATenates source with the relation embedding (reference naming kept),
# 'prod' multiplies, 'add' adds. Per-layer relation transform is applied by the
# model (rel_emb chain) and arrives via ctx['rel_emb'].
def _rel_init_factory(mode):
    def init(key, dim, gain, **_):
        k1, k2 = jax.random.split(key)
        src_dim = 2 * dim if mode == "sum" else dim
        return {
            "w": _xavier(k1, (dim + src_dim, dim), gain),
            "b": jnp.zeros((dim,)),
            "rel_w": _xavier(k2, (dim, dim), gain),
            "rel_b": jnp.zeros((dim,)),
        }

    return init


def _rel_combine(mode, src, rel):
    if mode == "sum":  # concat (reference's 'sum' branch, rsage.py:365-366)
        return jnp.concatenate([src, rel], axis=-1)
    if mode == "prod":
        return src * rel
    return src + rel  # 'add'


def _rel_sampled_factory(mode):
    def sampled(lp, target, aggr, ctx):
        nbrs = ctx["neighbors"]
        labels = _edge_feat(ctx, ctx["edge_label"])  # [..., F]
        rel = ctx["rel_emb"][labels]
        msg = _rel_combine(mode, nbrs, rel)
        m_aggr = jnp.mean(msg, axis=-2)
        return jnp.concatenate([target, m_aggr], axis=-1) @ lp["w"] + lp["b"]

    return sampled


def _rel_full_factory(mode):
    def full(lp, x_self, aggr, other_x, side, ctx):
        from ..ops.csr_search import csr_row_ids
        from ..ops.segment import segment_mean

        graph = ctx["graph"]
        csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
        labels = _edge_feat_full(graph, side, ctx["edge_label"])
        rel = ctx["rel_emb"][labels]
        msg = _rel_combine(mode, other_x[csr.indices], rel)
        rows = csr_row_ids(csr)
        m_aggr = segment_mean(msg, rows, x_self.shape[0])
        return jnp.concatenate([x_self, m_aggr], axis=-1) @ lp["w"] + lp["b"]

    return full


# ---- temporal (TGSRec): Bochner TimeEncode cos(t*omega + phi)
# (`/root/reference/model/tgsrec.py:47-76`) concatenated into attention keys /
# values of a TransformerConv.
def _time_encode(lp, t):
    return jnp.cos(t[..., None] * lp["time_freq"] + lp["time_phase"])


def _temporal_init(key, dim, gain, **_):
    import numpy as np

    ks = jax.random.split(key, 4)
    dt = dim
    return {
        "time_freq": jnp.asarray(1.0 / 10 ** np.linspace(0, 9, dt), jnp.float32),
        "time_phase": jnp.zeros((dt,)),
        "wq": _xavier(ks[0], (dim, dim), gain),
        "wk": _xavier(ks[1], (dim + dt, dim), gain),
        "wv": _xavier(ks[2], (dim + dt, dim), gain),
        "w_skip": _xavier(ks[3], (dim, dim), gain),
    }


def _temporal_sampled(lp, target, aggr, ctx):
    nbrs = ctx["neighbors"]
    t = _edge_feat(ctx, ctx["edge_time"])  # [..., F]
    te = _time_encode(lp, t)  # [..., F, dt]
    kv_in = jnp.concatenate([nbrs, te], axis=-1)
    d = target.shape[-1]
    dh = d // N_HEADS
    q = (target @ lp["wq"]).reshape(target.shape[:-1] + (N_HEADS, dh))
    k = (kv_in @ lp["wk"]).reshape(nbrs.shape[:-1] + (N_HEADS, dh))
    v = (kv_in @ lp["wv"]).reshape(nbrs.shape[:-1] + (N_HEADS, dh))
    e = jnp.einsum("...hd,...fhd->...fh", q, k) / jnp.sqrt(dh)
    alpha = jax.nn.softmax(e, axis=-2)
    out = jnp.einsum("...fh,...fhd->...hd", alpha, v).reshape(target.shape)
    return out + target @ lp["w_skip"]


def _temporal_full(lp, x_self, aggr, other_x, side, ctx):
    from ..ops.csr_search import csr_row_ids
    from ..ops.segment import segment_sum

    graph = ctx["graph"]
    csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
    t = _edge_feat_full(graph, side, ctx["edge_time"])
    te = _time_encode(lp, t)  # [E, dt]
    num_dst = x_self.shape[0]
    d = x_self.shape[-1]
    dh = d // N_HEADS
    rows = csr_row_ids(csr)
    kv_in = jnp.concatenate([other_x[csr.indices], te], axis=-1)
    q = (x_self @ lp["wq"]).reshape(num_dst, N_HEADS, dh)
    k = (kv_in @ lp["wk"]).reshape(-1, N_HEADS, dh)
    v = (kv_in @ lp["wv"]).reshape(-1, N_HEADS, dh)
    e = jnp.sum(q[rows] * k, axis=-1) / jnp.sqrt(dh)
    e_max = jax.ops.segment_max(e, rows, num_segments=num_dst, indices_are_sorted=True)
    e_max = jnp.where(jnp.isfinite(e_max), e_max, 0.0)
    w = jnp.exp(e - e_max[rows])
    denom = segment_sum(w, rows, num_dst)
    alpha = w / jnp.maximum(denom[rows], 1e-12)
    out = segment_sum(v * alpha[..., None], rows, num_dst).reshape(num_dst, d)
    return out + x_self @ lp["w_skip"]


# ---- recency (SASGNN): scatter_max over edge timestamps selects each target's
# most recent neighbor; USER targets get aggr + aggr * recent_x
# (`/root/reference/model/sasgnn.py:348-380`).
def _recency_init(key, dim, gain, **_):
    return {"w": _xavier(key, (2 * dim, dim), gain), "b": jnp.zeros((dim,))}


def _recency_sampled(lp, target, aggr, ctx):
    nbrs = ctx["neighbors"]
    t = _edge_feat(ctx, ctx["edge_time"])  # [..., F]
    idx = jnp.argmax(t, axis=-1)  # most recent sampled neighbor
    recent = jnp.take_along_axis(nbrs, idx[..., None, None], axis=-2)[..., 0, :]
    if ctx["side"] == "user":
        out = aggr + aggr * recent
    else:
        out = aggr
    return jnp.concatenate([target, out], axis=-1) @ lp["w"] + lp["b"]


def _recency_full(lp, x_self, aggr, other_x, side, ctx):
    from ..ops.csr_search import csr_row_ids
    from ..ops.segment import segment_sum

    graph = ctx["graph"]
    csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
    num_dst = x_self.shape[0]
    rows = csr_row_ids(csr)
    if side == "user":
        t = _edge_feat_full(graph, side, ctx["edge_time"])
        tmax = jax.ops.segment_max(t, rows, num_segments=num_dst, indices_are_sorted=True)
        tmax = jnp.where(jnp.isfinite(tmax), tmax, 0.0)
        sel = (t >= tmax[rows]).astype(x_self.dtype)
        cnt = segment_sum(sel, rows, num_dst)
        recent = segment_sum(other_x[csr.indices] * sel[:, None], rows, num_dst)
        recent = recent / jnp.maximum(cnt, 1.0)[:, None]
        out = aggr + aggr * recent
    else:
        out = aggr
    return jnp.concatenate([x_self, out], axis=-1) @ lp["w"] + lp["b"]


for _mode in ("add", "sum", "prod"):
    _CONVS[f"relational_{_mode}"] = Conv(
        _rel_init_factory(_mode), _rel_sampled_factory(_mode), _rel_full_factory(_mode)
    )
_CONVS["temporal"] = Conv(_temporal_init, _temporal_sampled, _temporal_full)
_CONVS["recency"] = Conv(_recency_init, _recency_sampled, _recency_full)
