"""Layer-level mechanism oracles for the distinctive model-zoo mechanisms
(round-4 verdict #3): fixed-weight / fixed-input torch implementations of the
reference's math, asserted NUMERICALLY EQUAL to our conv plugins — replacing
finite-only coverage for the mechanisms a transposed attention matrix or
mis-normalized softmax would silently corrupt.

Covered:
- TransformerConv 8-head dot-product attention, root_weight and cat-combine
  variants (`/root/reference/model/tgrec.py:161-171`,
  `/root/reference/model/tgrec2.py:286-287`) — full-graph segment attention
  AND the sampled fanout-block path.
- TimeEncode Bochner temporal messages (`/root/reference/model/tgsrec.py:47-76`).
- Recency scatter_max gating (`/root/reference/model/sasgnn.py:348-380`).
- Relational combine modes add/sum/prod (`/root/reference/model/rsage.py:361-378`).
- SASRec pre-norm causal block vs torch's own multi_head_attention_forward
  (`/root/reference/model/sasrec.py:385-397`).

The torch code here is written from the reference's semantics with explicit
per-destination loops (or torch's own built-in MHA), NOT from our jnp code, so
agreement validates the mechanism, not the transcription.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.models.sage_convs import (  # noqa: E402
    N_HEADS,
    get_conv,
)

D = 16  # latent dim; 8 heads x head_dim 2


@pytest.fixture(scope="module")
def oracle_graph():
    ds = synthetic_dataset(n_users=30, m_items=40, avg_degree=6, seed=5)
    return ds.graph


@pytest.fixture(scope="module")
def oracle_xs():
    rng = np.random.default_rng(0)
    xu = rng.standard_normal((30, D)).astype(np.float32)
    xi = rng.standard_normal((40, D)).astype(np.float32)
    return xu, xi


def _csr_np(csr):
    return np.asarray(csr.indptr), np.asarray(csr.indices)


def _edges_user_order(graph):
    """[(u, i)] in user-CSR edge order."""
    ptr, idx = _csr_np(graph.prop_user_pos)
    return [(u, int(idx[k])) for u in range(len(ptr) - 1) for k in range(ptr[u], ptr[u + 1])]


def _mean_aggr(graph, side, other_x):
    """Plain numpy neighbor mean (what the model passes as `aggr`)."""
    csr = graph.prop_user_pos if side == "user" else graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    n = len(ptr) - 1
    out = np.zeros((n, other_x.shape[1]), np.float32)
    for v in range(n):
        nb = idx[ptr[v] : ptr[v + 1]]
        if len(nb):
            out[v] = other_x[nb].mean(0)
    return out


def _np(lp):
    return {k: np.asarray(v) for k, v in lp.items()}


# ---------------------------------------------------------------------------
# TransformerConv (tgrec / tgrec2)
# ---------------------------------------------------------------------------


def _torch_mh_out(lpn, x_dst_row, nbrs):
    """Multi-head dot-product attention for ONE destination over its neighbor
    set (the TransformerConv message pass: softmax over incoming edges per
    head, scaled by sqrt(head_dim))."""
    dh = D // N_HEADS
    q = (torch.from_numpy(x_dst_row) @ torch.from_numpy(lpn["wq"])).reshape(N_HEADS, dh)
    k = (torch.from_numpy(nbrs) @ torch.from_numpy(lpn["wk"])).reshape(-1, N_HEADS, dh)
    v = (torch.from_numpy(nbrs) @ torch.from_numpy(lpn["wv"])).reshape(-1, N_HEADS, dh)
    if len(nbrs) == 0:
        return torch.zeros(D)
    e = torch.einsum("hd,fhd->fh", q, k) / np.sqrt(dh)
    alpha = torch.softmax(e, dim=0)  # over neighbors, per head
    return torch.einsum("fh,fhd->hd", alpha, v).reshape(D)


@pytest.mark.parametrize("variant", ["transformer", "transformer_cat"])
@pytest.mark.parametrize("side", ["user", "item"])
def test_transformer_full_graph_matches_torch(oracle_graph, oracle_xs, variant, side):
    conv = get_conv(variant)
    lp = conv.init(jax.random.PRNGKey(3), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": None, "edge_label": None, "rel_emb": None}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nbrs = other[idx[ptr[v] : ptr[v + 1]]]
        out = _torch_mh_out(lpn, x_self[v], nbrs)
        if variant == "transformer_cat":
            row = torch.cat([out, torch.from_numpy(x_self[v])])
            want[v] = (row @ torch.from_numpy(lpn["w_out"]) + torch.from_numpy(lpn["b_out"])).numpy()
        else:
            want[v] = (out + torch.from_numpy(x_self[v]) @ torch.from_numpy(lpn["w_skip"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


def test_transformer_sampled_matches_torch():
    conv = get_conv("transformer")
    lp = conv.init(jax.random.PRNGKey(7), D, 1.0)
    lpn = _np(lp)
    rng = np.random.default_rng(1)
    B, F = 9, 5
    target = rng.standard_normal((B, D)).astype(np.float32)
    nbrs = rng.standard_normal((B, F, D)).astype(np.float32)
    ours = np.asarray(
        conv.sampled(lp, jnp.asarray(target), jnp.mean(jnp.asarray(nbrs), axis=-2),
                     {"neighbors": jnp.asarray(nbrs)})
    )
    want = np.stack([
        (_torch_mh_out(lpn, target[b], nbrs[b])
         + torch.from_numpy(target[b]) @ torch.from_numpy(lpn["w_skip"])).numpy()
        for b in range(B)
    ])
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# TimeEncode (tgsrec)
# ---------------------------------------------------------------------------


def test_time_encode_matches_reference_formula():
    """cos(t * basis_freq + phase) with basis 1/10^linspace(0,9,dt) — the
    reference TimeEncode init and forward (tgsrec.py:47-76)."""
    from furusato_recommend_tpu.models.sage_convs import _time_encode

    conv = get_conv("temporal")
    lp = conv.init(jax.random.PRNGKey(0), D, 1.0)
    np.testing.assert_allclose(
        np.asarray(lp["time_freq"]), 1.0 / 10 ** np.linspace(0, 9, D), rtol=1e-6
    )
    ts = np.array([[0.0, 0.5, 2.0], [1.0, 3.0, 7.0]], np.float32)
    ours = np.asarray(_time_encode(lp, jnp.asarray(ts)))
    basis = torch.from_numpy(np.asarray(lp["time_freq"]))
    phase = torch.from_numpy(np.asarray(lp["time_phase"]))
    want = torch.cos(torch.from_numpy(ts)[..., None] * basis + phase).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("side", ["user", "item"])
def test_temporal_full_graph_matches_torch(oracle_graph, oracle_xs, side):
    conv = get_conv("temporal")
    lp = conv.init(jax.random.PRNGKey(11), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    rng = np.random.default_rng(2)
    edges = _edges_user_order(oracle_graph)
    et = rng.random(len(edges)).astype(np.float32)
    t_of = {edges[k]: et[k] for k in range(len(edges))}
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": jnp.asarray(et), "edge_label": None,
           "rel_emb": None}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    dh = D // N_HEADS
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nb = idx[ptr[v] : ptr[v + 1]]
        skip = torch.from_numpy(x_self[v]) @ torch.from_numpy(lpn["w_skip"])
        if len(nb) == 0:
            want[v] = skip.numpy()
            continue
        # per-edge timestamp looked up by the (u, i) pair — independently of
        # our prop_item_edge_perm plumbing, which this therefore validates
        pairs = [(v, int(j)) if side == "user" else (int(j), v) for j in nb]
        t = torch.tensor([t_of[p] for p in pairs])
        te = torch.cos(
            t[:, None] * torch.from_numpy(lpn["time_freq"])
            + torch.from_numpy(lpn["time_phase"])
        )
        kv_in = torch.cat([torch.from_numpy(other[nb]), te], dim=1)
        q = (torch.from_numpy(x_self[v]) @ torch.from_numpy(lpn["wq"])).reshape(N_HEADS, dh)
        k = (kv_in @ torch.from_numpy(lpn["wk"])).reshape(-1, N_HEADS, dh)
        vv = (kv_in @ torch.from_numpy(lpn["wv"])).reshape(-1, N_HEADS, dh)
        e = torch.einsum("hd,fhd->fh", q, k) / np.sqrt(dh)
        alpha = torch.softmax(e, dim=0)
        out = torch.einsum("fh,fhd->hd", alpha, vv).reshape(D)
        want[v] = (out + skip).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Recency gating (sasgnn)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("side", ["user", "item"])
def test_recency_full_graph_matches_torch(oracle_graph, oracle_xs, side):
    conv = get_conv("recency")
    lp = conv.init(jax.random.PRNGKey(13), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    edges = _edges_user_order(oracle_graph)
    # DISTINCT timestamps: the reference scatter_max picks one argmax edge;
    # ties would be implementation-defined
    et = (np.random.default_rng(3).permutation(len(edges)) + 1).astype(np.float32)
    t_of = {edges[k]: et[k] for k in range(len(edges))}
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": jnp.asarray(et), "edge_label": None,
           "rel_emb": None}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nb = idx[ptr[v] : ptr[v + 1]]
        a = torch.from_numpy(aggr[v])
        if side == "user" and len(nb):
            pairs = [(v, int(j)) for j in nb]
            t = np.array([t_of[p] for p in pairs])
            recent = torch.from_numpy(other[nb[int(np.argmax(t))]])
            out = a + a * recent  # sasgnn.py:375-376 user gating
        else:
            out = a
        row = torch.cat([torch.from_numpy(x_self[v]), out])
        want[v] = (row @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Relational combine modes (rsage)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["add", "sum", "prod"])
@pytest.mark.parametrize("side", ["user", "item"])
def test_relational_full_graph_matches_torch(oracle_graph, oracle_xs, mode, side):
    conv = get_conv(f"relational_{mode}")
    lp = conv.init(jax.random.PRNGKey(17), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    rng = np.random.default_rng(4)
    edges = _edges_user_order(oracle_graph)
    R = 3
    labels = rng.integers(0, R, len(edges)).astype(np.int32)
    lab_of = {edges[k]: int(labels[k]) for k in range(len(edges))}
    rel_emb = rng.standard_normal((R, D)).astype(np.float32)
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": None, "edge_label": jnp.asarray(labels),
           "rel_emb": jnp.asarray(rel_emb)}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nb = idx[ptr[v] : ptr[v + 1]]
        if len(nb):
            pairs = [(v, int(j)) if side == "user" else (int(j), v) for j in nb]
            rel = torch.from_numpy(rel_emb[[lab_of[p] for p in pairs]])
            src = torch.from_numpy(other[nb])
            if mode == "sum":  # reference 'sum' branch CONCATenates (rsage.py:365-366)
                msg = torch.cat([src, rel], dim=1)
            elif mode == "prod":
                msg = src * rel
            else:
                msg = src + rel
            m_aggr = msg.mean(0)
        else:
            width = 2 * D if mode == "sum" else D
            m_aggr = torch.zeros(width)
        row = torch.cat([torch.from_numpy(x_self[v]), m_aggr])
        want[v] = (row @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Edge-feature convs, SAMPLED (fanout-tree training) paths: the edge_pos ->
# user-order edge-feature lookup (and, on the item side, the
# prop_item_edge_perm indirection) feeding attention/gating/combine math.
# ---------------------------------------------------------------------------


def _sampled_edge_fixture(oracle_graph, side, seed):
    """Random [B, F] neighbor blocks + edge positions valid for `side`'s CSR,
    plus the independently-derived per-slot edge feature index (u, i) pairs."""
    rng = np.random.default_rng(seed)
    B, F = 7, 4
    edges_user = _edges_user_order(oracle_graph)
    E = len(edges_user)
    target = rng.standard_normal((B, D)).astype(np.float32)
    nbrs = rng.standard_normal((B, F, D)).astype(np.float32)
    pos = rng.integers(0, E, (B, F)).astype(np.int32)
    if side == "user":
        pairs = [[edges_user[p] for p in row] for row in pos]
    else:
        # item-CSR edge order: enumerate (u, i) by item row
        ptr, idx = _csr_np(oracle_graph.prop_item_pos)
        edges_item = [
            (int(idx[k]), i) for i in range(len(ptr) - 1) for k in range(ptr[i], ptr[i + 1])
        ]
        pairs = [[edges_item[p] for p in row] for row in pos]
    return target, nbrs, pos, pairs


@pytest.mark.parametrize("side", ["user", "item"])
def test_temporal_sampled_matches_torch(oracle_graph, side):
    conv = get_conv("temporal")
    lp = conv.init(jax.random.PRNGKey(37), D, 1.0)
    lpn = _np(lp)
    rng = np.random.default_rng(8)
    edges = _edges_user_order(oracle_graph)
    et = rng.random(len(edges)).astype(np.float32)
    t_of = {edges[k]: et[k] for k in range(len(edges))}
    target, nbrs, pos, pairs = _sampled_edge_fixture(oracle_graph, side, 9)
    ctx = {"graph": oracle_graph, "edge_time": jnp.asarray(et), "edge_label": None,
           "rel_emb": None, "neighbors": jnp.asarray(nbrs),
           "edge_pos": jnp.asarray(pos), "side": side}
    ours = np.asarray(
        conv.sampled(lp, jnp.asarray(target), jnp.mean(jnp.asarray(nbrs), -2), ctx)
    )
    dh = D // N_HEADS
    want = np.zeros_like(ours)
    for b in range(len(target)):
        t = torch.tensor([t_of[p] for p in pairs[b]])
        te = torch.cos(
            t[:, None] * torch.from_numpy(lpn["time_freq"])
            + torch.from_numpy(lpn["time_phase"])
        )
        kv = torch.cat([torch.from_numpy(nbrs[b]), te], dim=1)
        q = (torch.from_numpy(target[b]) @ torch.from_numpy(lpn["wq"])).reshape(N_HEADS, dh)
        k = (kv @ torch.from_numpy(lpn["wk"])).reshape(-1, N_HEADS, dh)
        v = (kv @ torch.from_numpy(lpn["wv"])).reshape(-1, N_HEADS, dh)
        e = torch.einsum("hd,fhd->fh", q, k) / np.sqrt(dh)
        out = torch.einsum("fh,fhd->hd", torch.softmax(e, dim=0), v).reshape(D)
        want[b] = (out + torch.from_numpy(target[b]) @ torch.from_numpy(lpn["w_skip"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("side", ["user", "item"])
def test_recency_sampled_matches_torch(oracle_graph, side):
    conv = get_conv("recency")
    lp = conv.init(jax.random.PRNGKey(41), D, 1.0)
    lpn = _np(lp)
    edges = _edges_user_order(oracle_graph)
    et = (np.random.default_rng(10).permutation(len(edges)) + 1).astype(np.float32)
    t_of = {edges[k]: et[k] for k in range(len(edges))}
    target, nbrs, pos, pairs = _sampled_edge_fixture(oracle_graph, side, 11)
    aggr = nbrs.mean(1)
    ctx = {"graph": oracle_graph, "edge_time": jnp.asarray(et), "edge_label": None,
           "rel_emb": None, "neighbors": jnp.asarray(nbrs),
           "edge_pos": jnp.asarray(pos), "side": side}
    ours = np.asarray(conv.sampled(lp, jnp.asarray(target), jnp.asarray(aggr), ctx))
    want = np.zeros_like(ours)
    for b in range(len(target)):
        a = torch.from_numpy(aggr[b])
        if side == "user":
            t = np.array([t_of[p] for p in pairs[b]])
            recent = torch.from_numpy(nbrs[b][int(np.argmax(t))])
            out = a + a * recent
        else:
            out = a
        row = torch.cat([torch.from_numpy(target[b]), out])
        want[b] = (row @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["add", "sum", "prod"])
def test_relational_sampled_matches_torch(oracle_graph, mode):
    conv = get_conv(f"relational_{mode}")
    lp = conv.init(jax.random.PRNGKey(43), D, 1.0)
    lpn = _np(lp)
    rng = np.random.default_rng(12)
    edges = _edges_user_order(oracle_graph)
    R = 3
    labels = rng.integers(0, R, len(edges)).astype(np.int32)
    lab_of = {edges[k]: int(labels[k]) for k in range(len(edges))}
    rel_emb = rng.standard_normal((R, D)).astype(np.float32)
    target, nbrs, pos, pairs = _sampled_edge_fixture(oracle_graph, "user", 13)
    ctx = {"graph": oracle_graph, "edge_time": None,
           "edge_label": jnp.asarray(labels), "rel_emb": jnp.asarray(rel_emb),
           "neighbors": jnp.asarray(nbrs), "edge_pos": jnp.asarray(pos),
           "side": "user"}
    ours = np.asarray(
        conv.sampled(lp, jnp.asarray(target), jnp.mean(jnp.asarray(nbrs), -2), ctx)
    )
    want = np.zeros_like(ours)
    for b in range(len(target)):
        rel = torch.from_numpy(rel_emb[[lab_of[p] for p in pairs[b]]])
        src = torch.from_numpy(nbrs[b])
        if mode == "sum":
            msg = torch.cat([src, rel], dim=1)
        elif mode == "prod":
            msg = src * rel
        else:
            msg = src + rel
        row = torch.cat([torch.from_numpy(target[b]), msg.mean(0)])
        want[b] = (row @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Remaining conv full-graph paths: gat (additive attention), pinsage
# (relu-transformed mean + L2-normed head handled by the model), ggnn (GRU),
# gcn (self+neighbor mix) — completing oracle coverage of the conv menu
# (`/root/reference/model/gnn.py:185-232`, pinsage.py:342-365).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("side", ["user", "item"])
def test_gat_full_graph_matches_torch(oracle_graph, oracle_xs, side):
    conv = get_conv("gat")
    lp = conv.init(jax.random.PRNGKey(19), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": None, "edge_label": None, "rel_emb": None}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    w, a_s, a_d = (torch.from_numpy(lpn[k]) for k in ("w", "a_src", "a_dst"))
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nb = idx[ptr[v] : ptr[v + 1]]
        sp = torch.from_numpy(x_self[v]) @ w
        if len(nb):
            npj = torch.from_numpy(other[nb]) @ w  # [F, D]
            e = torch.nn.functional.leaky_relu(
                (npj @ a_s)[:, 0] + (sp @ a_d)[0], 0.2
            )
            alpha = torch.softmax(e, dim=0)
            out = (alpha[:, None] * npj).sum(0)
        else:
            out = torch.zeros(D)
        want[v] = (out + sp + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("side", ["user", "item"])
def test_pinsage_full_graph_matches_torch(oracle_graph, oracle_xs, side):
    conv = get_conv("pinsage")
    lp = conv.init(jax.random.PRNGKey(23), D, 1.0)
    lpn = _np(lp)
    xu, xi = oracle_xs
    x_self, other = (xu, xi) if side == "user" else (xi, xu)
    aggr = _mean_aggr(oracle_graph, side, other)
    ctx = {"graph": oracle_graph, "edge_time": None, "edge_label": None, "rel_emb": None}
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(x_self), jnp.asarray(aggr), jnp.asarray(other), side, ctx)
    )
    csr = oracle_graph.prop_user_pos if side == "user" else oracle_graph.prop_item_pos
    ptr, idx = _csr_np(csr)
    want = np.zeros_like(ours)
    for v in range(len(ptr) - 1):
        nb = idx[ptr[v] : ptr[v + 1]]
        if len(nb):
            q = (torch.from_numpy(other[nb]) @ torch.from_numpy(lpn["q_w"])
                 + torch.from_numpy(lpn["q_b"])).relu()
            m = q.mean(0)
        else:
            m = torch.zeros(D)
        row = torch.cat([torch.from_numpy(x_self[v]), m])
        want[v] = (row @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


def test_ggnn_and_gcn_full_graph_match_torch(oracle_graph, oracle_xs):
    xu, xi = oracle_xs
    aggr = _mean_aggr(oracle_graph, "user", xi)
    ctx = {"graph": oracle_graph, "edge_time": None, "edge_label": None, "rel_emb": None}
    # ggnn: GRU-gated update of the target by the aggregated message
    conv = get_conv("ggnn")
    lp = conv.init(jax.random.PRNGKey(29), D, 1.0)
    lpn = _np(lp)
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(xu), jnp.asarray(aggr), jnp.asarray(xi), "user", ctx)
    )
    x, m = torch.from_numpy(xu), torch.from_numpy(aggr)
    t = lambda k: torch.from_numpy(lpn[k])  # noqa: E731
    z = torch.sigmoid(m @ t("wz") + x @ t("uz"))
    r = torch.sigmoid(m @ t("wr") + x @ t("ur"))
    h = torch.tanh(m @ t("wh") + (r * x) @ t("uh"))
    want = ((1 - z) * x + z * h).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)
    # gcn full-graph: 0.5 (aggr + self) @ w + b
    conv = get_conv("gcn")
    lp = conv.init(jax.random.PRNGKey(31), D, 1.0)
    lpn = _np(lp)
    ours = np.asarray(
        conv.full_graph(lp, jnp.asarray(xu), jnp.asarray(aggr), jnp.asarray(xi), "user", ctx)
    )
    want = (0.5 * (m + x) @ torch.from_numpy(lpn["w"]) + torch.from_numpy(lpn["b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# SASRec pre-norm causal block vs torch's built-in MHA
# ---------------------------------------------------------------------------


def test_sasrec_block_matches_torch_mha():
    """Our causal block (eval mode) vs torch.nn.functional.multi_head_attention_forward
    with the same (bias-free) projections: validates head split, causal mask,
    softmax axis, scaling, residual/relu/FFN order (sasrec.py:385-397)."""
    from furusato_recommend_tpu.config import Config
    from furusato_recommend_tpu.data.features import synthetic_features
    from furusato_recommend_tpu.data.sequence import build_sequences
    from furusato_recommend_tpu.models.registry import build_model

    ds = synthetic_dataset(n_users=40, m_items=60, avg_degree=6, seed=9)
    cfg = Config(model="sasrec", latent_dim=D, bpr_batch_size=64, topks=(5,),
                 user_feature="nwt", item_feature="nwt", eval_user_batch=32)
    fs = synthetic_features(ds, cfg, seed=1)
    seqs = build_sequences(ds)
    m = build_model("sasrec", cfg, ds.graph, features=fs, sequences=seqs)
    params = m.init(jax.random.PRNGKey(0))
    bp = params["blocks"][0]

    rng = np.random.default_rng(6)
    B, T = 5, 12
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    causal = jnp.tril(jnp.ones((T, T), bool))
    ours = np.asarray(m._block(bp, jnp.asarray(x), causal, jax.random.PRNGKey(1), False))

    bn = _np(bp)
    xt = torch.from_numpy(x)
    xn = torch.nn.functional.layer_norm(
        xt, (D,), torch.from_numpy(bn["ln1_scale"]), torch.from_numpy(bn["ln1_bias"]), 1e-5
    )
    attn_mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
    q = xn.transpose(0, 1)  # [T, B, D]
    out, _ = torch.nn.functional.multi_head_attention_forward(
        q, q, q, D, N_HEADS,
        None, torch.zeros(3 * D), None, None, False, 0.0,
        torch.from_numpy(bn["wo"]).T, torch.zeros(D),
        training=False, need_weights=False, attn_mask=attn_mask,
        use_separate_proj_weight=True,
        q_proj_weight=torch.from_numpy(bn["wq"]).T,
        k_proj_weight=torch.from_numpy(bn["wk"]).T,
        v_proj_weight=torch.from_numpy(bn["wv"]).T,
    )
    h = (xt + out.transpose(0, 1)).relu()
    hn = torch.nn.functional.layer_norm(
        h, (D,), torch.from_numpy(bn["ln2_scale"]), torch.from_numpy(bn["ln2_bias"]), 1e-5
    )
    want = (h + hn @ torch.from_numpy(bn["ffn_w"]) + torch.from_numpy(bn["ffn_b"])).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)
