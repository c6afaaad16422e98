"""Degree-bucketed padded adjacency (ELL-style) SpMM with a transpose-VJP.

Why: XLA lowers `segment_sum` to scatter-add, and the VJP of a gather is also a
scatter-add — so the naive COO SpMM pays the slow TPU scatter path twice.
Measured on a v5e chip (2.9M edges, 70k nodes, d=64; in-program-repetition
timing, see PERF.md "SpMM microbench"):

    segment_sum (sorted)   fwd 36.6 ms
    padded+TVJP (adopted)  fwd  4.6 ms   fwd+bwd 11.9 ms  (backward = transposed fwd)

Design: nodes are bucketed by degree into power-of-two caps; each bucket is a
dense [n_b, cap] neighbor/weight block, so the reduction is a dense masked sum
(VPU) instead of a scatter, and the only gather is x[neighbors]. Outputs are
computed in bucket order and un-permuted with one gather. The backward pass is
the same operation over the pre-built transposed adjacency (custom_vjp), so no
scatter appears anywhere in the differentiated program.

This replaces both cuSPARSE spmm (`/root/reference/model/MF.py:200-204`) and
torch-scatter mean-aggregation (`/root/reference/model/textsage.py:457-487`) —
a mean is just an SpMM with 1/deg(dst) edge weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PaddedAdj", "PaddedAdjPair", "build_padded_adj", "build_padded_pair", "padded_spmm"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedAdj:
    """Degree-bucketed padded adjacency over one destination set, with an
    optional hub-dense split: on Zipf graphs a few thousand hub *sources* carry
    most edges; their columns are stored as a dense [num_dst, H] bf16 matrix so
    that part of the SpMM is an MXU matmul (sequential HBM reads) instead of
    random gathers — only the tail edges go through the padded-gather path."""

    # per bucket: neighbors [n_b, cap] int32 (0-padded), weights [n_b, cap] f32
    # (0-padded, so pads contribute nothing)
    bucket_nbrs: Tuple[jnp.ndarray, ...]
    bucket_weights: Tuple[jnp.ndarray, ...]
    # [num_dst] int32: output position -> bucket-order row; None when the hub
    # splits absorbed every edge (empty tail -> the SpMM tail is just zeros)
    inv_perm: Optional[jnp.ndarray]
    num_dst: int = field(metadata=dict(static=True), default=0)
    hub_ids: Optional[jnp.ndarray] = None  # [H] int32 hub source ids
    hub_weights: Optional[jnp.ndarray] = None  # [num_dst, H] bf16 dense weights
    # transpose-hub (build_padded_pair(transpose_hub=True)): this adjacency is
    # the TRANSPOSE of one whose src-hub split produced dense D=[M, H]; the hub
    # edges' contribution here is y[hub_scatter_ids] += D^T @ x — one MXU
    # matmul + an H-row scatter instead of H high-degree gather rows.
    hub_in_weights: Optional[jnp.ndarray] = None  # D: [M, H] bf16 (M = len(x))
    hub_scatter_ids: Optional[jnp.ndarray] = None  # [H] int32 rows of y
    # dst-hub split: high-degree DESTINATIONS get their whole adjacency row as
    # a dense [H, num_src] bf16 block — one MXU matmul + an H-row scatter-add
    # replaces deg(dst) issue-rate-bound gather rows each. Break-even degree is
    # ~num_src/1000 on v5e (dense row = num_src*2B sequential ≈ num_src*2.5 ps
    # vs ~2.5 ns per gathered row), so Zipf head destinations are far past it.
    dst_hub_ids: Optional[jnp.ndarray] = None  # [H] int32 dst rows
    dst_hub_weights: Optional[jnp.ndarray] = None  # [H, num_src] bf16


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PaddedAdjPair:
    fwd: PaddedAdj
    bwd: PaddedAdj  # transposed adjacency, for the VJP


def build_padded_adj(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_dst: int,
    min_cap: int = 4,
    hub_count: int = 0,
    hub_mem_budget: int = 512 * 1024 * 1024,
    cap_growth: float = 1.26,
    dst_hub_count: int = 0,
    num_src: Optional[int] = None,
) -> PaddedAdj:
    """Host-side vectorized construction (numpy). Edges need not be sorted.

    hub_count > 0 splits the hub_count most frequent *sources* into a dense
    [num_dst, H] bf16 block (MXU path); shrunk/disabled if it would exceed
    hub_mem_budget bytes.

    dst_hub_count > 0 additionally splits up to that many highest-degree
    *destinations* (degree counted after src-hub removal, and only those past
    ~2x the dense/gather break-even degree num_src/500) into a dense
    [H, num_src] bf16 block applied as one MXU matmul. Requires num_src.
    Each dense block is independently capped at hub_mem_budget bytes."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)

    hub_ids_arr = hub_w_arr = None
    if hub_count > 0:
        max_h = max(int(hub_mem_budget // max(num_dst * 2, 1)), 0)
        # 64-align the budget bound DOWN so the lane-alignment padding below
        # can never push the dense block past hub_mem_budget; zero-column
        # padding then only occurs when h is vocabulary/hub_count-limited
        max_h = (max_h // 64) * 64
        freq = np.bincount(src) if len(src) else np.zeros(1, np.int64)
        h = min(hub_count, max_h, len(freq))
        if h >= 64:
            # lane-align the hub axis by PADDING with zero columns, not by
            # truncating: rounding h DOWN spills the remainder sources onto the
            # issue-rate-bound gather tail (measured: 52 spilled words cost the
            # flagship text fwd ~3 ms/step — PERF.md "text-hub padding")
            h_pad = ((h + 63) // 64) * 64
            hub_ids = np.argsort(freq)[::-1][:h].copy()
            is_hub = np.zeros(freq.shape[0], dtype=bool)
            is_hub[hub_ids] = True
            hub_col = np.full(freq.shape[0], -1, dtype=np.int64)
            hub_col[hub_ids] = np.arange(h)
            on_hub = is_hub[src]
            dense = np.zeros((num_dst, h_pad), dtype=np.float32)
            np.add.at(dense, (dst[on_hub], hub_col[src[on_hub]]), weight[on_hub])
            # dummy id 0 for pad columns: their dense weights are zero, so the
            # extra x[0] gathers contribute nothing
            hub_ids_arr = jnp.asarray(
                np.concatenate([hub_ids, np.zeros(h_pad - h, np.int64)]), jnp.int32
            )
            hub_w_arr = jnp.asarray(dense, jnp.bfloat16)
            src, dst, weight = src[~on_hub], dst[~on_hub], weight[~on_hub]
    dst_hub_ids_arr = dst_hub_w_arr = None
    if dst_hub_count > 0 and len(src):
        if num_src is None:
            raise ValueError("dst_hub_count > 0 requires num_src")
        max_h = max(int(hub_mem_budget // max(num_src * 2, 1)), 0)
        ddeg = np.bincount(dst, minlength=num_dst)
        min_deg = max(num_src // 500, min_cap + 1)  # 2x dense/gather break-even
        h = min(dst_hub_count, max_h, int((ddeg >= min_deg).sum()))
        h = (h // 8) * 8  # sublane-align the hub axis
        if h >= 8:
            dhub = np.argsort(ddeg)[::-1][:h].copy()
            is_dhub = np.zeros(num_dst, dtype=bool)
            is_dhub[dhub] = True
            dhub_row = np.full(num_dst, -1, dtype=np.int64)
            dhub_row[dhub] = np.arange(h)
            on_dhub = is_dhub[dst]
            dense = np.zeros((h, num_src), dtype=np.float32)
            np.add.at(dense, (dhub_row[dst[on_dhub]], src[on_dhub]), weight[on_dhub])
            dst_hub_ids_arr = jnp.asarray(dhub, jnp.int32)
            dst_hub_w_arr = jnp.asarray(dense, jnp.bfloat16)
            src, dst, weight = src[~on_dhub], dst[~on_dhub], weight[~on_dhub]
    order = np.argsort(dst, kind="stable")
    src_s, w_s = src[order], weight[order]
    deg = np.bincount(dst, minlength=num_dst)
    start = np.zeros(num_dst + 1, dtype=np.int64)
    np.cumsum(deg, out=start[1:])

    # cap ladder: growth < 2 trades more buckets for less padding — the gather
    # is issue-rate bound (PERF.md), so every padded slot costs like a real one
    caps = [min_cap]
    while caps[-1] < max(int(deg.max(initial=1)), 1):
        caps.append(max(int(np.ceil(caps[-1] * cap_growth)), caps[-1] + 1))

    # Zero-degree destinations (nothing left after the hub splits — e.g. most
    # text bags once frequent words went dense, or dst-hub rows) do NOT get
    # bucket rows: a min_cap row costs min_cap issue-rate-bound gathers each
    # (measured 9.5 ms for the all-entity text-bag stage, ~4x its cost model,
    # benchmarks/tables_probe.py). They all un-permute from one shared zero row.
    nbrs, weights, node_order = [], [], []
    lo = 0
    for cap in caps:
        nodes = np.where((deg > lo) & (deg <= cap))[0]
        lo = cap
        if len(nodes) == 0:
            continue
        pos = start[nodes][:, None] + np.arange(cap)[None, :]
        mask = np.arange(cap)[None, :] < deg[nodes][:, None]
        pos_c = np.clip(pos, 0, max(len(src_s) - 1, 0))
        if len(src_s) == 0:  # all edges went to the hub-dense block
            continue  # (deg is then all-zero; nothing reaches here)
        nbrs.append(np.where(mask, src_s[pos_c], 0).astype(np.int32))
        weights.append(np.where(mask, w_s[pos_c], 0.0).astype(np.float32))
        node_order.append(nodes)
    node_order = np.concatenate(node_order) if node_order else np.empty(0, np.int64)
    if len(node_order) == 0:
        # every edge went dense: no tail at all — _apply emits zeros instead of
        # un-permuting num_dst rows out of a 1-row zero bucket (that inv_perm
        # gather alone would cost ~2.5 ns x num_dst)
        return PaddedAdj(
            bucket_nbrs=(),
            bucket_weights=(),
            inv_perm=None,
            num_dst=int(num_dst),
            hub_ids=hub_ids_arr,
            hub_weights=hub_w_arr,
            dst_hub_ids=dst_hub_ids_arr,
            dst_hub_weights=dst_hub_w_arr,
        )
    n_zero = num_dst - len(node_order)
    if n_zero > 0:
        # one [1, cap0] all-zero bucket row that every zero-degree dst reads
        nbrs.append(np.zeros((1, caps[0]), np.int32))
        weights.append(np.zeros((1, caps[0]), np.float32))
    inv = np.full(num_dst, len(node_order), np.int64)  # default: the zero row
    inv[node_order] = np.arange(len(node_order))
    return PaddedAdj(
        bucket_nbrs=tuple(jnp.asarray(a) for a in nbrs),
        bucket_weights=tuple(jnp.asarray(a) for a in weights),
        inv_perm=jnp.asarray(inv, jnp.int32),
        num_dst=int(num_dst),
        hub_ids=hub_ids_arr,
        hub_weights=hub_w_arr,
        dst_hub_ids=dst_hub_ids_arr,
        dst_hub_weights=dst_hub_w_arr,
    )


def build_padded_pair(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    num_dst: int,
    num_src: int,
    hub_count: int = 0,
    transpose_hub: bool = False,
    hub_mem_budget: int = 512 * 1024 * 1024,
    dst_hub_count: int = 0,
    min_cap: int = 4,
) -> PaddedAdjPair:
    """transpose_hub=False: fwd and bwd each pick their own src-hub split
    (right for the bipartite interaction graph, where both directions have
    Zipf sources). transpose_hub=True: ONE split of the fwd sources is shared —
    fwd uses the dense block D=[num_dst, H] as usual, and bwd applies D^T as a
    matmul. Right when only the fwd sources are hubby (the text-bag word→bag
    adjacency: words are Zipf, bags have degree ≤ text width), which otherwise
    leaves the transpose — the per-step word-table gradient — fully on the
    issue-rate-bound gather path (PERF.md "TextSAGE step breakdown")."""
    if not transpose_hub:
        return PaddedAdjPair(
            fwd=build_padded_adj(
                src, dst, weight, num_dst, hub_count=hub_count,
                dst_hub_count=dst_hub_count, num_src=num_src, min_cap=min_cap,
            ),
            bwd=build_padded_adj(
                dst, src, weight, num_src, hub_count=hub_count,
                dst_hub_count=dst_hub_count, num_src=num_dst, min_cap=min_cap,
            ),
        )
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float32)
    hub_ids_arr = hub_w_arr = None
    if hub_count > 0 and len(src):
        max_h = max(int(hub_mem_budget // max(num_dst * 2, 1)), 0)
        max_h = (max_h // 64) * 64  # see build_padded_adj: keep padding in-budget
        freq = np.bincount(src, minlength=num_src)
        h = min(hub_count, max_h, num_src)
        if h >= 64:
            # pad-align (see build_padded_adj): truncating to a multiple of 64
            # spills sources onto the gather tail in BOTH directions here
            h_pad = ((h + 63) // 64) * 64
            hub_ids = np.argsort(freq)[::-1][:h].copy()
            is_hub = np.zeros(num_src, dtype=bool)
            is_hub[hub_ids] = True
            hub_col = np.full(num_src, -1, dtype=np.int64)
            hub_col[hub_ids] = np.arange(h)
            on_hub = is_hub[src]
            dense = np.zeros((num_dst, h_pad), dtype=np.float32)
            np.add.at(dense, (dst[on_hub], hub_col[src[on_hub]]), weight[on_hub])
            hub_ids_arr = jnp.asarray(
                np.concatenate([hub_ids, np.zeros(h_pad - h, np.int64)]), jnp.int32
            )
            hub_w_arr = jnp.asarray(dense, jnp.bfloat16)
            src, dst, weight = src[~on_hub], dst[~on_hub], weight[~on_hub]
    from dataclasses import replace

    fwd = build_padded_adj(src, dst, weight, num_dst, hub_count=0, min_cap=min_cap)
    bwd = build_padded_adj(dst, src, weight, num_src, hub_count=0, min_cap=min_cap)
    if hub_w_arr is not None:
        fwd = replace(fwd, hub_ids=hub_ids_arr, hub_weights=hub_w_arr)
        bwd = replace(bwd, hub_in_weights=hub_w_arr, hub_scatter_ids=hub_ids_arr)
    return PaddedAdjPair(fwd=fwd, bwd=bwd)


def _apply(adj: PaddedAdj, x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """y[v] = sum_u w(u->v) x[u], bucketed dense reductions. f32 accumulation.

    The per-bucket reduction is an explicit VPU multiply + axis-sum, NOT an
    einsum: XLA lowers "nc,ncd->nd" to a batched matmul whose contraction dim
    is the bucket cap (4-32) — pathological MXU tiles, measured 28% slower at
    the PERF.md shape. The bucket gather itself is random-access issue-rate
    bound (~2.5 ns/row on v5e regardless of row width or dtype — f32 vs bf16
    and d=64 vs d=128 time identically), which is why the builder's cap ladder
    grows by 1.26x (less padding = fewer issued rows) and why a padded slot
    costs nearly as much as a real edge."""
    xc = x.astype(compute_dtype)
    if not adj.bucket_nbrs:
        # empty tail (hub splits absorbed every edge)
        y = jnp.zeros((adj.num_dst, x.shape[-1]), jnp.float32)
    else:
        outs = []
        for nbr, w in zip(adj.bucket_nbrs, adj.bucket_weights):
            xg = xc[nbr]  # [n_b, cap, d] gather — the issue-rate-bound op
            wb = w.astype(compute_dtype)[..., None]
            outs.append(jnp.sum((xg * wb).astype(jnp.float32), axis=1))
        y = jnp.concatenate(outs, axis=0)[adj.inv_perm]
    if adj.hub_weights is not None:
        xh = xc[adj.hub_ids].astype(jnp.bfloat16)  # [H, d] — small gather
        y = y + jnp.dot(adj.hub_weights, xh, preferred_element_type=jnp.float32)
    if adj.hub_in_weights is not None:
        # transpose-hub: D^T @ x on the MXU, then an H-row scatter
        upd = jnp.einsum(
            "mh,md->hd",
            adj.hub_in_weights,
            xc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        y = y.at[adj.hub_scatter_ids].add(upd)
    if adj.dst_hub_weights is not None:
        # dst-hub: whole rows of hot destinations ride the MXU
        upd = jnp.dot(
            adj.dst_hub_weights,
            xc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        y = y.at[adj.dst_hub_ids].add(upd)
    return y.astype(x.dtype)


def padded_spmm(
    pair: PaddedAdjPair, x: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """SpMM with transpose-VJP: grad_x = A^T g runs as a padded forward too."""

    @jax.custom_vjp
    def f(x):
        return _apply(pair.fwd, x, compute_dtype)

    def f_fwd(x):
        return _apply(pair.fwd, x, compute_dtype), None

    def f_bwd(_, g):
        return (_apply(pair.bwd, g, compute_dtype),)

    f.defvjp(f_fwd, f_bwd)
    return f(x)
