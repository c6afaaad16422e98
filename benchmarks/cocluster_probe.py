"""2-D co-cluster (degree-sorted block) SpMM probe — round-2 verdict next #5.

Question: after the 1-D src-hub and dst-hub dense splits, can a 2-D block —
the (top-R residual destinations) x (top-C residual sources) submatrix as one
dense bf16 [R, C] MXU tile — profitably absorb residual tail edges?

Host-side capture analysis on the bench graph (2.9M edges, 70k nodes; tail
after both hub splits = 550k edges) with the PERF.md-validated cost model
(2.5 ns per gathered row, 810 GB/s sequential dense):

    every (R, C) in {2k..16k}^2 is NET-NEGATIVE: the best capture
    (R=C=16384: 30.2% of tail edges, 537 MB dense) saves ~415 us of gathers
    but costs ~950 us of dense-block traffic per apply. Small blocks capture
    ~0% — the hub splits already took all the Zipf mass and the residual is
    near-uniform (density ~1.2e-4 vs ~1e-3 break-even).

On THIS graph degree-sorted blocking is the optimal co-cluster (the synthetic
bench graph has popularity structure only — no communities by construction);
real datasets with community structure could concentrate more, which is why
this stays a probe, not a deleted idea.

Run on the chip for the measured-number record:
    python benchmarks/cocluster_probe.py
prints baseline (adopted hub+dsthub) and the two best block settings.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    PaddedAdjPair,
    build_padded_adj,
    padded_spmm,
)
from spmm_bench import timeit  # noqa: E402  (in-program repetition timing)


def log(**kw):
    print(json.dumps(kw), flush=True)


def extract_hubs(src, dst, w, nn, hub=1024, dsthub=1024):
    """Replicate build_padded_adj's two hub extractions; return the residual
    edges plus the dense pieces (host-side, probe only)."""
    freq = np.bincount(src, minlength=nn)
    h = (min(hub, nn) // 64) * 64
    hub_ids = np.argsort(freq)[::-1][:h].copy()
    is_hub = np.zeros(nn, bool)
    is_hub[hub_ids] = True
    hub_col = np.full(nn, -1, np.int64)
    hub_col[hub_ids] = np.arange(h)
    on = is_hub[src]
    hub_dense = np.zeros((nn, h), np.float32)
    np.add.at(hub_dense, (dst[on], hub_col[src[on]]), w[on])
    src, dst, w = src[~on], dst[~on], w[~on]

    ddeg = np.bincount(dst, minlength=nn)
    min_deg = max(nn // 500, 5)
    hh = (min(dsthub, int((ddeg >= min_deg).sum())) // 8) * 8
    dhub = np.argsort(ddeg)[::-1][:hh].copy()
    is_dhub = np.zeros(nn, bool)
    is_dhub[dhub] = True
    drow = np.full(nn, -1, np.int64)
    drow[dhub] = np.arange(hh)
    on = is_dhub[dst]
    dhub_dense = np.zeros((hh, nn), np.float32)
    np.add.at(dhub_dense, (drow[dst[on]], src[on]), w[on])
    src, dst, w = src[~on], dst[~on], w[~on]
    return (src, dst, w), (hub_ids, hub_dense), (dhub, dhub_dense)


def build_block_variant(src, dst, w, nn, R, C):
    """(adj-with-hubs, block) for one direction: hub splits, then the 2-D
    degree block over the residual, then the padded tail."""
    (ts, td, tw), (hub_ids, hub_dense), (dhub, dhub_dense) = extract_hubs(
        src, dst, w, nn
    )
    rdeg = np.bincount(td, minlength=nn)
    rfreq = np.bincount(ts, minlength=nn)
    top_d = np.argsort(rdeg)[::-1][:R].copy()
    top_s = np.argsort(rfreq)[::-1][:C].copy()
    in_d = np.zeros(nn, bool)
    in_d[top_d] = True
    in_s = np.zeros(nn, bool)
    in_s[top_s] = True
    drow = np.full(nn, -1, np.int64)
    drow[top_d] = np.arange(R)
    scol = np.full(nn, -1, np.int64)
    scol[top_s] = np.arange(C)
    on = in_d[td] & in_s[ts]
    blk = np.zeros((R, C), np.float32)
    np.add.at(blk, (drow[td[on]], scol[ts[on]]), tw[on])
    captured = int(on.sum())
    ts, td, tw = ts[~on], td[~on], tw[~on]
    adj = build_padded_adj(ts, td, tw, nn, hub_count=0, dst_hub_count=0)
    adj = dataclasses.replace(
        adj,
        hub_ids=jnp.asarray(hub_ids, jnp.int32),
        hub_weights=jnp.asarray(hub_dense, jnp.bfloat16),
        dst_hub_ids=jnp.asarray(dhub, jnp.int32),
        dst_hub_weights=jnp.asarray(dhub_dense, jnp.bfloat16),
    )
    block = (
        jnp.asarray(top_d, jnp.int32),
        jnp.asarray(top_s, jnp.int32),
        jnp.asarray(blk, jnp.bfloat16),
    )
    return adj, block, captured


def block_spmm(pair, blocks, x):
    """padded_spmm + the 2-D dense block, transpose-VJP like the adopted op."""
    blk_f, blk_b = blocks

    def one(adj, blk, v):
        from furusato_recommend_tpu.ops.padded_adj import _apply

        y = _apply(adj, v, jnp.bfloat16)
        d_ids, s_ids, W = blk
        upd = jnp.dot(
            W, v.astype(jnp.bfloat16)[s_ids], preferred_element_type=jnp.float32
        )
        return y.at[d_ids].add(upd).astype(v.dtype)

    @jax.custom_vjp
    def f(v):
        return one(pair.fwd, blk_f, v)

    def f_fwd(v):
        return one(pair.fwd, blk_f, v), None

    def f_bwd(_, g):
        return (one(pair.bwd, blk_b, g),)

    f.defvjp(f_fwd, f_bwd)
    return f(x)


def per_op(make_prog, make_arg, r1=2, r2=12, iters=3):
    f1, f2 = make_prog(r1), make_prog(r2)
    t1 = timeit(f1, make_arg, iters=iters)
    t2 = timeit(f2, make_arg, iters=iters)
    return (t2 - t1) / (r2 - r1)


def main():
    log(bench="start", backend=jax.default_backend())
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=29, seed=0)
    g = ds.graph
    src = np.asarray(g.norm_edges.src, np.int64)
    dst = np.asarray(g.norm_edges.dst, np.int64)
    w = np.asarray(g.norm_edges.weight, np.float32)
    nn = g.num_nodes
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((nn, 64)).astype(np.float32))

    # baseline: the adopted op
    adj = build_padded_adj(src, dst, w, nn, hub_count=1024, dst_hub_count=1024, num_src=nn)
    pair = PaddedAdjPair(fwd=adj, bwd=build_padded_adj(
        dst, src, w, nn, hub_count=1024, dst_hub_count=1024, num_src=nn))
    dt_f = per_op(
        lambda R: jax.jit(lambda p, x, i: lax.fori_loop(
            0, R, lambda _, y: padded_spmm(p, y), x + jnp.float32(i))),
        lambda i: (pair, x64, i),
    )

    def grad_prog(R):
        def run(p, x, i):
            gfn = jax.grad(lambda z: jnp.sum(padded_spmm(p, z) ** 2))
            return lax.fori_loop(0, R, lambda _, y: gfn(y), x + jnp.float32(i))

        return jax.jit(run)

    dt_b = per_op(grad_prog, lambda i: (pair, x64, i))
    log(bench="baseline_adopted", fwd_ms=round(dt_f * 1e3, 2), fwd_bwd_ms=round(dt_b * 1e3, 2))

    for R, C in ((8192, 8192), (16384, 16384)):
        t0 = time.time()
        adj_f, blk_f, cap_f = build_block_variant(src, dst, w, nn, R, C)
        adj_b, blk_b, cap_b = build_block_variant(dst, src, w, nn, R, C)
        bpair = PaddedAdjPair(fwd=adj_f, bwd=adj_b)
        blocks = (blk_f, blk_b)
        # parity vs the adopted op
        ref = jax.jit(lambda p, x: padded_spmm(p, x))(pair, x64)
        got = jax.jit(lambda p, b, x: block_spmm(p, b, x))(bpair, blocks, x64)
        ok = bool(jnp.max(jnp.abs(ref - got)) < 0.05 * float(jnp.max(jnp.abs(ref))))
        dt_f2 = per_op(
            lambda Rr: jax.jit(lambda p, b, x, i: lax.fori_loop(
                0, Rr, lambda _, y: block_spmm(p, b, y), x + jnp.float32(i))),
            lambda i: (bpair, blocks, x64, i),
        )

        def grad_prog2(Rr):
            def run(p, b, x, i):
                gfn = jax.grad(lambda z: jnp.sum(block_spmm(p, b, z) ** 2))
                return lax.fori_loop(0, Rr, lambda _, y: gfn(y), x + jnp.float32(i))

            return jax.jit(run)

        dt_b2 = per_op(grad_prog2, lambda i: (bpair, blocks, x64, i))
        log(
            bench="cocluster_block",
            R=R,
            C=C,
            captured_fwd=cap_f,
            captured_bwd=cap_b,
            dense_mb=round(2 * R * C * 2 / 1e6),
            build_s=round(time.time() - t0, 1),
            matches=ok,
            fwd_ms=round(dt_f2 * 1e3, 2),
            fwd_bwd_ms=round(dt_b2 * 1e3, 2),
        )


if __name__ == "__main__":
    main()
