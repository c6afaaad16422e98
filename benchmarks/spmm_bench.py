"""SpMM perf investigation on the real TPU chip (round-2, VERDICT weak #2).

Measures, on the PERF.md graph shape (50k users / 20k items / ~1.45M
interactions -> 2.9M directed joint-space edges, d=64):

1. raw gather throughput x[idx] as a function of row width and dtype —
   distinguishes issue-rate-bound from bandwidth-bound gathers,
2. padded_spmm fwd / fwd+bwd across hub_count settings,
3. (as added) candidate kernel variants.

Dev script: prints one JSON dict per measurement line; NOT the driver bench.
Run from the repo root on the tunneled chip:  python benchmarks/spmm_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402
from furusato_recommend_tpu.ops.padded_adj import (  # noqa: E402
    build_padded_adj,
    PaddedAdjPair,
    padded_spmm,
)


# ---------------------------------------------------------------------------
# Timing over the axon tunnel. CRITICAL: block_until_ready() does NOT wait on
# the tunneled chip, and each host fetch costs a ~25 ms RPC round-trip.
# Correct recipe: enqueue `iters` executions with VARYING inputs (identical
# (executable, args) pairs can be served from cache), then force one tiny
# fetch (executes after the whole queue drains) and subtract the RPC baseline.
# ---------------------------------------------------------------------------

_RPC_BASELINE = None


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def rpc_baseline():
    global _RPC_BASELINE
    if _RPC_BASELINE is None:
        x = jnp.zeros((8,))
        _sync(x)
        _sync(x + 1.0)  # warm: the first x+1.0 pays its own compile (~0.3 s),
        # which inflated the baseline ~2x when this ran cold (serve_bench r4)
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(x + 1.0)
        _RPC_BASELINE = (time.perf_counter() - t0) / 5
    return _RPC_BASELINE


def timeit(fn, make_arg, iters=20):
    """fn(*make_arg(i)) timed as (queue-drain wall time - RPC baseline)/iters.
    make_arg must vary at least one input with i."""
    base = rpc_baseline()
    out = fn(*make_arg(0))
    _sync(out)  # warmup/compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_arg(1 + i))
    _sync(out)
    dt = time.perf_counter() - t0
    return max(dt - base, 1e-9) / iters


def log(**kw):
    print(json.dumps(kw), flush=True)


def gather_bench(n_rows, n_idx, rng):
    """Materialized gather y = x[idx] (write cost included — XLA collapses any
    linear reduction of a gather into a histogram contraction, so reductions
    measure nothing). A same-shape streaming copy isolates the write side."""
    idx = jnp.asarray(rng.integers(0, n_rows, n_idx).astype(np.int32))
    for d in (64, 128):
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32"), (jnp.int8, "int8")):
            x = jnp.asarray(rng.standard_normal((n_rows, d)), dtype=jnp.float32).astype(dtype)
            big = jnp.zeros((n_idx, d), dtype)

            if jnp.issubdtype(dtype, jnp.floating):
                copy = jax.jit(lambda b, i: b + jnp.asarray(i, dtype))
                gat = jax.jit(lambda x, i, j: x[i] + jnp.asarray(j, dtype))
            else:
                copy = jax.jit(lambda b, i: b + jnp.asarray(i, jnp.int8))
                gat = jax.jit(lambda x, i, j: x[i] + jnp.asarray(j, jnp.int8))
            dt_copy = timeit(lambda b, i: copy(b, i), lambda i: (big, i), iters=10)
            dt = timeit(lambda x, i, j: gat(x, i, j), lambda j: (x, idx, j), iters=10)
            bytes_row = n_idx * d * x.dtype.itemsize
            log(
                bench="gather",
                d=d,
                dtype=name,
                gather_ms=round(dt * 1e3, 3),
                copy_ms=round(dt_copy * 1e3, 3),
                ns_per_row=round(dt / n_idx * 1e9, 3),
                eff_gbps_rw=round(2 * bytes_row / dt / 1e9, 2),
            )


def spmm_bench(ds):
    # The adjacency MUST flow as a jit argument: a closed-over dense hub block
    # is baked into the executable as a constant, and at hub>=4096 the
    # remote-compile payload exceeds the tunnel's HTTP body limit (413).
    g = ds.graph
    src = np.asarray(g.norm_edges.src)
    dst = np.asarray(g.norm_edges.dst)
    w = np.asarray(g.norm_edges.weight)
    nn = g.num_nodes
    E = len(src)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((nn, 64)).astype(np.float32))

    # Sub-ms ops drown in the ~25 ms RPC-baseline noise at iters=10, so repeat
    # the op INSIDE one program (sequential dependent applies, like an L-layer
    # propagate) and difference two repetition counts: per-op = (t(R2)-t(R1))/(R2-R1).
    import jax.lax as lax

    def per_op(make_prog, make_arg=None, r1=2, r2=12, iters=3):
        ma = make_arg or (lambda i: (pair, x64, i))
        f1, f2 = make_prog(r1), make_prog(r2)
        t1 = timeit(f1, ma, iters=iters)
        t2 = timeit(f2, ma, iters=iters)
        return (t2 - t1) / (r2 - r1)

    # --- variant shoot-out: how should one bucketed reduction be computed? ---
    # Suspect: einsum "nc,ncd->nd" lowers to a batched matmul with cap (4-32)
    # as the contraction dim — pathological MXU tiles. Compare VPU reductions
    # and (re-measured with sound timing) scatter-based segment_sum.
    src_j = jnp.asarray(src.astype(np.int32))
    dst_j = jnp.asarray(dst.astype(np.int32))
    w_j = jnp.asarray(w.astype(np.float32))

    def apply_einsum(adjp, x):
        xc = x.astype(jnp.bfloat16)
        outs = [
            jnp.einsum("nc,ncd->nd", wb.astype(jnp.bfloat16), xc[nbr],
                       preferred_element_type=jnp.float32)
            for nbr, wb in zip(adjp.bucket_nbrs, adjp.bucket_weights)
        ]
        y = jnp.concatenate(outs, 0)[adjp.inv_perm]
        if adjp.hub_weights is not None:
            y = y + jnp.dot(adjp.hub_weights, xc[adjp.hub_ids],
                            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    def apply_mulsum(adjp, x):
        xc = x.astype(jnp.bfloat16)
        outs = [
            jnp.sum((xc[nbr] * wb.astype(jnp.bfloat16)[..., None]).astype(jnp.float32), 1)
            for nbr, wb in zip(adjp.bucket_nbrs, adjp.bucket_weights)
        ]
        y = jnp.concatenate(outs, 0)[adjp.inv_perm]
        if adjp.hub_weights is not None:
            y = y + jnp.dot(adjp.hub_weights, xc[adjp.hub_ids],
                            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    def apply_flat(adjp, x):
        xc = x.astype(jnp.bfloat16)
        outs = []
        for nbr, wb in zip(adjp.bucket_nbrs, adjp.bucket_weights):
            n_b, cap = nbr.shape
            xg = xc[nbr.reshape(-1)].reshape(n_b, cap, -1)
            outs.append(jnp.sum((xg * wb.astype(jnp.bfloat16)[..., None]).astype(jnp.float32), 1))
        y = jnp.concatenate(outs, 0)[adjp.inv_perm]
        if adjp.hub_weights is not None:
            y = y + jnp.dot(adjp.hub_weights, xc[adjp.hub_ids],
                            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    def apply_segsum(_, x):
        xc = x.astype(jnp.bfloat16)
        msg = xc[src_j] * w_j[:, None].astype(jnp.bfloat16)
        return jax.ops.segment_sum(
            msg.astype(jnp.float32), dst_j, num_segments=nn, indices_are_sorted=True
        ).astype(x.dtype)

    # elimination variants: strip one suspect at a time (results not
    # semantically correct where noted — perf isolation only)
    def apply_mulsum_noperm(adjp, x):  # no inv_perm un-permute
        xc = x.astype(jnp.bfloat16)
        outs = [
            jnp.sum((xc[nbr] * wb.astype(jnp.bfloat16)[..., None]).astype(jnp.float32), 1)
            for nbr, wb in zip(adjp.bucket_nbrs, adjp.bucket_weights)
        ]
        return jnp.concatenate(outs, 0).astype(x.dtype)

    def apply_gather_only(adjp, x):  # no weights, no perm: pure gather+reduce
        xc = x.astype(jnp.bfloat16)
        outs = [
            jnp.sum(xc[nbr].astype(jnp.float32), 1) for nbr in adjp.bucket_nbrs
        ]
        return jnp.concatenate(outs, 0).astype(x.dtype)

    def apply_mulsum_f32(adjp, x):  # f32 gather payload (no bf16 cast)
        outs = [
            jnp.sum(xg * wb[..., None], 1)
            for xg, wb in (
                (x[nbr], wb)
                for nbr, wb in zip(adjp.bucket_nbrs, adjp.bucket_weights)
            )
        ]
        return jnp.concatenate(outs, 0)[adjp.inv_perm]

    variants = {
        "einsum": apply_einsum,
        "mulsum": apply_mulsum,
        "flat": apply_flat,
        "segsum_sorted": apply_segsum,
        "mulsum_noperm": apply_mulsum_noperm,
        "gather_only": apply_gather_only,
        "mulsum_f32": apply_mulsum_f32,
    }
    runs = []  # (variant, hub, cap_growth, freq_renumber)
    if "--probes" in sys.argv:
        runs = [
            ("einsum", 1024, 2.0, False),  # round-1 formulation
            ("mulsum_noperm", 1024, 1.26, False),  # fine cap ladder: less padding
            ("mulsum_noperm", 1024, 2.0, True),  # hot sources contiguous
            ("mulsum_noperm", 1024, 1.26, True),  # both
        ]
    # frequency-rank renumbering of SOURCES: hot rows become contiguous at the
    # top of x — pure locality probe (values of x are random either way)
    freq = np.bincount(src, minlength=nn)
    rank = np.empty(nn, np.int64)
    rank[np.argsort(-freq, kind="stable")] = np.arange(nn)
    src_rn = rank[src]

    adjs = {}
    for name, hub, growth, renum in runs:
        key = (hub, growth, renum)
        if key not in adjs:
            adjs[key] = build_padded_adj(
                src_rn if renum else src,
                dst,
                w,
                nn,
                hub_count=hub,
                hub_mem_budget=4 * 1024**3,
                cap_growth=growth,
            )
        adj = adjs[key]
        pair = PaddedAdjPair(fwd=adj, bwd=adj)
        fn = variants[name]

        def fwd_prog(R, fn=fn):
            return jax.jit(
                lambda p, x, i: lax.fori_loop(
                    0, R, lambda _, y: fn(p.fwd, y), x + jnp.float32(i)
                )
            )

        dt_f = per_op(fwd_prog)
        log(
            bench="spmm_variant",
            variant=name,
            hub=hub,
            cap_growth=growth,
            renumber=renum,
            fwd_ms=round(dt_f * 1e3, 2),
            tail_edges=sum(int((np.asarray(w_) > 0).sum()) for w_ in adj.bucket_weights),
            pad_slots=sum(int(np.prod(n.shape)) for n in adj.bucket_nbrs),
        )

    # --- dst-hub ladder: hot DESTINATIONS as a dense [H, num_src] MXU block ---
    if "--dsthub" in sys.argv:
        for dh in (0, 512, 1024, 2048, 4096):
            adj = build_padded_adj(
                src, dst, w, nn, hub_count=1024, dst_hub_count=dh, num_src=nn,
                hub_mem_budget=4 * 1024**3,
            )
            adj_pair = PaddedAdjPair(fwd=adj, bwd=adj)
            dt_f = per_op(
                lambda R: jax.jit(
                    lambda p, x, i: lax.fori_loop(
                        0, R, lambda _, y: padded_spmm(p, y), x + jnp.float32(i)
                    )
                ),
                make_arg=lambda i: (adj_pair, x64, i),
            )

            def grad_prog_dh(R, pr=adj_pair):
                def run(p, x, i):
                    g = jax.grad(lambda z: jnp.sum(padded_spmm(p, z) ** 2))
                    return lax.fori_loop(0, R, lambda _, y: g(y), x + jnp.float32(i))

                return jax.jit(run)

            dt_b = per_op(grad_prog_dh, make_arg=lambda i: (adj_pair, x64, i))
            log(
                bench="spmm_dsthub",
                hub=1024,
                dst_hub=dh,
                dst_hub_h=0 if adj.dst_hub_ids is None else int(adj.dst_hub_ids.shape[0]),
                fwd_ms=round(dt_f * 1e3, 2),
                fwd_bwd_ms=round(dt_b * 1e3, 2),
                tail_edges=sum(int((np.asarray(w_) > 0).sum()) for w_ in adj.bucket_weights),
                pad_slots=sum(int(np.prod(n.shape)) for n in adj.bucket_nbrs),
            )
        return

    # --- the adopted op (padded_spmm with current defaults) ---
    adj = build_padded_adj(src, dst, w, nn, hub_count=1024)
    adj_pair = PaddedAdjPair(fwd=adj, bwd=adj)
    dt_f = per_op(
        lambda R: jax.jit(
            lambda p, x, i: lax.fori_loop(
                0, R, lambda _, y: padded_spmm(p, y), x + jnp.float32(i)
            )
        ),
        make_arg=lambda i: (adj_pair, x64, i),
    )

    def grad_prog(R):
        def run(p, x, i):
            g = jax.grad(lambda z: jnp.sum(padded_spmm(p, z) ** 2))
            return lax.fori_loop(0, R, lambda _, y: g(y), x + jnp.float32(i))

        return jax.jit(run)

    dt_b = per_op(grad_prog, make_arg=lambda i: (adj_pair, x64, i))
    ref = jax.jit(
        lambda x: jax.ops.segment_sum(
            (x.astype(jnp.float32)[src_j] * w_j[:, None]), dst_j, num_segments=nn
        )
    )(x64)
    got = jax.jit(lambda p, x: padded_spmm(p, x))(adj_pair, x64)
    ok = bool(jnp.max(jnp.abs(ref - got)) < 0.05 * float(jnp.max(jnp.abs(ref))))
    log(
        bench="padded_spmm_adopted",
        hub=1024,
        fwd_ms=round(dt_f * 1e3, 2),
        fwd_bwd_ms=round(dt_b * 1e3, 2),
        matches_segsum=ok,
    )

    # --- special probes ---
    if (1024, 2.0, False) not in adjs:
        return
    adj = adjs[(1024, 2.0, False)]
    pair = PaddedAdjPair(fwd=adj, bwd=adj)

    # (a) d=128: if ms stays flat for 2x bytes, d=64 underfills the lane dim
    x128 = jnp.asarray(rng.standard_normal((nn, 128)).astype(np.float32))
    dt = per_op(
        lambda R: jax.jit(
            lambda p, x, i: lax.fori_loop(
                0, R, lambda _, y: apply_mulsum(p.fwd, y), x + jnp.float32(i)
            )
        ),
        make_arg=lambda i: (pair, x128, i),
    )
    log(bench="spmm_variant", variant="mulsum_d128", hub=1024, fwd_ms=round(dt * 1e3, 2))

    # (b) single fused gather for ALL buckets (kernel-count probe; no perm)
    shapes = [tuple(n.shape) for n in adj.bucket_nbrs]
    offs = np.cumsum([0] + [s[0] * s[1] for s in shapes]).tolist()
    idx_flat = jnp.concatenate([jnp.ravel(n) for n in adj.bucket_nbrs])
    w_flat = jnp.concatenate([jnp.ravel(w_) for w_ in adj.bucket_weights])

    def apply_flat1(fi, fw, x):
        xc = x.astype(jnp.bfloat16)
        xg = xc[fi] * fw.astype(jnp.bfloat16)[:, None]  # [S, d] one gather
        outs = []
        for (n_b, cap), off in zip(shapes, offs[:-1]):
            seg = jax.lax.dynamic_slice_in_dim(xg, off, n_b * cap)
            outs.append(jnp.sum(seg.reshape(n_b, cap, -1).astype(jnp.float32), 1))
        return jnp.concatenate(outs, 0).astype(x.dtype)

    dt = per_op(
        lambda R: jax.jit(
            lambda fi, fw, x, i: lax.fori_loop(
                0, R, lambda _, y: apply_flat1(fi, fw, y), x + jnp.float32(i)
            )
        ),
        make_arg=lambda i: (idx_flat, w_flat, x64, i),
    )
    log(bench="spmm_variant", variant="flat1_onegather", hub=1024, fwd_ms=round(dt * 1e3, 2))


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    log(bench="start", backend=jax.default_backend())

    # 1. raw gather wall
    if "--skip-gather" not in sys.argv:
        gather_bench(70_000, 2_900_000, rng)

    # 2. padded SpMM across hub settings
    ds = synthetic_dataset(n_users=50_000, m_items=20_000, avg_degree=29, seed=0)
    log(bench="dataset", edges=int(2 * ds.train_size))
    spmm_bench(ds)


if __name__ == "__main__":
    main()
