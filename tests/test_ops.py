"""Unit tests for the core device ops: CSR search, alias tables, segment ops, SpMM."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from furusato_recommend_tpu.data.graph import CSR, COOEdges
from furusato_recommend_tpu.ops.alias import build_alias_table
from furusato_recommend_tpu.ops.csr_search import csr_contains, csr_gather_padded, lower_bound
from furusato_recommend_tpu.ops.segment import gather_segment_mean, segment_mean, spmm


def _random_csr(rng, rows=40, vocab=100, max_deg=15):
    indptr = [0]
    indices = []
    for _ in range(rows):
        k = rng.integers(0, max_deg)
        row = np.unique(rng.choice(vocab, size=k)) if k else np.empty(0, dtype=int)
        indices.extend(row.tolist())
        indptr.append(len(indices))
    return CSR(jnp.asarray(indptr, jnp.int32), jnp.asarray(indices, jnp.int32))


def test_lower_bound_matches_searchsorted():
    rng = np.random.default_rng(0)
    arr = np.sort(rng.integers(0, 1000, size=200))
    vals = rng.integers(-5, 1005, size=64)
    lo = jnp.zeros(64, jnp.int32)
    hi = jnp.full(64, 200, jnp.int32)
    got = lower_bound(jnp.asarray(arr), lo, hi, jnp.asarray(vals))
    np.testing.assert_array_equal(np.asarray(got), np.searchsorted(arr, vals, side="left"))


def test_csr_contains():
    rng = np.random.default_rng(1)
    csr = _random_csr(rng)
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    rows = rng.integers(0, 40, size=(32, 4))
    vals = rng.integers(0, 100, size=(32, 4))
    got = np.asarray(csr_contains(csr, jnp.asarray(rows), jnp.asarray(vals)))
    for (r, v), g in zip(zip(rows.ravel(), vals.ravel()), got.ravel()):
        expect = v in indices[indptr[r] : indptr[r + 1]]
        assert g == expect


def test_csr_gather_padded():
    rng = np.random.default_rng(2)
    csr = _random_csr(rng)
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    rows = jnp.asarray([0, 3, 7])
    vals, mask = csr_gather_padded(csr, rows, pad_to=20)
    vals, mask = np.asarray(vals), np.asarray(mask)
    for i, r in enumerate([0, 3, 7]):
        row = indices[indptr[r] : indptr[r + 1]]
        assert mask[i].sum() == len(row)
        np.testing.assert_array_equal(vals[i, : len(row)], row)
        assert np.all(vals[i, len(row) :] == -1)


def test_alias_table_distribution():
    w = np.array([1.0, 2.0, 3.0, 4.0])
    tbl = build_alias_table(w)
    draws = tbl.sample(jax.random.PRNGKey(0), (40000,))
    freq = np.bincount(np.asarray(draws), minlength=4) / 40000
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.02)


def test_segment_mean_and_spmm_vs_scipy():
    rng = np.random.default_rng(3)
    n = 30
    e = 200
    src = rng.integers(0, n, e)
    dst = np.sort(rng.integers(0, n, e))
    w = rng.random(e).astype(np.float32)
    x = rng.random((n, 8)).astype(np.float32)
    edges = COOEdges(jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32), jnp.asarray(w))
    got = np.asarray(spmm(edges, jnp.asarray(x), n))
    a = sp.coo_matrix((w, (dst, src)), shape=(n, n)).tocsr()
    np.testing.assert_allclose(got, a @ x, rtol=1e-4, atol=1e-5)

    gm = np.asarray(gather_segment_mean(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), n))
    cnt = np.bincount(dst, minlength=n)
    s = np.zeros((n, 8), np.float64)
    np.add.at(s, dst, x[src])
    expect = s / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(gm, expect, rtol=1e-4, atol=1e-5)


def test_segment_mean_empty_segments():
    x = jnp.ones((4, 2))
    ids = jnp.asarray([0, 0, 2, 2])
    out = np.asarray(segment_mean(x, ids, 4))
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[3], 0.0)
    np.testing.assert_allclose(out[0], 1.0)


def test_padded_adj_matches_scipy():
    from furusato_recommend_tpu.ops.padded_adj import build_padded_pair, padded_spmm

    rng = np.random.default_rng(4)
    n_src, n_dst, e = 50, 35, 300
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n_src, 8)).astype(np.float32)
    pair = build_padded_pair(src, dst, w, n_dst, n_src)
    got = np.asarray(padded_spmm(pair, jnp.asarray(x), compute_dtype=jnp.float32))
    a = sp.coo_matrix((w, (dst, src)), shape=(n_dst, n_src)).tocsr()
    np.testing.assert_allclose(got, a @ x, rtol=1e-4, atol=1e-5)
    # transpose-VJP == true gradient
    f = lambda x: jnp.sum(padded_spmm(pair, x, compute_dtype=jnp.float32) ** 2)
    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    expect = 2 * (a.T @ (a @ x))
    np.testing.assert_allclose(gx, expect, rtol=1e-3, atol=1e-4)


def test_cuckoo_set_membership():
    """No false negatives; false positives bounded by the fingerprint-collision
    rate; C++ and numpy builds produce identical tables."""
    from furusato_recommend_tpu.ops.cuckoo import (
        _build_numpy,
        _fingerprints,
        build_cuckoo_set,
        cuckoo_contains,
    )

    rng = np.random.default_rng(3)
    n_u, m_i, e = 4000, 2500, 50_000
    u = rng.integers(0, n_u, e)
    v = rng.integers(0, m_i, e)
    cs = build_cuckoo_set(u, v)
    # every inserted pair is found
    hit = np.asarray(cuckoo_contains(cs, jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32)))
    assert hit.all()
    # random queries: false-positive rate ~edges/2^32 (allow generous slack)
    qu = rng.integers(0, n_u, 100_000)
    qv = rng.integers(0, m_i, 100_000)
    member = set(zip(u.tolist(), v.tolist()))
    truth = np.fromiter(
        ((a, b) in member for a, b in zip(qu.tolist(), qv.tolist())), bool, 100_000
    )
    got = np.asarray(cuckoo_contains(cs, jnp.asarray(qu, jnp.int32), jnp.asarray(qv, jnp.int32)))
    assert not (truth & ~got).any()  # no false negatives on queries either
    assert int((got & ~truth).sum()) <= 20
    # numpy fallback build bit-identical to the C++ kernel's table
    tab2 = np.zeros(cs.table.shape[0], np.uint32)
    assert _build_numpy(np.ascontiguousarray(_fingerprints(u, v)), tab2, 500) == 0
    np.testing.assert_array_equal(np.asarray(cs.table), tab2)


def test_padded_adj_dst_hub_matches_scipy():
    """dst-hub split (hot destinations as a dense [H, num_src] MXU block) must
    match the plain SpMM in fwd and gradient, alone and combined with the
    src-hub split."""
    from furusato_recommend_tpu.ops.padded_adj import build_padded_pair, padded_spmm

    rng = np.random.default_rng(11)
    n_src, n_dst, e = 220, 150, 4000
    # Zipf-ish on BOTH sides so both hub splits engage
    src = (n_src * rng.random(e) ** 3).astype(np.int64)
    dst = (n_dst * rng.random(e) ** 3).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n_src, 8)).astype(np.float32)
    a = sp.coo_matrix((w, (dst, src)), shape=(n_dst, n_src)).tocsr()
    for hub in (0, 64):
        pair = build_padded_pair(
            src, dst, w, n_dst, n_src, hub_count=hub, dst_hub_count=64,
            hub_mem_budget=1 << 30,
        )
        assert pair.fwd.dst_hub_weights is not None, "dst-hub split did not engage"
        assert pair.bwd.dst_hub_weights is not None
        got = np.asarray(padded_spmm(pair, jnp.asarray(x), compute_dtype=jnp.float32))
        # hub blocks are bf16 — tolerances account for it
        np.testing.assert_allclose(got, a @ x, rtol=2e-2, atol=2e-2)
        f = lambda x: jnp.sum(padded_spmm(pair, x, compute_dtype=jnp.float32) ** 2)
        gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
        expect = 2 * (a.T @ (a @ x))
        np.testing.assert_allclose(gx, expect, rtol=2e-2, atol=2e-1)


def test_padded_pair_transpose_hub_matches_scipy():
    """transpose_hub=True (shared word-hub split, D^T matmul backward) must be
    numerically identical to the plain pair: same fwd, same gradient."""
    from furusato_recommend_tpu.ops.padded_adj import build_padded_pair, padded_spmm

    rng = np.random.default_rng(7)
    n_src, n_dst, e = 200, 90, 2500
    # Zipf-ish sources so the hub split actually engages (H=64-aligned)
    src = (n_src * rng.random(e) ** 3).astype(np.int64)
    dst = rng.integers(0, n_dst, e)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n_src, 8)).astype(np.float32)
    pair = build_padded_pair(
        src, dst, w, n_dst, n_src, hub_count=64, transpose_hub=True,
        hub_mem_budget=1 << 30,
    )
    assert pair.fwd.hub_weights is not None, "hub split did not engage"
    assert pair.bwd.hub_in_weights is not None
    got = np.asarray(padded_spmm(pair, jnp.asarray(x), compute_dtype=jnp.float32))
    a = sp.coo_matrix((w, (dst, src)), shape=(n_dst, n_src)).tocsr()
    # fwd hub block is bf16 — tolerances account for it
    np.testing.assert_allclose(got, a @ x, rtol=2e-2, atol=2e-2)
    f = lambda x: jnp.sum(padded_spmm(pair, x, compute_dtype=jnp.float32) ** 2)
    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    expect = 2 * (a.T @ (a @ x))
    np.testing.assert_allclose(gx, expect, rtol=2e-2, atol=2e-1)


def test_padded_pair_full_hub_empty_tail_matches_scipy():
    """When the hub budget covers EVERY source (small vocab), the hub axis is
    pad-aligned to 64 with zero columns (not truncated, which would spill the
    remainder onto the gather tail) and the tail is empty — the SpMM and its
    transpose-VJP must still be exact."""
    from furusato_recommend_tpu.ops.padded_adj import build_padded_pair, padded_spmm

    rng = np.random.default_rng(11)
    n_src, n_dst, e = 500, 300, 4000  # 500 is NOT a multiple of 64
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n_src, 8)).astype(np.float32)
    pair = build_padded_pair(
        src, dst, w, n_dst, n_src, hub_count=4096, transpose_hub=True,
        hub_mem_budget=1 << 30, min_cap=1,
    )
    assert pair.fwd.hub_weights is not None
    assert pair.fwd.hub_weights.shape[1] == 512, "hub axis should pad 500 -> 512"
    assert pair.fwd.bucket_nbrs == (), "tail should be empty (all sources dense)"
    assert pair.fwd.inv_perm is None
    got = np.asarray(padded_spmm(pair, jnp.asarray(x), compute_dtype=jnp.float32))
    a = sp.coo_matrix((w, (dst, src)), shape=(n_dst, n_src)).tocsr()
    np.testing.assert_allclose(got, a @ x, rtol=2e-2, atol=2e-2)
    f = lambda x: jnp.sum(padded_spmm(pair, x, compute_dtype=jnp.float32) ** 2)
    gx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(gx, 2 * (a.T @ (a @ x)), rtol=2e-2, atol=2e-1)


def test_padded_adj_src_hub_pad_aligned_matches_scipy():
    """build_padded_adj's src-hub split with a non-64-multiple source count:
    pad columns carry dummy id 0 and zero weights — results stay exact."""
    from furusato_recommend_tpu.ops.padded_adj import build_padded_adj, _apply

    rng = np.random.default_rng(13)
    n_src, n_dst, e = 150, 120, 1500
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n_src, 8)).astype(np.float32)
    adj = build_padded_adj(
        src, dst, w, n_dst, hub_count=4096, hub_mem_budget=1 << 30, min_cap=1
    )
    assert adj.hub_weights is not None
    assert adj.hub_weights.shape[1] == 192, "hub axis should pad 150 -> 192"
    got = np.asarray(_apply(adj, jnp.asarray(x), jnp.float32))
    a = sp.coo_matrix((w, (dst, src)), shape=(n_dst, n_src)).tocsr()
    np.testing.assert_allclose(got, a @ x, rtol=2e-2, atol=2e-2)


def test_segment_softmax_aggregate_matches_dense():
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.ops.segment import segment_softmax_aggregate

    ds = synthetic_dataset(n_users=30, m_items=40, avg_degree=6, seed=9)
    g = ds.graph
    rng = np.random.default_rng(5)
    s_src = rng.standard_normal(g.m_items).astype(np.float32)
    s_dst = rng.standard_normal(g.n_users).astype(np.float32)
    vals = rng.standard_normal((g.m_items, 4)).astype(np.float32)
    got = np.asarray(
        segment_softmax_aggregate(
            g.user_pos, jnp.asarray(s_src), jnp.asarray(s_dst), jnp.asarray(vals),
            g.n_users,
        )
    )
    ap = ds.all_pos()
    for u in range(g.n_users):
        nbrs = ap[u]
        if len(nbrs) == 0:
            np.testing.assert_allclose(got[u], 0.0, atol=1e-6)
            continue
        e = s_src[nbrs] + s_dst[u]
        e = np.where(e > 0, e, 0.2 * e)  # leaky_relu
        a = np.exp(e - e.max()); a /= a.sum()
        np.testing.assert_allclose(got[u], (a[:, None] * vals[nbrs]).sum(0), rtol=1e-4, atol=1e-5)


def test_chunked_top_k_matches_lax():
    """Sequential chunked top-k == lax.top_k exactly, including the
    value-desc/index-asc tie order (duplicate values forced)."""
    import jax
    import jax.numpy as jnp

    from furusato_recommend_tpu.ops.chunked_topk import chunked_top_k

    rng = np.random.default_rng(0)
    # quantized scores force plenty of cross-segment ties
    s = jnp.asarray(rng.integers(0, 40, (7, 1000)).astype(np.float32))
    for chunk in (64, 100, 256, 1000, 2048):
        v, i = chunked_top_k(s, 17, chunk=chunk)
        rv, ri = jax.lax.top_k(s, 17)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    # jit parity (the eval scan traces it)
    v, i = jax.jit(lambda x: chunked_top_k(x, 5, chunk=128))(s)
    rv, ri = jax.lax.top_k(s, 5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv[:, :5]))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri[:, :5]))
