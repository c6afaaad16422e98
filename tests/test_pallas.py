"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
by bench/eval runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from furusato_recommend_tpu.ops.pallas_topk import streaming_topk


def test_scatter_add_rows_matches_xla():
    from furusato_recommend_tpu.ops.pallas_scatter import scatter_add_rows

    rng = np.random.default_rng(3)
    n, d, r = 300, 32, 5000  # r not a chunk multiple -> exercises padding
    ids = jnp.asarray(rng.integers(0, n, r).astype(np.int32))
    rows = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    got = scatter_add_rows(ids, rows, n, interpret=True)
    ref = jnp.zeros((n, d)).at[ids].add(rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_table_gather_grad_matches_xla():
    """table_gather == table[ids] in value and gradient (CPU fallback path)."""
    from furusato_recommend_tpu.ops.pallas_scatter import table_gather

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 50, (7, 9)).astype(np.int32))

    def f(t):
        return jnp.sum(table_gather(t, ids) ** 2)

    def f_ref(t):
        return jnp.sum(t[ids] ** 2)

    np.testing.assert_allclose(float(f(table)), float(f_ref(table)), rtol=1e-6)
    g, g_ref = jax.grad(f)(table), jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_streaming_topk_matches_argsort():
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    I = jnp.asarray(rng.standard_normal((1000, 32)).astype(np.float32))
    v, i = streaming_topk(U, I, k=8, tile=256, interpret=True)
    s = np.asarray(U) @ np.asarray(I).T
    ref_i = np.argsort(-s, axis=1)[:, :8]
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(v), np.take_along_axis(s, ref_i, 1), rtol=1e-5)


def test_streaming_topk_padding():
    """M not a tile multiple: padded virtual items must never appear."""
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)) * -1.0
    I = jnp.asarray(rng.standard_normal((130, 16)).astype(np.float32))
    v, i = streaming_topk(U, I, k=5, tile=64, interpret=True)
    assert np.asarray(i).max() < 130


def test_streaming_topk_b_tiling():
    """B larger than b_tile (and not a multiple): row blocks are independent,
    padded query rows never leak into real outputs."""
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.standard_normal((19, 16)).astype(np.float32))
    I = jnp.asarray(rng.standard_normal((257, 16)).astype(np.float32))
    v, i = streaming_topk(U, I, k=4, tile=64, b_tile=8, interpret=True)
    s = np.asarray(U) @ np.asarray(I).T
    ref_i = np.argsort(-s, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(v), np.take_along_axis(s, ref_i, 1), rtol=1e-5)
