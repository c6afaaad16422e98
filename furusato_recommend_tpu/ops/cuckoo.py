"""Partial-key cuckoo set: O(1) membership with two INDEPENDENT gathers.

Why: the sorted-CSR binary search (ops/csr_search.py) costs log2(max_degree)
*dependent* random gathers per query — each iteration's address derives from
the previous gather, so nothing pipelines and the chain runs at ~7 ns/probe on
v5e (PERF.md "sampler probes"). A cuckoo filter answers the same membership
question with 2 gathers whose addresses come straight from VPU hash math, so
they pipeline at the gather issue rate. This is the membership structure for
the BPR sampler's negative-rejection test (the reference's unbounded
``while negitem in posForUser`` loop, `/root/reference/negative_sample.py:121-126`).

Semantics: a set of (u, v) int pairs compressed to 32-bit fingerprints.
- No false negatives: every inserted pair is found.
- False positives ~n/2^32 per query (slots derive from the fingerprint, so a
  false positive requires a full fingerprint collision with a stored key) —
  ~3e-4 at n=1.5M edges. For negative sampling a false positive just rejects
  one valid candidate, the same (quantified-negligible) class of bias as the
  bounded-K fallback.

The table is built host-side (C++ kernel `cuckoo_build` in
native/furusato_native.cpp via ctypes, numpy fallback); membership runs on
device. Host and device share the murmur3-fmix32 slot math bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CuckooSet", "build_cuckoo_set", "cuckoo_contains"]

_C_KEY_U = 0x9E3779B1
_C_KEY_V = 0x85EBCA77
_C_H1 = 0xC2B2AE3D
_C_ALT = 0x165667B1
_FP_REMAP = 0x9E3779B1  # fingerprint 0 is the empty-slot sentinel


def _fmix32(h):
    """murmur3 finalizer over uint32 ARRAYS (numpy or jnp; wraps silently)."""
    u = jnp.uint32 if isinstance(h, jax.Array) else np.uint32
    h = h ^ (h >> 16)
    h = h * u(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * u(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _fingerprints(u, v):
    """32-bit fingerprint of (u, v); never 0. numpy/jnp polymorphic."""
    if isinstance(u, jax.Array):
        u32 = u.astype(jnp.uint32)
        v32 = v.astype(jnp.uint32)
        key = u32 * jnp.uint32(_C_KEY_U) ^ (v32 * jnp.uint32(_C_KEY_V))
        fp = _fmix32(key)
        return jnp.where(fp == 0, jnp.uint32(_FP_REMAP), fp)
    u32 = np.asarray(u).astype(np.uint32)
    v32 = np.asarray(v).astype(np.uint32)
    key = u32 * np.uint32(_C_KEY_U) ^ (v32 * np.uint32(_C_KEY_V))
    fp = _fmix32(key)
    return np.where(fp == 0, np.uint32(_FP_REMAP), fp)


def _h1(fp, mask, xp):
    return _fmix32(fp ^ xp.uint32(_C_H1)) & xp.uint32(mask)


def _alt(slot, fp, mask, xp):
    return slot ^ (_fmix32(fp ^ xp.uint32(_C_ALT)) & xp.uint32(mask))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CuckooSet:
    table: jnp.ndarray  # [S] uint32 (0 = empty), S a power of two
    mask: int = dataclasses.field(metadata=dict(static=True), default=0)


def _build_numpy(fps: np.ndarray, table: np.ndarray, max_kicks: int) -> int:
    """Pure-python fallback insert loop (small inputs / no toolchain). Hash
    math is precomputed vectorized; the walk uses plain python ints."""
    mask = len(table) - 1
    h1s = (_fmix32(fps ^ np.uint32(_C_H1)) & np.uint32(mask)).astype(np.int64)
    alt_offs = (_fmix32(fps ^ np.uint32(_C_ALT)) & np.uint32(mask)).astype(np.int64)
    alt_of = {int(fp): int(off) for fp, off in zip(fps, alt_offs)}
    failed = 0
    for fp_, s1 in zip(fps.astype(np.int64), h1s):
        fp, s1 = int(fp_), int(s1)
        if table[s1] == fp:
            continue
        s2 = s1 ^ alt_of[fp]
        if table[s2] == fp:
            continue
        if table[s1] == 0:
            table[s1] = fp
            continue
        if table[s2] == 0:
            table[s2] = fp
            continue
        cur, slot, placed = fp, s1, False
        for _ in range(max_kicks):
            cur, table[slot] = int(table[slot]), cur
            slot = slot ^ alt_of[cur]
            if table[slot] == 0 or table[slot] == cur:
                table[slot] = cur
                placed = True
                break
        if not placed:
            failed += 1
    return failed


def build_cuckoo_set(u: np.ndarray, v: np.ndarray, load: float = 0.35) -> CuckooSet:
    """Host build over int pair arrays. Grows the table (halving the load
    factor) until every key places — a failed eviction walk strands a
    displaced key, so the whole table rebuilds."""
    import ctypes

    from ..preprocessing.native import _load as _load_native

    fps = np.ascontiguousarray(_fingerprints(np.asarray(u), np.asarray(v)))
    n = len(fps)
    size = 1 << max(int(np.ceil(np.log2(max(n, 1) / load))), 4)
    lib = _load_native()
    while True:
        table = np.zeros(size, dtype=np.uint32)
        if lib is not None and hasattr(lib, "cuckoo_build"):
            failed = lib.cuckoo_build(
                fps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_int64(n),
                table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_int64(size),
                ctypes.c_int64(500),
            )
        else:
            failed = _build_numpy(fps, table, 500)
        if failed == 0:
            return CuckooSet(table=jnp.asarray(table), mask=size - 1)
        size *= 2


def cuckoo_contains(cs: CuckooSet, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Elementwise membership of broadcastable (u, v) int arrays: two
    independent flat gathers + fingerprint compares."""
    u_b, v_b = jnp.broadcast_arrays(jnp.asarray(u), jnp.asarray(v))
    shape = u_b.shape
    fp = _fingerprints(u_b.ravel(), v_b.ravel())
    s1 = _h1(fp, cs.mask, jnp)
    s2 = _alt(s1, fp, cs.mask, jnp)
    t1 = cs.table[s1.astype(jnp.int32)]
    t2 = cs.table[s2.astype(jnp.int32)]
    return ((t1 == fp) | (t2 == fp)).reshape(shape)
