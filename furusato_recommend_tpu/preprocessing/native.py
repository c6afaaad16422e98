"""ctypes bindings for the C++ host kernels (native/furusato_native.cpp), with
pure-Python fallbacks so the package works before/without compilation.

The shared library is built on first use with g++ (no pybind11 in this image —
ctypes is the binding layer). Covered kernels:

- ``lev_ratio`` — python-Levenshtein-compatible ratio (indel 1 / substitution 2)
  used by the product-ID dedup (`/root/reference/preprocessing/product/product_id_info.py:178-190`),
- ``parse_adjacency`` — fast COO parse of ``uid item...`` text files,
- ``bpr_sample`` — reference-equivalent CPU rejection sampler (parity oracle).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "furusato_native.cpp"
_LIB = _REPO_ROOT / "native" / "libfurusato_native.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.lev_ratio.restype = ctypes.c_double
        lib.lev_ratio.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
        ]
        lib.lev_ratio_consecutive.restype = None
        lib.parse_adjacency.restype = ctypes.c_int64
        lib.bpr_sample.restype = None
        try:
            lib.cuckoo_build.restype = ctypes.c_int64
        except AttributeError:  # stale .so predating the symbol
            pass
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain dependent
        print(f"[native] C++ kernels unavailable ({e}); using Python fallbacks")
    return _lib


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def lev_ratio(a: str, b: str) -> float:
    """python-Levenshtein `ratio` semantics (indel 1, substitution 2)."""
    lib = _load()
    ca, cb = _codepoints(a), _codepoints(b)
    if lib is not None:
        return lib.lev_ratio(
            ca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ca),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(cb),
        )
    # Python fallback
    la, lb = len(ca), len(cb)
    if la + lb == 0:
        return 1.0
    prev = np.arange(lb + 1)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + np.where(ca[i - 1] == cb, 0, 2)
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return float(la + lb - prev[lb]) / (la + lb)


def lev_ratio_consecutive(names) -> np.ndarray:
    """Ratios of (names[i], names[i+1]) for all i — the dedup loop's pattern."""
    lib = _load()
    if lib is None:
        return np.array([lev_ratio(a, b) for a, b in zip(names[:-1], names[1:])])
    rows = [_codepoints(str(s)) for s in names]
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    flat = np.concatenate(rows) if rows else np.empty(0, np.uint32)
    out = np.empty(max(len(rows) - 1, 0), dtype=np.float64)
    lib.lev_ratio_consecutive(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(rows)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def parse_adjacency_text(path) -> Tuple[np.ndarray, np.ndarray]:
    """Parse 'uid item1 item2 ...' lines into COO (users, items) arrays."""
    data = Path(path).read_bytes()
    lib = _load()
    if lib is None:
        users, items = [], []
        for line in data.decode().splitlines():
            parts = line.split()
            if not parts:
                continue
            uid = int(parts[0])
            for t in parts[1:]:
                users.append(uid)
                items.append(int(t))
        return np.asarray(users, np.int64), np.asarray(items, np.int64)
    buf = ctypes.create_string_buffer(data, len(data))
    n = lib.parse_adjacency(buf, ctypes.c_int64(len(data)), None, None, ctypes.c_int64(0))
    out_u = np.empty(n, np.int64)
    out_i = np.empty(n, np.int64)
    lib.parse_adjacency(
        buf, ctypes.c_int64(len(data)),
        out_u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
    )
    return out_u, out_i


def bpr_sample_cpu(indptr: np.ndarray, indices: np.ndarray, n_users: int,
                   m_items: int, n_samples: int, seed: int = 0):
    """Reference-equivalent CPU rejection sampler (parity oracle for tests)."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    out = [np.empty(n_samples, np.int64) for _ in range(3)]
    if lib is not None:
        lib.bpr_sample(
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n_users), ctypes.c_int64(m_items),
            ctypes.c_int64(n_samples), ctypes.c_uint64(seed),
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for o in out],
        )
        return tuple(out)
    rng = np.random.default_rng(seed)
    for s in range(n_samples):
        while True:
            u = int(rng.integers(0, n_users))
            deg = indptr[u + 1] - indptr[u]
            if deg:
                break
        row = indices[indptr[u]: indptr[u + 1]]
        p = int(row[rng.integers(0, deg)])
        while True:
            neg = int(rng.integers(0, m_items))
            if neg not in row:
                break
        out[0][s], out[1][s], out[2][s] = u, p, neg
    return tuple(out)
