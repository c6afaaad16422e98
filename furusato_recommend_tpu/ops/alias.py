"""Walker alias tables: O(1) categorical sampling on device.

Used to give the on-device BPR sampler the reference's *weighted* sampling
capabilities without any data-dependent loops:

- popularity-weighted positive sampling (`--sample_pow`, precomputed
  `sample_prob_*.pkl` in `/root/reference/negative_sample.py:30-37`),
- popularity^pow negative distributions (`NEGATIVE_POW`,
  `/root/reference/ddp.py:33,705-706`),
- per-positive-item frequency caps (`POSITIVE_NUM_LIMIT`,
  `/root/reference/ddp.py:35,692-699`) expressed as expected-count caps on edge
  weights.

The table is built host-side in O(n) numpy; sampling is two gathers + a select.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AliasTable", "build_alias_table"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AliasTable:
    prob: jnp.ndarray  # [N] float32 — acceptance prob of the home slot
    alias: jnp.ndarray  # [N] int32 — fallback outcome

    @property
    def n(self) -> int:
        return self.prob.shape[0]

    def sample(self, key: jax.Array, shape) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        slot = jax.random.randint(k1, shape, 0, self.n)
        u = jax.random.uniform(k2, shape)
        # flat gathers: multi-dim-shaped scalar gathers lower ~6x worse on TPU
        # (ops/csr_search.py lower_bound; PERF.md "sampler probes")
        slot_f = slot.ravel()
        out = jnp.where(u.ravel() < self.prob[slot_f], slot_f, self.alias[slot_f])
        return out.reshape(shape)


def build_alias_table(weights: np.ndarray) -> AliasTable:
    """Standard Walker construction (host, numpy)."""
    w = np.asarray(weights, dtype=np.float64)
    if np.any(w < 0):
        raise ValueError("alias weights must be non-negative")
    total = w.sum()
    if total <= 0:
        raise ValueError("alias weights must not all be zero")
    n = len(w)
    p = w * (n / total)
    prob = np.zeros(n, dtype=np.float64)
    alias = np.zeros(n, dtype=np.int64)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large:
        prob[i] = 1.0
    for i in small:
        prob[i] = 1.0
    return AliasTable(
        prob=jnp.asarray(prob, dtype=jnp.float32),
        alias=jnp.asarray(alias, dtype=jnp.int32),
    )
