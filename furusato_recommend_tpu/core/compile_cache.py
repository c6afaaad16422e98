"""Persistent XLA compilation cache.

The flagship epoch program costs ~4 minutes of XLA compile per process start
(PERF.md "TextSAGE flagship": compile_epoch_s 221-259 s on a v5e via the
tunnel). The reference never pays this (eager torch), so a restarting user —
preemption recovery, serving hot-reload, a dev iteration loop — would see a
regression the reference does not have. `Config.compile_cache` points JAX's
persistent compilation cache at a directory; subsequent process starts reload
compiled executables from disk. Keyed by XLA on program + compiler version +
device topology, so a shared directory across runs and models is safe.
"""

from __future__ import annotations

import os

_enabled_dir: str | None = None


def enable_compile_cache(cache_dir: str) -> None:
    """Idempotently point JAX's persistent compilation cache at cache_dir.

    min_compile_time 1 s: tiny programs aren't worth the disk round-trip;
    every epoch/eval-scale program clears the bar by orders of magnitude.
    """
    global _enabled_dir
    if not cache_dir:
        return
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    if _enabled_dir == cache_dir:
        return
    import jax

    if _enabled_dir is not None:
        # the cache dir is process-global jax config: a second Trainer with a
        # different dir redirects the cache for EVERY model in the process —
        # legal, but worth a loud note (ADVICE r3)
        import warnings

        warnings.warn(
            f"compile cache already enabled at {_enabled_dir}; redirecting the "
            f"process-global cache to {cache_dir}",
            stacklevel=2,
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if jax.config.jax_persistent_cache_min_compile_time_secs == 1.0:
        # jax's default already matches the intent; only assert it when the
        # user hasn't customized the threshold themselves
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of backend (the default skips single-process CPU runs,
    # which is exactly the 8-virtual-device test/dev configuration); same
    # don't-clobber rule: leave a user-customized value alone
    if (
        jax.config.jax_persistent_cache_enable_xla_caches
        == "xla_gpu_per_fusion_autotune_cache_dir"
    ):
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    _enabled_dir = cache_dir
