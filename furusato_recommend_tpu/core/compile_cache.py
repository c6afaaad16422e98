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


def _declared_default(flag_name: str, fallback):
    """The default jax declares for ``flag_name``, read from jax's own config
    source (jax 0.9.0 exposes no default accessor on its State holders).

    The don't-clobber rule below must compare against the DECLARED default,
    not a hard-coded literal: if a jax upgrade changes the default, a literal
    comparison silently stops matching and the 'all' override is never applied
    (ADVICE r4). Falls back to ``fallback`` (the jax-0.9.0 literal) if the
    source pattern moves.
    """
    import inspect
    import re

    import jax._src.config as _jc

    try:
        src = inspect.getsource(_jc)
        m = re.search(
            rf"name='{re.escape(flag_name)}',\s*\n\s*default=([^,\n]+)", src
        )
        if m:
            import ast

            return ast.literal_eval(m.group(1).strip())
    except Exception:
        pass
    return fallback


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
    # Don't-clobber rule: only override a flag still at jax's DECLARED default
    # (read programmatically; env-var customization counts as user-set since
    # the declared default is pre-env). Fallback literals pinned at jax 0.9.0.
    def _at_default(flag, fallback):
        if flag.upper() in os.environ:  # e.g. JAX_PERSISTENT_CACHE_...
            return False
        return getattr(jax.config, flag) == _declared_default(flag, fallback)

    if _at_default("jax_persistent_cache_min_compile_time_secs", 1.0):
        # jax's default already matches the intent; only assert it when the
        # user hasn't customized the threshold themselves
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of backend (the default skips single-process CPU runs,
    # which is exactly the 8-virtual-device test/dev configuration); same
    # don't-clobber rule: leave a user-customized value alone
    if _at_default(
        "jax_persistent_cache_enable_xla_caches",
        "xla_gpu_per_fusion_autotune_cache_dir",
    ):
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    _enabled_dir = cache_dir
