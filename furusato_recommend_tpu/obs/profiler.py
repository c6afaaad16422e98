"""Profiling + device-memory observability (SURVEY.md §5.1 rebuild goal).

The reference's only profiling was ad-hoc ``time.time()`` prints
(`/root/reference/ddp.py:43-50`). Here: a context manager around
``jax.profiler`` trace capture (view in TensorBoard / Perfetto) and a device
HBM snapshot helper for the memory logging the reference lacked.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

__all__ = ["trace", "device_memory_stats", "log_device_memory"]


#: capture a trace for a block: ``with trace("/tmp/jax-trace"): ...``
#: (alias of jax.profiler.trace — re-exported here so obs/ is the one-stop
#: observability surface)
trace = jax.profiler.trace


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """HBM usage snapshot in MiB (empty dict on backends without stats)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
    except Exception:
        return {}
    mib = 1024 * 1024
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k.replace("bytes", "mib")] = stats[k] / mib
    return out


def log_device_memory(sink=None, prefix: str = "mem") -> Dict[str, float]:
    stats = device_memory_stats()
    if sink is not None and stats:
        sink.log({f"{prefix}/{k}": v for k, v in stats.items()})
    return stats
