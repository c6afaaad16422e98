"""Observability: structured metric sinks + step timing.

The reference logs to wandb with hard-coded project/key names
(`/root/reference/trainer.py:51,243,258`) and ad-hoc ``time.time()`` prints
(SURVEY.md §5.1). Here: a pluggable sink interface emitting the same metric keys
(``loss``, ``recall@10``, ``cold_recall@10``, ...), with JSONL / stdout / wandb
backends and a context-manager step timer; `jax.profiler` trace hooks are exposed
for on-TPU profiling.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax

__all__ = ["MetricLogger", "cprint", "step_timer"]


def cprint(words: str) -> None:
    """Yellow-highlight print (reference `world.cprint`,
    /root/reference/world.py:123-124)."""
    print(f"\033[0;30;43m{words}\033[0m")


class MetricLogger:
    """Fan-out metric sink: stdout + optional JSONL file + optional wandb run."""

    def __init__(
        self,
        jsonl_path: Optional[str | Path] = None,
        wandb_run: Optional[str] = None,
        project: str = "furusato_recommendation",
        quiet: bool = False,
        tensorboard_dir: Optional[str | Path] = None,
    ):
        self.quiet = quiet
        self._jsonl = None
        if jsonl_path:
            p = Path(jsonl_path)
            p.parent.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(p, "a")
        self._wandb = None
        if wandb_run:
            try:
                import wandb  # optional; baked-in envs may lack it

                self._wandb = wandb.init(project=project, name=wandb_run)
            except Exception as e:  # pragma: no cover - network/env dependent
                print(f"[obs] wandb unavailable ({e}); falling back to jsonl/stdout")
        # --tensorboard sink: the reference parses the flag but never writes
        # (vestigial SummaryWriter, /root/reference/parse.py:32, world.py:114);
        # here it is a real scalar sink
        self._tb = None
        self._tb_step = 0
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(tensorboard_dir))
            except Exception as e:  # pragma: no cover - env dependent
                print(f"[obs] tensorboard unavailable ({e}); falling back to jsonl/stdout")

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        payload = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            payload["step"] = step
        if not self.quiet:
            short = {k: round(v, 6) for k, v in payload.items()}
            print(f"[metrics] {short}")
        if self._jsonl:
            self._jsonl.write(json.dumps({"ts": time.time(), **payload}) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(payload, step=step)
        if self._tb:
            s = step if step is not None else self._tb_step
            self._tb_step = s + 1
            for k, v in payload.items():
                if k != "step":
                    self._tb.add_scalar(k, v, global_step=s)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()
        if self._tb:
            self._tb.close()


@contextlib.contextmanager
def step_timer(name: str, sink: Optional[MetricLogger] = None, trace: bool = False):
    """Wall-clock timer; with trace=True also emits a jax.profiler annotation."""
    ctx = jax.profiler.TraceAnnotation(name) if trace else contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.log({f"time/{name}": dt})
