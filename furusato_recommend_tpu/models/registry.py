"""Model registry: name -> constructor.

Mirrors the reference's MODELS dict (`/root/reference/main.py:32-56`, 23 entries).
Many reference variants are configurations of one TPU model (SURVEY.md §7.2 step 4);
the registry encodes that mapping explicitly so every reference key resolves.
"""

from __future__ import annotations

from typing import Callable, Dict

from ..config import Config
from ..data.graph import BipartiteGraph
from .base import PairwiseModel
from .lightgcn import LightGCN
from .mf import MF

_REGISTRY: Dict[str, Callable[[Config, BipartiteGraph], PairwiseModel]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build_model(name: str, config: Config, graph: BipartiteGraph, **kw) -> PairwiseModel:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](config, graph, **kw)


def available_models():
    return sorted(_REGISTRY)


# --- MF / LightGCN family ---
register("mf")(lambda c, g, **kw: MF(c, g, **kw))
register("lgn")(lambda c, g, **kw: LightGCN(c, g, norm="sym", **kw))
register("rgcn")(lambda c, g, **kw: LightGCN(c, g, norm="sym", **kw))  # scatter clone of lgn
register("radj")(lambda c, g, **kw: LightGCN(c, g, norm="asym", **kw))
register("lgcnssm")(lambda c, g, **kw: LightGCN(c, g, norm="sym", loss_mode="softmax", **kw))
