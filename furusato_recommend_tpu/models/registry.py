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


# --- SAGE / TextSAGE family (features required; see models/sage.py header for
# the reference-variant -> configuration mapping) ---
def _sage(conv="sage_cat", **fixed):
    def make(c, g, features=None, **kw):
        from .sage import SAGE

        if features is None:
            raise ValueError("SAGE-family models require features=FeatureStore(...)")
        return SAGE(c, g, features, conv=conv, **{**fixed, **kw})

    return make


register("textsage")(_sage("sage_cat"))
register("dask")(_sage("sage_cat"))  # out-of-core numeric variant: pass
# ooc_numeric={side: MemmapNumeric} (data/ooc.py) — the numeric matrices stay
# on disk and stream through as per-epoch projections with epoch-delayed
# X^T@G updates (/root/reference/model/textsage_dask.py:117-119,300-334)
register("textsage_id")(_sage("sage_cat", use_id_embedding=True))
register("sage")(_sage("sage_cat", use_id_embedding=True))
register("fsage")(_sage("sage_cat", use_id_embedding=True))
register("fastsage")(_sage("sage_w2"))
register("lightsage")(_sage("light"))
register("pinsage")(_sage("pinsage"))
register("mrec")(_sage("sage_cat", towers=True))
register("nssage")(_sage("sage_cat", full_graph_train=True))
register("tgrec")(_sage("transformer"))
register("tgrec2")(_sage("transformer_cat"))


register("tgsrec")(_sage("temporal"))  # needs features.edge_time
register("sasgnn")(_sage("recency"))  # needs features.edge_time


def _rsage(c, g, features=None, **kw):
    """Multi-relational SAGE (/root/reference/model/rsage.py); relation combine
    mode from --multi_relational; needs features.edge_label."""
    from .sage import SAGE

    if features is None:
        raise ValueError("rsage requires features=FeatureStore(...)")
    if features.edge_label is None:
        raise ValueError(
            "rsage needs features.edge_label (favorite_train/review_train csvs "
            "via data.graph.build_relational_graph, or synthetic labels)"
        )
    return SAGE(c, g, features, conv=f"relational_{c.multi_relational}", **kw)


register("rsage")(_rsage)


def _sasrec(c, g, features=None, sequences=None, **kw):
    """Sequence tier (/root/reference/model/sasrec.py). sequences defaults to
    appearance-order train sequences built from the graph's dataset."""
    from .sasrec import SASRec

    if features is None or sequences is None:
        raise ValueError("sasrec requires features= and sequences=")
    return SASRec(c, g, features, sequences, **kw)


register("sasrec")(_sasrec)


def _asage(c, g, features=None, **kw):
    from .asage import ASAGE

    if features is None:
        raise ValueError("asage requires features=FeatureStore(...)")
    return ASAGE(c, g, features, **kw)


register("asage")(_asage)


def _gnn(c, g, features=None, **kw):
    """`--conv`-pluggable model (/root/reference/model/gnn.py:185-232)."""
    from .sage import SAGE

    if features is None:
        raise ValueError("gnn requires features=FeatureStore(...)")
    return SAGE(c, g, features, conv=c.conv, **kw)


register("gnn")(_gnn)
