"""Typed configuration for the TPU-native framework.

Replaces the reference's argparse-namespace-flattened-into-a-mutable-global-dict
pattern (`/root/reference/parse.py:4-61` + `/root/reference/world.py:30-115`) with a
single frozen dataclass that covers:

- every `parse.py` flag (35 flags),
- the hard-coded DDP training constants (`/root/reference/ddp.py:33-37`), so the
  distributed recipe is expressible from config instead of edited source,
- the feature-set mini-DSL over the alphabet ``n/c/w/t/s/r/b``
  (numeric / categorical / word2vec / tf-idf-text / sentence / review / bert),
  validated at construction time like `/root/reference/world.py:74-93`,
- TPU-specific knobs that have no reference counterpart (mesh shape, dtype policy,
  host prefetch depth).

The config is a pytree-free plain dataclass: it is never traced, only closed over,
so every field is a static hyperparameter from XLA's point of view.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Sequence

USER_FEATURE_ALPHABET = "ncwtbs"
ITEM_FEATURE_ALPHABET = "ncwtsrb"

#: feature flag -> human name (reference: /root/reference/world.py:77-86)
FEATURE_NAMES = {
    "n": "numeric",
    "c": "categorical",
    "w": "word2vec",
    "t": "text",  # tf-idf / count bag-of-words
    "s": "sentence",
    "r": "review",
    "b": "bert",
}


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. TPU-native capability with no reference counterpart —
    subsumes the reference's NCCL DDP (`/root/reference/ddp.py:884-891`) and
    `nn.DataParallel` (`/root/reference/trainer.py:41-44`) paths.

    ``data`` shards the training batch; ``model`` row-shards the embedding
    tables and item-shards full-catalog scoring.
    """

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class Config:
    # --- model selection (parse.py: --model / --dataset) ---
    model: str = "lgn"
    dataset: str = "furusato"

    # --- core hyperparameters (parse.py defaults) ---
    bpr_batch_size: int = 2048  # --bpr_batch
    latent_dim: int = 64  # --recdim
    n_layers: int = 2  # --layer
    lr: float = 1e-4  # --lr
    decay: float = 1e-7  # --decay (L2 coefficient)
    dropout: bool = False  # --dropout
    keep_prob: float = 0.6  # --keepprob
    num_neighbors: int = 5  # --num_neighbors (fanout per layer)
    topks: Sequence[int] = (10, 20)  # --topks
    epochs: int = 1000  # --epochs
    test_span: int = 10  # --test_span
    seed: int = 2020  # --seed
    pretrain: bool = False  # --pretrain
    r: float = 0.5  # --r (rAdjGCN asymmetric-normalization exponent)
    conv: str = "gcn"  # --conv in {transformer, gat, ggnn, gcn, sage}
    multi_relational: str = "add"  # --multi_relational in {add, sum, prod}
    inference: str = "all"  # --inference in {all, sample}
    #: --train_emb: True = recompute initial (feature) embeddings per training
    #: step (fresh gradients; `/root/reference/model/graphsage.py:376-381`);
    #: False (reference default) = compute them once per epoch and reuse the
    #: epoch-start linearization across all steps — the reference's
    #: ``retain_graph=True`` recipe (`/root/reference/model/graphsage.py:391-394`)
    #: made sound: stale-but-consistent feature grads via a frozen jax.vjp
    #: instead of backprop through a graph whose params already moved.
    train_emb: bool = False
    sample_pow: float = 0.0  # --sample_pow (popularity-weighted positive sampling)
    factorization: bool = False  # --factorization (FM second-order term)

    # --- dataset slicing flags ---
    test_mode: bool = False  # --test (tiny smoke slice, uid<=100)
    cold_start: bool = False  # --cold_start
    for_lgbm: bool = False  # --for_lgbm
    lgbm_ratio: float = 0.1  # --lgbm_ratio
    suffix: str = ""  # --suffix (dataset variant key)

    # --- feature DSL ---
    user_feature: str = "ntw"  # --user_feature, subset of ncwtbs
    item_feature: str = "ntw"  # --item_feature, subset of ncwtsrb

    # --- paths / logging ---
    path: str = "./checkpoints"  # --path
    data_path: str = "./data"
    wandb: str = ""  # --wandb run name ("" = disabled)
    tensorboard: bool = False  # --tensorboard
    comment: str = "lgn"  # --comment
    load: bool = False  # --load

    # --- distributed-recipe constants (reference ddp.py:33-37, hard-coded there) ---
    negative_pow: float = 0.2  # NEGATIVE_POW
    positive_num_limit: int = 3000  # POSITIVE_NUM_LIMIT (per-positive frequency cap)
    train_iterative: int = 3  # TRAIN_ITERATIVE (x dataset-size samples per epoch)
    test_count: int = 100  # TEST_COUNT (eval user-batch truncation in DDP eval)

    # --- TPU-native knobs (no reference counterpart) ---
    mesh: MeshConfig = field(default_factory=MeshConfig)
    ckpt_backend: str = "npz"  # "npz" (single file) | "orbax" (pickle-free dir)
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    neg_candidates: int = 4  # bounded rejection width; P(all positive) <= (max_deg/m)^4
    sample_infer_chunk: int = 512  # --inference sample encode tile (tree memory bound)
    eval_user_batch: int = 1024  # device-side eval tile (users per scoring block)
    donate_params: bool = True
    compute_auc: bool = False  # per-user AUC during eval (reference metric.py:149-158)
    loss_fn: str = "bpr"  # "bpr" (reference) | "infonce" (in-batch sampled softmax)
    infonce_temperature: float = 0.1
    #: --feature_update_every T (opt-in, T>1 deviates from the reference
    #: trajectory): with the epoch-cached initial-embedding path, accumulate
    #: the table cotangent for T steps and run the feature-VJP + the feature
    #: params' Adam update once per super-step on the step-mean gradient —
    #: gradient accumulation for the feature params only. The feature-VJP is
    #: ~5 ms of the 15 ms flagship step (PERF.md "TextSAGE step"), so T=8
    #: trades a slightly staler feature trajectory for ~1.4x step throughput.
    #: T=1 (default) is exactly the reference recipe.
    feature_update_every: int = 1
    #: Re-linearization cadence of the epoch-cached initial tables (SAGE-family
    #: models, train_emb=False). The reference FLAGSHIP recomputes feature
    #: embeddings fresh per minibatch (`/root/reference/ddp.py:607-609`);
    #: relin_every=R recomputes the all-entity tables + their jax.vjp every R
    #: steps inside the epoch program. R=1 (default) is mathematically the
    #: fresh-per-step gradient (reference-flagship parity) at ~the cost of one
    #: tables forward per step; R>1 bounds gradient staleness to R steps;
    #: R=0 keeps the epoch-start linearization (the non-flagship
    #: `/root/reference/model/graphsage.py:391-394` retain_graph recipe —
    #: measured UNSTABLE at scale: benchmarks/quality_curve.py + PERF.md
    #: "feature-linearization staleness"). When feature_update_every > 1 the
    #: super-step boundary is the re-linearization point (cadence = T).
    relin_every: int = 1
    #: Pipeline epoch dispatches: after dispatching epoch e's train scan,
    #: enqueue epoch e+1's sampling program BEFORE fetching e's loss, so the
    #: device queue never drains between epochs (the host sync + RPC gap over
    #: the tunnel otherwise leaves the chip idle between programs). Identical
    #: key stream and results to the unpipelined path
    #: (tests/test_models_e2e.py::test_pipeline_dispatch_equals_sync, incl.
    #: save/restore with an outstanding prefetch). Measured +0.36% at the
    #: flagship shape (7.971 -> 7.942 s/epoch, benchmarks/pipeline_probe.py) —
    #: small but free, so default ON; --no-pipeline_dispatch restores the
    #: synchronous order.
    pipeline_dispatch: bool = True
    #: Persistent XLA compilation-cache directory ("" = off). The flagship
    #: epoch program costs ~4 min of XLA compile per process start (PERF.md);
    #: with a cache dir, restarts (preemption recovery, serving hot-reload,
    #: dev iterations) reload compiled executables from disk instead. Safe to
    #: share across runs — XLA keys on program + compiler version + topology.
    compile_cache: str = ""

    def __post_init__(self):
        for f in self.user_feature:
            if f not in USER_FEATURE_ALPHABET:
                raise ValueError(
                    f"user_feature flag {f!r} not in {USER_FEATURE_ALPHABET!r}"
                )
        for f in self.item_feature:
            if f not in ITEM_FEATURE_ALPHABET:
                raise ValueError(
                    f"item_feature flag {f!r} not in {ITEM_FEATURE_ALPHABET!r}"
                )
        if self.inference not in ("all", "sample"):
            raise ValueError(f"inference must be 'all' or 'sample', got {self.inference!r}")
        if self.multi_relational not in ("add", "sum", "prod"):
            raise ValueError(f"bad multi_relational {self.multi_relational!r}")
        if self.conv not in ("gcn", "sage", "gat", "transformer", "ggnn", "mean", "light"):
            raise ValueError(f"bad conv {self.conv!r}")
        if not self.topks:
            raise ValueError("topks must be non-empty")
        if self.loss_fn not in ("bpr", "infonce"):
            raise ValueError(f"loss_fn must be 'bpr' or 'infonce', got {self.loss_fn!r}")
        if self.ckpt_backend not in ("npz", "orbax"):
            raise ValueError(f"ckpt_backend must be 'npz' or 'orbax', got {self.ckpt_backend!r}")

    # -- convenience --
    @property
    def max_topk(self) -> int:
        return max(self.topks)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["topks"] = list(self.topks)
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        d["topks"] = tuple(d["topks"])
        if isinstance(d.get("mesh"), dict):
            d["mesh"] = MeshConfig(**d["mesh"])
        # ignore fields from older checkpoints that no longer exist
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        return cls(**d)


def ddp_flagship_config() -> Config:
    """The reference's DDP flagship recipe (`/root/reference/ddp.py:771-786`):
    TextSAGE recdim=32, layer=2, fanout=5, batch=5000, lr=1e-3, decay=1e-6,
    features n/w/t, 200 epochs, 3x dataset-size samples/epoch."""
    return Config(
        model="textsage",
        latent_dim=32,
        n_layers=2,
        num_neighbors=5,
        bpr_batch_size=5000,
        lr=1e-3,
        decay=1e-6,
        user_feature="nwt",
        item_feature="nwt",
        epochs=200,
        train_iterative=3,
        positive_num_limit=3000,
        negative_pow=0.2,
    )
