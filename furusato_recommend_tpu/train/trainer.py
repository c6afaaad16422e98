"""Trainer: whole-epoch-compiled training + eval cadence + best checkpointing.

The reference Trainer (`/root/reference/trainer.py:27-258`) per epoch: CPU-samples
triplets (fork boundary), copies to GPU, Python-loops minibatches with per-batch
optimizer steps, evals every ``test_span`` epochs, checkpoints on best recall@K.

TPU re-design: the *entire epoch* — sampling, minibatching, forward/backward,
optimizer updates — is one jitted XLA program: ``sample_bpr`` draws all triplets
on device, ``lax.scan`` folds the optimizer step over [num_batches, B] tiles, and
buffers are donated so the tables update in place. One dispatch per epoch, zero
host<->device traffic in steady state.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..core.checkpoint import checkpoint_path, save_checkpoint
from ..core.mesh import DATA_AXIS, make_mesh, replicated, shard_params
from ..data.dataset import Dataset
from ..eval.evaluate import EvalData, Evaluator, build_eval_data
from ..models.base import PairwiseModel, Params
from ..obs.log import MetricLogger, cprint
from ..ops.alias import AliasTable
from ..sampling.bpr import BPRBatch, sample_bpr
from ..sampling.weights import (
    capped_positive_edge_weights,
    edge_alias_from_weights,
    negative_alias,
    popularity_positive_edge_weights,
)

__all__ = ["Trainer"]


class Trainer:
    def __init__(
        self,
        config: Config,
        dataset: Dataset,
        model: PairwiseModel,
        logger: Optional[MetricLogger] = None,
        item_categories: Optional[np.ndarray] = None,
        ddp_recipe: bool = False,
    ):
        self.config = config
        self.dataset = dataset
        self.model = model
        self.graph = dataset.graph
        self.logger = logger or MetricLogger(quiet=config.test_mode)
        if config.compile_cache:
            # before any jit: restarts reload the ~4-min epoch/eval compiles
            from ..core.compile_cache import enable_compile_cache

            enable_compile_cache(config.compile_cache)
        # multi-chip: honor Config.mesh (--mesh_data/--mesh_model). The epoch
        # program shards batches over `data` and tables over `model`; eval goes
        # through the item-sharded distributed top-K merge. Replaces the
        # reference's runnable DDP entry points (/root/reference/ddp.py:758-906).
        self.mesh = None
        if config.mesh.num_devices > 1:
            if config.bpr_batch_size % config.mesh.data:
                raise ValueError(
                    f"bpr_batch_size {config.bpr_batch_size} not divisible by "
                    f"mesh data axis {config.mesh.data}"
                )
            if config.eval_user_batch % config.mesh.data:
                raise ValueError(
                    f"eval_user_batch {config.eval_user_batch} not divisible by "
                    f"mesh data axis {config.mesh.data}"
                )
            self.mesh = make_mesh(config.mesh.data, config.mesh.model)
        self.max_recall = -1.0
        self.step = 0
        self._key = jax.random.PRNGKey(config.seed)  # sampling stream; restore()
        # overwrites it so resumed runs replay the uninterrupted sequence

        bs = config.bpr_batch_size
        # samples per epoch: reference draws trainDataSize (single-GPU,
        # negative_sample.py:106) or TRAIN_ITERATIVE x that (DDP, ddp.py:674);
        # rounded up to a whole number of static batches.
        mult = config.train_iterative if ddp_recipe else 1
        total = max(dataset.train_size * mult, bs)
        self.num_batches = -(-total // bs)
        # --feature_update_every T > 1: super-step feature updates (see
        # _build_train_epoch). Epochs round up to whole super-steps.
        self.feat_every = max(1, int(config.feature_update_every))
        if self.feat_every > 1:
            if getattr(model, "ooc_numeric", None):
                raise ValueError(
                    "feature_update_every > 1 is incompatible with out-of-core "
                    "numeric features (their update is already epoch-delayed)"
                )
            if not hasattr(model, "initial_param_keys"):
                raise ValueError(
                    "feature_update_every > 1 needs a SAGE-family model with "
                    "epoch-cached initial tables"
                )
            self.num_batches = -(-self.num_batches // self.feat_every) * self.feat_every
        # epoch-cached path? (must mirror _build_train_epoch's use_cache rule)
        import inspect

        self._use_cache = (
            not config.train_emb
            and hasattr(model, "initial_tables")
            and not getattr(model, "full_graph_train", False)
            and "tables" in inspect.signature(model.loss).parameters
        )
        # relin_every R: re-linearization cadence of the cached initial tables
        # (config.relin_every docstring; measured in PERF.md). The OOC path
        # stays on the epoch linearization (its X^T@G update is epoch-delayed
        # by design); feature_update_every > 1 re-linearizes per super-step.
        self.relin_every = int(config.relin_every)
        if self.relin_every < 0:
            raise ValueError(f"relin_every must be >= 0, got {self.relin_every}")
        if (
            self._use_cache
            and not getattr(model, "ooc_numeric", None)
            and self.feat_every == 1
            and self.relin_every > 1
        ):
            self.num_batches = -(-self.num_batches // self.relin_every) * self.relin_every
        self.samples_per_epoch = self.num_batches * bs

        # weighted-sampling recipes -> alias tables (host build, device sample)
        self.edge_alias: Optional[AliasTable] = None
        self.neg_alias: Optional[AliasTable] = None
        if ddp_recipe:
            w = capped_positive_edge_weights(
                dataset, self.samples_per_epoch, config.positive_num_limit
            )
            self.edge_alias = edge_alias_from_weights(w)
            if config.negative_pow:
                self.neg_alias = negative_alias(dataset, config.negative_pow)
        elif config.sample_pow:
            # migration contract: the reference's precomputed sample_prob_*.pkl
            # wins when present (/root/reference/negative_sample.py:24-38);
            # otherwise the tilt is computed from degrees (documented deviation)
            from ..sampling.weights import load_sample_prob, sample_prob_edge_weights

            probs = load_sample_prob(config.data_path, config.sample_pow)
            if probs is not None:
                w = sample_prob_edge_weights(dataset, probs)
            else:
                w = popularity_positive_edge_weights(dataset, config.sample_pow)
            self.edge_alias = edge_alias_from_weights(w)

        # out-of-core numeric features (dask variant): their projections enter
        # the epoch as data, so the in-epoch adam must not touch the numeric
        # linears (zero-grad adam still drifts params via moment decay) — they
        # get an epoch-delayed update from the streamed X^T@G pass instead.
        self.ooc = dict(getattr(model, "ooc_numeric", None) or {})
        if self.ooc and config.train_emb:
            raise ValueError(
                "out-of-core numeric features (dask) require train_emb=False "
                "(the epoch-cached initial-embedding path)"
            )
        if self.ooc:
            frozen = {
                f"{side}_numeric_{sfx}" for side in self.ooc for sfx in ("w", "b")
            }

            def _labels(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "ooc"
                    if (path and getattr(path[0], "key", None) in frozen)
                    else "adam",
                    params,
                )

            self.optimizer = optax.multi_transform(
                {"adam": optax.adam(config.lr), "ooc": optax.set_to_zero()}, _labels
            )
        elif self.feat_every > 1:
            # partition: feature params (gradient via the table cotangent +
            # the L2 term) step once per super-step; everything else per step.
            # multi_transform + set_to_zero — NOT zero-grad adam (whose moment
            # decay drifts params even with zero gradient) and NOT optax.masked
            # (which passes RAW grads through on masked-out leaves).
            feat_keys = model.initial_param_keys()

            def _labels(in_set):
                def build(params):
                    return jax.tree_util.tree_map_with_path(
                        lambda path, _: "on"
                        if path
                        and ((getattr(path[0], "key", None) in feat_keys) == in_set)
                        else "off",
                        params,
                    )

                return build

            self.optimizer = optax.multi_transform(
                {"on": optax.adam(config.lr), "off": optax.set_to_zero()}, _labels(False)
            )
            self.opt_feat = optax.multi_transform(
                {"on": optax.adam(config.lr), "off": optax.set_to_zero()}, _labels(True)
            )
        else:
            self.optimizer = optax.adam(config.lr)

        self._bound = self.model.data_to_bind()
        if self.mesh is not None:
            # replicate the graph, alias tables, and model-held device data over
            # the mesh so jitted programs see consistently-placed inputs
            rep = replicated(self.mesh)

            def _rep(x):
                return jax.device_put(x, rep) if hasattr(x, "ndim") else x

            self.graph = jax.tree_util.tree_map(_rep, self.graph)
            self.edge_alias = jax.tree_util.tree_map(_rep, self.edge_alias)
            self.neg_alias = jax.tree_util.tree_map(_rep, self.neg_alias)
            self._bound = jax.tree_util.tree_map(_rep, self._bound)

        self._train_epoch = self._build_train_epoch()
        self._sample_epoch = self._build_sample_epoch()
        # --pipeline_dispatch: one-epoch sample prefetch (see train_one_epoch).
        # The OOC path refreshes host-side bound data per epoch; keep it on the
        # simple synchronous ordering.
        self.pipeline = bool(config.pipeline_dispatch) and not self.ooc
        self._prefetch = None  # (key_state_before_draw, key, queued batches)

        max_deg = int(np.max(np.bincount(dataset.train_user, minlength=dataset.n_users)))
        self.evaluator = Evaluator(
            model, self.graph, config, max_train_degree=max_deg, mesh=self.mesh
        )
        self.eval_data: EvalData = build_eval_data(
            dataset,
            config.eval_user_batch,
            item_categories=item_categories,
            # DDP eval truncation (TEST_COUNT, /root/reference/ddp.py:826-847)
            max_batches=config.test_count if ddp_recipe else None,
        )

    # -- compiled epoch --
    def _build_train_epoch(self):
        """The epoch's train scan as one jitted program, consuming the batches
        the companion _sample_epoch program produced. The graph and model-held
        device data flow through the jit boundary as ARGUMENTS — closing over
        them would bake them into the executable as constants (bloats
        compiles; overflows remote-compile payloads at production scale)."""
        model, opt = self.model, self.optimizer
        nb, T = self.num_batches, self.feat_every
        R = self.relin_every
        opt_feat = getattr(self, "opt_feat", None)
        # train_emb=False (reference default): compute the all-entity initial
        # (feature) embeddings from a jax.vjp linearization instead of
        # re-assembling raw features per tree node (the reference flagship's
        # per-minibatch get_initial_emb, `/root/reference/ddp.py:607-609`,
        # measured 10x slower as a per-node assembly — PERF.md "TextSAGE").
        # The linearization is REFRESHED every relin_every steps: R=1 is
        # mathematically the fresh-per-step gradient; the round-2 epoch-start
        # linearization (R=0; the non-flagship retain_graph recipe,
        # `/root/reference/model/graphsage.py:368-394`) is measured UNSTABLE
        # at scale (PERF.md "feature-linearization staleness").
        use_cache = self._use_cache
        has_ooc = bool(self.ooc)
        if has_ooc and not use_cache:
            raise ValueError(
                "out-of-core numeric features need the epoch-cached path "
                "(a SAGE-family model with initial_tables; not full_graph_train)"
            )
        if T > 1 and not use_cache:
            raise ValueError(
                "feature_update_every > 1 requires the epoch-cached "
                "initial-embedding path (train_emb=False, SAGE-family model)"
            )

        def train_epoch(params, opt_state, key, graph, batches, bound):
            with model.bind(bound):
                if use_cache:

                    def make_lin(p):
                        if has_ooc:
                            # vjp also w.r.t. the streamed numeric projections;
                            # the scan accumulates their cotangents for the
                            # post-epoch streamed X^T@G pass (data/ooc.py)
                            return jax.vjp(
                                lambda q, pr: model.initial_tables(q, ooc_proj=pr),
                                p,
                                model._ooc_proj,
                            )
                        return jax.vjp(model.initial_tables, p)

                    def cached_loss(p, t, batch, k):
                        return model.loss(p, graph, batch, k, tables=t)

                    def make_train_step(tables0, tables_vjp):
                        def train_step(carry, inp):
                            if has_ooc:
                                params, opt_state, acc = carry
                            else:
                                params, opt_state = carry
                            batch, k = inp
                            (loss, _aux), (g_p, g_t) = jax.value_and_grad(
                                cached_loss, argnums=(0, 1), has_aux=True
                            )(params, tables0, batch, k)
                            if has_ooc:
                                g_feat, g_pr = tables_vjp(g_t)
                                acc = jax.tree_util.tree_map(jnp.add, acc, g_pr)
                            else:
                                (g_feat,) = tables_vjp(g_t)
                            grads = jax.tree_util.tree_map(jnp.add, g_p, g_feat)
                            updates, opt_state = opt.update(grads, opt_state, params)
                            params = optax.apply_updates(params, updates)
                            if has_ooc:
                                return (params, opt_state, acc), loss
                            return (params, opt_state), loss

                        return train_step

                else:

                    def train_step(carry, inp):
                        params, opt_state = carry
                        batch, k = inp
                        (loss, _aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                            params, graph, batch, k
                        )
                        updates, opt_state = opt.update(grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_state), loss

                # same key stream as when the epoch was one program: the
                # companion _sample_epoch program consumed split(key)[0]
                _, k_steps = jax.random.split(key)
                step_keys = jax.random.split(k_steps, nb)
                if use_cache and T > 1:
                    # super-step feature updates (--feature_update_every):
                    # inner scan runs T steps with the feature params FROZEN
                    # (masked adam) while accumulating the table cotangent and
                    # the L2 term's direct feature grads; the outer step runs
                    # the feature-VJP once on the step-mean cotangent and
                    # applies the feature params' own masked adam. Gradient
                    # accumulation for the feature params only — documented
                    # trajectory deviation, opt-in (config.feature_update_every).
                    # R != 0 re-linearizes at every super-step boundary.
                    lin_epoch = make_lin(params) if R == 0 else None

                    def outer_step(carry, inp):
                        params, opt_d, opt_f = carry
                        batch_t, keys_t = inp
                        tables0, tables_vjp = (
                            lin_epoch if R == 0 else make_lin(params)
                        )

                        def inner_step(carry, inp):
                            params, opt_d, acc_t, acc_p = carry
                            batch, k = inp
                            (loss, _aux), (g_p, g_t) = jax.value_and_grad(
                                cached_loss, argnums=(0, 1), has_aux=True
                            )(params, tables0, batch, k)
                            acc_t = jax.tree_util.tree_map(jnp.add, acc_t, g_t)
                            acc_p = jax.tree_util.tree_map(jnp.add, acc_p, g_p)
                            updates, opt_d = opt.update(g_p, opt_d, params)
                            params = optax.apply_updates(params, updates)
                            return (params, opt_d, acc_t, acc_p), loss

                        acc_t0 = jax.tree_util.tree_map(jnp.zeros_like, tables0)
                        acc_p0 = jax.tree_util.tree_map(jnp.zeros_like, params)
                        (params, opt_d, acc_t, acc_p), losses = jax.lax.scan(
                            inner_step, (params, opt_d, acc_t0, acc_p0), (batch_t, keys_t)
                        )
                        (g_feat,) = tables_vjp(
                            jax.tree_util.tree_map(lambda x: x / T, acc_t)
                        )
                        # + the accumulated direct component on feature leaves
                        # (the whole-parameter L2 term); non-feature leaves are
                        # masked out of opt_feat anyway
                        g_feat = jax.tree_util.tree_map(
                            lambda a, b: a + b / T, g_feat, acc_p
                        )
                        updates, opt_f = opt_feat.update(g_feat, opt_f, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_d, opt_f), losses

                    opt_d, opt_f = opt_state

                    def rs(x):
                        return x.reshape((nb // T, T) + x.shape[1:])

                    (params, opt_d, opt_f), losses = jax.lax.scan(
                        outer_step,
                        (params, opt_d, opt_f),
                        (jax.tree_util.tree_map(rs, batches), rs(step_keys)),
                    )
                    return params, (opt_d, opt_f), jnp.mean(losses)
                if use_cache and not has_ooc and R == 1:
                    # fresh-per-step gradients as ONE flat scan with the
                    # all-entity tables computed INSIDE the differentiated
                    # loss: at R=1 the explicit jax.vjp linearization + stitched
                    # pullback is mathematically identical to one fused
                    # autodiff pass (chain rule; equality to train_emb=True
                    # pinned in tests/test_relin.py) but materializes the
                    # [n_entities, d] cotangent and re-applies it separately —
                    # one grad lets XLA schedule the whole backward together
                    def fresh_loss(p, batch, k):
                        return model.loss(
                            p, graph, batch, k, tables=model.initial_tables(p)
                        )

                    def flat_step(carry, inp):
                        params, opt_state = carry
                        batch, k = inp
                        (loss, _aux), grads = jax.value_and_grad(
                            fresh_loss, has_aux=True
                        )(params, batch, k)
                        updates, opt_state = opt.update(grads, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt_state), loss

                    (params, opt_state), losses = jax.lax.scan(
                        flat_step, (params, opt_state), (batches, step_keys)
                    )
                    return params, opt_state, jnp.mean(losses)
                if use_cache and not has_ooc and R >= 1:
                    # bounded-staleness linearization: outer scan over nb/R
                    # super-chunks, fresh jax.vjp of the all-entity tables at
                    # the top of each chunk (R=1 == fresh-per-step gradients,
                    # the reference flagship's per-minibatch recompute)
                    def super_step(carry, inp):
                        params, opt_state = carry
                        batch_r, keys_r = inp
                        step = make_train_step(*make_lin(params))
                        (params, opt_state), losses = jax.lax.scan(
                            step, (params, opt_state), (batch_r, keys_r)
                        )
                        return (params, opt_state), losses

                    def rs(x):
                        return x.reshape((nb // R, R) + x.shape[1:])

                    (params, opt_state), losses = jax.lax.scan(
                        super_step,
                        (params, opt_state),
                        (jax.tree_util.tree_map(rs, batches), rs(step_keys)),
                    )
                    return params, opt_state, jnp.mean(losses)
                if use_cache:
                    # R == 0 (epoch-start linearization) or the OOC path (its
                    # X^T@G feature update is epoch-delayed by design)
                    train_step = make_train_step(*make_lin(params))
                carry0 = (params, opt_state)
                if has_ooc and use_cache:
                    carry0 = carry0 + (
                        jax.tree_util.tree_map(jnp.zeros_like, model._ooc_proj),
                    )
                carry, losses = jax.lax.scan(train_step, carry0, (batches, step_keys))
                if has_ooc and use_cache:
                    params, opt_state, g_acc = carry
                    return params, opt_state, jnp.mean(losses), g_acc
                params, opt_state = carry
                return params, opt_state, jnp.mean(losses)

        donate = (0, 1) if self.config.donate_params else ()
        return jax.jit(train_epoch, donate_argnums=donate)

    def _build_sample_epoch(self):
        """The epoch's sampling as its OWN jitted program, dispatched before
        the scan program. Deliberately not inlined into the epoch: compiled
        into one program with the train scan, XLA schedules the sampler's flat
        gathers ~10x slower (2.27 s vs 211 ms for the flagship's 2.105M
        weighted triplets — benchmarks/trainer_epoch_probe.py /
        sample_incontext_probe.py); as a separate dispatch the batches
        materialize in HBM at the standalone rate and the scan program starts
        from them. Same key stream: this program consumes split(key)[0], the
        scan program split(key)[1]."""
        bs, nb = self.config.bpr_batch_size, self.num_batches
        neg_k = self.config.neg_candidates
        batch_spec = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_spec = NamedSharding(self.mesh, P(None, DATA_AXIS))

        def sample_epoch(key, graph, aliases):
            edge_alias, neg_alias = aliases
            k_sample, _ = jax.random.split(key)
            s = sample_bpr(
                k_sample,
                graph,
                nb * bs,
                neg_candidates=neg_k,
                edge_alias=edge_alias,
                neg_alias=neg_alias,
            )
            batches = BPRBatch(
                user=s.user.reshape(nb, bs),
                pos=s.pos.reshape(nb, bs),
                neg=s.neg.reshape(nb, bs),
                valid=s.valid.reshape(nb, bs),
            )
            if batch_spec is not None:
                # [num_batches, B] tiles sharded over `data`: every scan step
                # of the train program is a data-parallel SPMD step
                batches = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, batch_spec),
                    batches,
                )
            return batches

        return jax.jit(sample_epoch)

    # -- public API --
    def _init_opt(self, params):
        if self.feat_every > 1:
            return (self.optimizer.init(params), self.opt_feat.init(params))
        return self.optimizer.init(params)

    def init_state(self, seed: Optional[int] = None):
        key = jax.random.PRNGKey(self.config.seed if seed is None else seed)
        k_init, self._key = jax.random.split(key)
        params = self.model.init(k_init)
        if self.mesh is not None:
            params = shard_params(params, self.mesh)
        opt_state = self._init_opt(params)
        self.step = 0
        self._prefetch = None
        return params, opt_state

    def train_one_epoch(self, params, opt_state, prefetch_next: bool = True):
        """prefetch_next=False skips the pipelined sample dispatch for the NEXT
        epoch — fit() passes it on the final epoch so the last eval doesn't
        queue behind a wasted whole-epoch sampling program and the prefetched
        batch buffers don't stay resident in device memory (ADVICE r4)."""
        if self.ooc:
            self._refresh_bound(params)
        if self._prefetch is not None:
            _, k, batches = self._prefetch
            self._prefetch = None
        else:
            self._key, k = jax.random.split(self._key)
            batches = self._sample_epoch(k, self.graph, (self.edge_alias, self.neg_alias))
        out = self._train_epoch(
            params,
            opt_state,
            k,
            self.graph,
            batches,
            self._bound,
        )
        if self.pipeline and prefetch_next:
            # enqueue the NEXT epoch's sampling behind the scan we just
            # dispatched, BEFORE the float(loss) host sync below: the device
            # queue never drains between epochs. Same key chain, same order —
            # save() persists the pre-draw chain state so resume replays the
            # identical stream (the prefetched draw is "unconsumed" on disk).
            key_state = self._key
            self._key, k2 = jax.random.split(self._key)
            self._prefetch = (
                key_state,
                k2,
                self._sample_epoch(k2, self.graph, (self.edge_alias, self.neg_alias)),
            )
        if self.ooc:
            params, opt_state, loss, g_acc = out
            params = self._apply_ooc_update(params, g_acc)
        else:
            params, opt_state, loss = out
        self.step += 1
        return params, opt_state, float(loss)

    def _refresh_bound(self, params):
        """Recompute the streamed OOC numeric projections for ``params`` and
        rebuild the bound data (mesh-replicated when sharded)."""
        self.model.refresh_ooc_proj(params)
        b = self.model.data_to_bind()
        if self.mesh is not None:
            rep = replicated(self.mesh)
            b = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep) if hasattr(x, "ndim") else x, b
            )
        self._bound = b

    def _apply_ooc_update(self, params, g_acc):
        """Epoch-delayed update of the OOC numeric linears: one streamed
        X^T @ G pass per side (data/ooc.py), plain SGD at config.lr on the
        step-mean gradient. Deviation (documented): the reference's dask
        variant never trains (or uses) its numeric linears at all —
        `/root/reference/model/textsage_dask.py:300-305` is commented out."""
        from ..data.ooc import stream_project_grad

        params = dict(params)
        scale = self.config.lr / self.num_batches
        for side, mm in self.ooc.items():
            gw, gb = stream_project_grad(mm, g_acc[side])
            params[f"{side}_numeric_w"] = params[f"{side}_numeric_w"] - scale * gw
            params[f"{side}_numeric_b"] = params[f"{side}_numeric_b"] - scale * gb
        return params

    def test(self, params) -> Dict[str, float]:
        if self.ooc:
            self._refresh_bound(params)
        # with_topk=False: the eval cadence only needs the metric sums — the
        # [n_test_users, Kmax] id buffer stays on device (8 MB/eval host
        # transfer at the flagship shape; see benchmarks/eval_probe.py)
        results, _ = self.evaluator(
            params, self.eval_data, bound=self._bound, with_topk=False
        )
        return results

    def fit(self, epochs: Optional[int] = None, state=None):
        """Full loop: initial eval; per epoch train + log; every test_span eval +
        best-checkpoint (reference `train_epoch`, /root/reference/trainer.py:237-258).

        state: optional (params, opt_state) to continue from (e.g. the result
        of restore()); fresh init otherwise."""
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.epochs
        if state is not None:
            params, opt_state = state  # e.g. restore(); self.step/key already set
        else:
            params, opt_state = self.init_state()
        results = self.test(params)
        self.logger.log(results, step=self.step)
        # `epochs` is the TOTAL epoch budget; a warm-started run continues from
        # the restored self.step so logged steps stay monotonic across restarts
        while self.step < epochs:
            t0 = time.perf_counter()
            params, opt_state, loss = self.train_one_epoch(
                params, opt_state, prefetch_next=self.step + 1 < epochs
            )
            dt = time.perf_counter() - t0
            self.logger.log(
                {
                    "loss": loss,
                    "epoch_time_s": dt,
                    "samples_per_sec": self.samples_per_epoch / max(dt, 1e-9),
                },
                step=self.step,
            )
            if self.step % cfg.test_span == 0 or self.step == epochs:
                results = self.test(params)
                self.logger.log(results, step=self.step)
                k0 = cfg.topks[0]
                if results.get(f"recall@{k0}", -1.0) > self.max_recall:
                    self.max_recall = results[f"recall@{k0}"]
                    self.save(params, opt_state)
                    cprint(f"[best] recall@{k0}={self.max_recall:.5f} @ epoch {self.step}")
        return params, opt_state

    def save(self, params, opt_state, path=None):
        # single-writer guard: in a multi-process world only the primary host
        # writes (the reference's rank-0-only gating, /root/reference/ddp.py:814).
        # Both backends jax.device_get the full tree, which requires every
        # leaf to be materializable from the writing process — true for
        # fully-replicated leaves (device_get reads the local replica; in a
        # multi-process world replicated arrays are NOT "fully addressable",
        # so that property alone would reject the normal data-parallel case)
        # and for single-process shardings, false when the MODEL axis spans
        # processes. Check on ALL hosts (not just the primary) so every
        # process raises consistently instead of desyncing (ADVICE r4).
        from ..core.distributed import is_primary_host

        if jax.process_count() > 1:
            for path_k, leaf in jax.tree_util.tree_flatten_with_path(
                {"params": params, "opt_state": opt_state}
            )[0]:
                if isinstance(leaf, jax.Array) and not (
                    leaf.is_fully_replicated or leaf.is_fully_addressable
                ):
                    raise NotImplementedError(
                        "checkpoint save with a model-sharded axis spanning "
                        f"processes: leaf {jax.tree_util.keystr(path_k)} is not "
                        "fully addressable from this host. Use a process-local "
                        "model axis (mesh model dim within one host) or gather "
                        "params before saving."
                    )
        if not is_primary_host():
            return
        # with an outstanding sample prefetch, persist the chain state from
        # BEFORE its key draw: the resumed run re-draws it and replays the
        # identical stream
        key = self._prefetch[0] if self._prefetch is not None else self._key
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.asarray(self.step),
            "key": key,
            "max_recall": jnp.asarray(self.max_recall),
        }
        save_checkpoint(
            path or checkpoint_path(self.config),
            state,
            self.config,
            backend=self.config.ckpt_backend,
        )

    def restore(self, path=None):
        """Resume full training state — params, optimizer moments, PRNG stream,
        step counter, best-metric — fixing the reference's lossy resume
        (torch.save(state_dict) only, SURVEY.md §5.4)."""
        from ..core.checkpoint import load_checkpoint, restructure

        state = load_checkpoint(path or checkpoint_path(self.config))
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        # the orbax backend restores optax NamedTuple states as plain
        # containers; re-impose the optimizer's structure (no-op for npz)
        opt_state = restructure(self._init_opt(params), state["opt_state"])
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        if self.mesh is not None:
            # adam moments mirror param shapes -> same row-sharding rule applies
            params = shard_params(params, self.mesh)
            opt_state = shard_params(opt_state, self.mesh)
        self.step = int(state["step"])
        self._key = jnp.asarray(state["key"])
        self.max_recall = float(state["max_recall"])
        self._prefetch = None  # the checkpoint's key chain re-draws it
        return params, opt_state
