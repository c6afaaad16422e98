"""Online serving tier: checkpoint -> cached propagated embeddings -> masked
per-request top-K.

The reference ships only offline batch flows (`/root/reference/
ddp_inference.py:48-181` dumps targeted CSVs; `test.py:23-41` dumps top-50
files). This module is their online counterpart for production deployment —
a TPU-native addition with no reference equivalent (flagged per PARITY.md
conventions):

- full-graph propagation runs ONCE (over the inference edge set when the
  dataset carries one — train+test interactions, `/root/reference/ddp.py:62-75`
  semantics) and the [N, d]/[M, d] embeddings stay on device;
- each request is one jitted masked-score + top-K over a padded user tile
  (requests round up to a power-of-two tile so the executable cache stays
  bounded), same -2^10 train-positive mask sentinel as the evaluator;
- ``refresh(params)`` re-propagates after a checkpoint reload or an
  incremental feature/graph update (the preprocessing pipeline's scenario).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.dataset import Dataset
from .models.base import PairwiseModel, Params
from .ops.csr_search import csr_gather_padded

__all__ = ["Recommender"]

MASK_SENTINEL = -(1 << 10)  # /root/reference/trainer.py:137
_MIN_TILE = 8


class Recommender:
    def __init__(
        self,
        model: PairwiseModel,
        dataset: Dataset,
        config: Config,
        params: Params,
        use_inference_edges: bool = True,
        exclude_train: bool = True,
    ):
        self.model = model
        self.config = config
        self._mask_graph = dataset.graph  # train positives (exclusion source)
        self._prop_graph = (
            dataset.inference_graph
            if use_inference_edges and dataset.has_inference_edges
            else dataset.graph
        )
        self._exclude = exclude_train
        self._max_deg = self._mask_graph.max_user_degree or 1
        self._bound = model.data_to_bind()

        def _propagate(params, g, bound):
            with model.bind(bound):
                return model.propagate(params, g, None)

        self._propagate = jax.jit(_propagate)

        def _topk(users, user_emb, item_emb, mask_graph, k):
            s = (user_emb[users] @ item_emb.T).astype(jnp.float32)
            if model.score_sigmoid:
                s = jax.nn.sigmoid(s)
            if self._exclude:
                pos, m = csr_gather_padded(mask_graph.user_pos, users, self._max_deg)
                b = jnp.arange(users.shape[0])[:, None]
                cols = jnp.where(m, pos, mask_graph.m_items)
                s = s.at[b, cols].set(MASK_SENTINEL, mode="drop")
            return jax.lax.top_k(s, k)

        self._topk = jax.jit(_topk, static_argnames=("k",))
        self.refresh(params)

    def refresh(self, params: Params) -> None:
        """Re-propagate (new params, or graph/features rebuilt + model rebound
        by the caller). One device program; embeddings stay on device."""
        self._bound = self.model.data_to_bind()
        self._user_emb, self._item_emb = self._propagate(
            params, self._prop_graph, self._bound
        )

    def recommend(
        self, user_ids, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(item_ids [n, k], scores [n, k]) for a batch of user ids. Requests
        pad to the next power-of-two tile (>= 8) so repeat traffic reuses a
        small set of compiled shapes."""
        users = np.atleast_1d(np.asarray(user_ids, dtype=np.int32))
        n = users.shape[0]
        tile = max(_MIN_TILE, 1 << (n - 1).bit_length())
        padded = np.zeros(tile, np.int32)
        padded[:n] = users
        scores, ids = self._topk(
            jnp.asarray(padded), self._user_emb, self._item_emb, self._mask_graph, k
        )
        return np.asarray(ids)[:n], np.asarray(scores)[:n]

    def reload_checkpoint(self, ckpt_path: str) -> None:
        """Hot-swap params from a newer checkpoint (the preprocessing/retrain
        loop's deploy step) and re-propagate."""
        from .core.checkpoint import load_checkpoint

        state = load_checkpoint(ckpt_path)
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.refresh(params)

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, data_path: Optional[str] = None, **kw
    ) -> "Recommender":
        """Build straight from a Trainer checkpoint (tools.py loading path)."""
        import argparse
        import json as _json

        from .cli import build_argparser, build_model_inputs, config_from_args
        from .core.checkpoint import load_checkpoint
        from .data import load_text_dataset
        from .models.registry import build_model

        state = load_checkpoint(ckpt_path)
        cfg_json = state.get("__config__")
        config = (
            Config.from_json(_json.dumps(cfg_json))
            if cfg_json
            else config_from_args(build_argparser().parse_args([]))
        )
        if data_path:
            config = config.replace(data_path=data_path)
        if config.compile_cache:
            # hot-reload/restart skips the full-graph propagate compile
            from .core.compile_cache import enable_compile_cache

            enable_compile_cache(config.compile_cache)
        dataset = load_text_dataset(config)
        graph, model_kw = build_model_inputs(config, dataset)
        model = build_model(config.model, config, graph, **model_kw)
        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        return cls(model, dataset, config, params, **kw)


# ---------------------------------------------------------------------------
# HTTP endpoint (stdlib-only) — `python -m furusato_recommend_tpu.serve`
# ---------------------------------------------------------------------------


def make_server(rec: Recommender, host: str = "127.0.0.1", port: int = 8080):
    """JSON-over-HTTP front end for the Recommender (TPU-native production
    addition; the reference has no serving entry point):

      GET  /healthz                      -> {"ok": true, ...}
      GET  /recommend?user=3&k=10        -> {"user": 3, "items": [...], "scores": [...]}
      POST /recommend  {"users": [3,17], "k": 10}   -> batch form
      POST /reload     {"ckpt": "path"}  -> hot-swap params + re-propagate

    Stdlib ThreadingHTTPServer; device work is serialized behind one lock (a
    single chip serves one program at a time anyway — requests batch through
    the power-of-two-tile executable cache).
    """
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            body = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/healthz":
                return self._send(
                    200,
                    {
                        "ok": True,
                        "n_users": int(rec._mask_graph.n_users),
                        "m_items": int(rec._mask_graph.m_items),
                        "model": rec.config.model,
                    },
                )
            if u.path == "/recommend":
                q = parse_qs(u.query)
                try:
                    users = [int(x) for x in q["user"]]
                    k = int(q.get("k", ["10"])[0])
                except (KeyError, ValueError):
                    return self._send(400, {"error": "need ?user=<id>[&k=N]"})
                if any(not 0 <= x < rec._mask_graph.n_users for x in users):
                    return self._send(400, {"error": "user id out of range"})
                with lock:
                    ids, scores = rec.recommend(users, k=k)
                out = [
                    {"user": u_, "items": i.tolist(),
                     "scores": [round(float(s), 5) for s in sc]}
                    for u_, i, sc in zip(users, ids, scores)
                ]
                return self._send(200, out[0] if len(out) == 1 else out)
            return self._send(404, {"error": "unknown path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                payload = _json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                return self._send(400, {"error": "bad json"})
            if self.path == "/recommend":
                users = payload.get("users")
                if not isinstance(users, list) or not users:
                    return self._send(400, {"error": "need {'users': [...]}"})
                k = int(payload.get("k", 10))
                if any(not 0 <= int(x) < rec._mask_graph.n_users for x in users):
                    return self._send(400, {"error": "user id out of range"})
                with lock:
                    ids, scores = rec.recommend([int(x) for x in users], k=k)
                return self._send(
                    200,
                    [
                        {"user": int(u_), "items": i.tolist(),
                         "scores": [round(float(s), 5) for s in sc]}
                        for u_, i, sc in zip(users, ids, scores)
                    ],
                )
            if self.path == "/reload":
                ckpt = payload.get("ckpt")
                if not ckpt:
                    return self._send(400, {"error": "need {'ckpt': path}"})
                try:
                    with lock:
                        rec.reload_checkpoint(ckpt)
                except Exception as e:  # surface load errors to the operator
                    return self._send(500, {"error": str(e)})
                return self._send(200, {"ok": True})
            return self._send(404, {"error": "unknown path"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="furusato_recommend_tpu.serve")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--train_edges_only", action="store_true")
    args = ap.parse_args(argv)
    rec = Recommender.from_checkpoint(
        args.ckpt,
        data_path=args.data_path,
        use_inference_edges=not args.train_edges_only,
    )
    srv = make_server(rec, args.host, args.port)
    print(f"serving on http://{args.host}:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
