"""Static-shape feature store for the SAGE/TextSAGE model family.

The reference loads per-entity feature artifacts ad hoc inside each model's
``__init__`` (`/root/reference/model/textsage.py:86-220`): numeric counter
matrices (.npy), padded categorical id matrices (.npy), word2vec embeddings,
sentence-transformer embeddings, and scipy CSR count-vectorizer text matrices
(.pkl) whose nonzero *columns* (distinct word ids — values are ignored by the
scatter-mean, `/root/reference/model/textsage.py:247-261`) feed a learned word
embedding bag.

TPU re-design: every feature is a dense static-shape device array —

- numeric  [N, Fn] float32
- categorical [N, Fc] int32 (already padded in the reference artifacts; the mean
  over fields deliberately includes pad slots for exact parity,
  `/root/reference/model/textsage.py:306-307`)
- word2vec [N, 300], sentence [N, 768], bert [N, Db] float32
- text: per field, padded distinct-word-id matrix [N, W] int32 with -1 padding
  (the TPU replacement for ragged CSR rows; W caps the words per entity with a
  documented truncation policy, SURVEY.md §7.3)

plus optional per-edge arrays (timestamps for the temporal models, relation
labels for RSAGE) aligned with the user_pos CSR edge order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .dataset import Dataset

__all__ = [
    "SideFeatures",
    "FeatureStore",
    "synthetic_features",
    "informative_synthetic_features",
    "pad_text_rows",
    "load_reference_features",
    "load_attribute_coos",
    "load_relation_edges",
]

#: projection input dims per feature flag (reference proj_dim map,
#: /root/reference/model/textsage.py:170-175); 't' is 3 bags of d/2 and 'r' one
#: extra bag of d/2.
WORD2VEC_DIM = 300
SENTENCE_DIM = 768
BERT_DIM = 768
TEXT_FIELDS = 3  # name, main_comment, main_list_comment


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SideFeatures:
    """Features for one side (users or items). Unused ones are None."""

    numeric: Optional[jnp.ndarray] = None  # [N, Fn] f32
    categorical: Optional[jnp.ndarray] = None  # [N, Fc] i32
    word2vec: Optional[jnp.ndarray] = None  # [N, 300] f32
    sentence: Optional[jnp.ndarray] = None  # [N, 768] f32
    bert: Optional[jnp.ndarray] = None  # [N, Db] f32
    text: Optional[jnp.ndarray] = None  # [N, TEXT_FIELDS(+1 review), W] i32, -1 pad

    @property
    def n_entities(self) -> int:
        for a in (self.numeric, self.categorical, self.word2vec, self.sentence, self.bert, self.text):
            if a is not None:
                return a.shape[0]
        raise ValueError("empty SideFeatures")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FeatureStore:
    user: SideFeatures
    item: SideFeatures
    # static vocab sizes (python ints -> static for XLA)
    user_cat_vocab: int = field(metadata=dict(static=True), default=0)
    item_cat_vocab: int = field(metadata=dict(static=True), default=0)
    text_vocab: int = field(metadata=dict(static=True), default=0)
    n_relations: int = field(metadata=dict(static=True), default=0)
    # optional per-edge data, aligned with BipartiteGraph.user_pos edge order
    edge_time: Optional[jnp.ndarray] = None  # [E] f32 purchase timestamps
    edge_label: Optional[jnp.ndarray] = None  # [E] i32 relation ids (rsage)


def pad_text_rows(rows, width: int) -> np.ndarray:
    """Ragged distinct-word-id rows -> [N, width] int32, -1 padded, truncating
    rows longer than width (truncation keeps the first ids)."""
    out = np.full((len(rows), width), -1, dtype=np.int32)
    for i, r in enumerate(rows):
        r = np.asarray(r, dtype=np.int32)[:width]
        out[i, : len(r)] = r
    return out


def text_from_scipy_csr(mat, width: int) -> np.ndarray:
    """scipy CSR count matrix -> padded distinct-word-id rows (values ignored,
    matching the reference's COO scatter which ignores counts)."""
    rows = [mat.indices[mat.indptr[i] : mat.indptr[i + 1]] for i in range(mat.shape[0])]
    return pad_text_rows(rows, width)


def synthetic_features(
    dataset: Dataset,
    config: Config,
    seed: int = 0,
    n_numeric_user: int = 24,
    n_numeric_item: int = 16,
    n_cat_fields_user: int = 4,
    n_cat_fields_item: int = 5,
    cat_vocab_user: int = 40,
    cat_vocab_item: int = 60,
    text_vocab: int = 500,
    text_width: int = 12,
    with_edge_time: bool = False,
    with_edge_label: bool = False,
    n_relations: int = 3,
) -> FeatureStore:
    """Deterministic synthetic feature artifacts shaped like the reference's
    (for tests/bench; the real pipeline writes identical shapes from
    preprocessing/)."""
    rng = np.random.default_rng(seed)
    nu, mi = dataset.n_users, dataset.m_items
    E = dataset.train_size

    def side(n, fn, fc, vocab):
        n_fields = TEXT_FIELDS + (1 if (n == mi and "r" in config.item_feature) else 0)
        text = np.full((n, n_fields, text_width), -1, dtype=np.int32)
        for i in range(n):
            for f in range(n_fields):
                k = rng.integers(1, text_width)
                text[i, f, :k] = rng.choice(text_vocab, size=k, replace=False)
        return SideFeatures(
            numeric=jnp.asarray(rng.random((n, fn)).astype(np.float32)),
            categorical=jnp.asarray(rng.integers(0, vocab, (n, fc)).astype(np.int32)),
            word2vec=jnp.asarray(
                (rng.standard_normal((n, WORD2VEC_DIM)) * 0.1).astype(np.float32)
            ),
            sentence=jnp.asarray(
                (rng.standard_normal((n, SENTENCE_DIM)) * 0.1).astype(np.float32)
            ),
            bert=jnp.asarray((rng.standard_normal((n, BERT_DIM)) * 0.1).astype(np.float32)),
            text=jnp.asarray(text),
        )

    return FeatureStore(
        user=side(nu, n_numeric_user, n_cat_fields_user, cat_vocab_user),
        item=side(mi, n_numeric_item, n_cat_fields_item, cat_vocab_item),
        user_cat_vocab=cat_vocab_user,
        item_cat_vocab=cat_vocab_item,
        text_vocab=text_vocab,
        n_relations=n_relations if with_edge_label else 0,
        edge_time=jnp.asarray(rng.random(E).astype(np.float32)) if with_edge_time else None,
        edge_label=jnp.asarray(rng.integers(0, n_relations, E).astype(np.int32))
        if with_edge_label
        else None,
    )


def informative_synthetic_features(
    dataset: Dataset,
    config: Config,
    dataset_seed: int = 0,
    rank: int = 16,
    seed: int = 1,
    n_numeric_user: int = 24,
    n_numeric_item: int = 16,
    n_cat_fields_user: int = 4,
    n_cat_fields_item: int = 5,
    n_clusters: int = 32,
    tokens_per_cluster: int = 10,
    text_vocab: int = 500,
    text_width: int = 12,
    numeric_noise: float = 0.15,
    w2v_noise: float = 0.3,
    cluster_fidelity: float = 0.85,
) -> FeatureStore:
    """Synthetic feature artifacts that CARRY the dataset's latent signal.

    ``synthetic_features`` draws everything i.i.d. — noise w.r.t. the latent
    structure of ``synthetic_structured_dataset`` — so a feature-only model
    (the reference flagship TextSAGE has NO free id embeddings,
    `/root/reference/model/textsage.py:291-352`: node vectors are built purely
    from feature projections + graph conv) can at best track popularity on it.
    Here every modality is a noisy view of the ground-truth latents U/V
    (regenerated via ``structured_latents(dataset_seed)``):

    - numeric [N, Fn]: first ``rank`` columns are the latent coordinates
      (scaled, + ``numeric_noise`` i.i.d. noise); remaining columns pure noise
      (the linear projection must select the informative ones).
    - word2vec/sentence/bert: latents through a fixed random linear map to the
      artifact width + noise — linearly decodable, like real text embeddings.
    - text: entities are soft-clustered by latent direction against a SHARED
      user/item centroid set; cluster ``c`` owns the token band
      ``[c*tokens_per_cluster, (c+1)*tokens_per_cluster)``. Each field draws
      most tokens (``cluster_fidelity``) from the entity's own band, the rest
      uniformly — so the learned word-embedding bag can align users with the
      items they will like purely through shared token bands.
    - categorical: per-field cluster ids under field-specific centroid sets
      (vocab = ``n_clusters``).

    Same shapes/dtypes/ranges as ``synthetic_features`` so both the TPU model
    and the clean-room torch oracle (tests/torch_oracle.py::np_feats) consume
    either interchangeably — the informative-vs-noise comparison is a pure
    feature ablation.
    """
    from .dataset import structured_latents

    rng = np.random.default_rng(seed + 7_777_777)
    nu, mi = dataset.n_users, dataset.m_items
    U, V = structured_latents(nu, mi, rank=rank, seed=dataset_seed)
    # unit-normalize for cluster geometry; keep raw for numeric columns
    Un = U / np.linalg.norm(U, axis=1, keepdims=True)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    centroids = rng.standard_normal((n_clusters, rank)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    def dense_view(lat, width, noise):
        R = rng.standard_normal((rank, width)).astype(np.float32) / np.sqrt(rank)
        return (lat @ R + noise * rng.standard_normal((lat.shape[0], width)).astype(np.float32))

    def side(lat, latn, fn, fc):
        n = lat.shape[0]
        numeric = numeric_noise * rng.standard_normal((n, fn)).astype(np.float32)
        numeric[:, :rank] += 0.5 * lat
        cluster = np.argmax(latn @ centroids.T, axis=1)  # [n]
        n_fields = TEXT_FIELDS + (
            1 if (n == mi and "r" in config.item_feature) else 0
        )
        text = np.full((n, n_fields, text_width), -1, dtype=np.int32)
        band0 = cluster * tokens_per_cluster
        for i in range(n):
            for f in range(n_fields):
                k = int(rng.integers(3, text_width))
                own = rng.random(k) < cluster_fidelity
                toks = np.where(
                    own,
                    band0[i] + rng.integers(0, tokens_per_cluster, size=k),
                    rng.integers(0, text_vocab, size=k),
                )
                text[i, f, : len(np.unique(toks))] = np.unique(toks)
        cat = np.empty((n, fc), dtype=np.int32)
        for f in range(fc):
            cf = rng.standard_normal((n_clusters, rank)).astype(np.float32)
            cat[:, f] = np.argmax(latn @ cf.T, axis=1)
        return SideFeatures(
            numeric=jnp.asarray(numeric),
            categorical=jnp.asarray(cat),
            word2vec=jnp.asarray(dense_view(lat, WORD2VEC_DIM, w2v_noise)),
            sentence=jnp.asarray(dense_view(lat, SENTENCE_DIM, w2v_noise)),
            bert=jnp.asarray(dense_view(lat, BERT_DIM, w2v_noise)),
            text=jnp.asarray(text),
        )

    assert n_clusters * tokens_per_cluster <= text_vocab
    return FeatureStore(
        user=side(U, Un, n_numeric_user, n_cat_fields_user),
        item=side(V, Vn, n_numeric_item, n_cat_fields_item),
        user_cat_vocab=n_clusters,
        item_cat_vocab=n_clusters,
        text_vocab=text_vocab,
    )


def numeric_artifact_paths(config: Config, base_path: str) -> Dict[str, str]:
    """On-disk numeric artifact path per side needing the 'n' flag — for the
    out-of-core (dask) loader, which memmaps these instead of uploading them
    (`/root/reference/model/textsage_dask.py:117-119`)."""
    from pathlib import Path

    sfx = config.suffix
    cb = Path(base_path) / "cb" / sfx if sfx else Path(base_path) / "cb"
    out: Dict[str, str] = {}
    if "n" in config.user_feature:
        out["user"] = str(cb / f"user_numeric_feature{sfx}.npy")
    if "n" in config.item_feature:
        out["item"] = str(cb / f"product_numeric_feature{sfx}.npy")
    return out


def load_reference_features(
    config: Config,
    base_path: str,
    dataset: Optional[Dataset] = None,
    skip_numeric: bool = False,
) -> FeatureStore:
    """Load the reference's on-disk artifacts (SURVEY.md §2.5 outputs):
    ``customer_feature_pad{sfx}.npy``, ``product_feature_pad{sfx}.npy``,
    ``user_text_emb{sfx}.npy``, ``product_text_emb{sfx}.npy``,
    ``*_numeric_feature{sfx}.npy``, ``product_sentence_emb{sfx}.npy``, the
    ``*_count{sfx}.pkl`` scipy CSR text matrices
    (`/root/reference/model/textsage.py:86-220` path scheme), DeBERTa
    embeddings for the 'b' flag
    (``text/{sfx}/{customer,product}_deberta_feature{sfx}.pt``,
    `/root/reference/model/mrec.py:154-157`), and — when ``dataset`` is given —
    per-edge purchase timestamps from ``cf/buy_timestamp{sfx}.pkl``
    (`/root/reference/model/tgsrec.py:105-106`), aligned to the user-CSR edge
    order the temporal convs expect."""
    import pickle
    from pathlib import Path

    sfx = config.suffix
    cb = Path(base_path) / "cb" / sfx if sfx else Path(base_path) / "cb"
    tx = Path(base_path) / "text" / sfx if sfx else Path(base_path) / "text"
    cf = Path(base_path) / "cf"

    def np_load(p):
        return np.load(p, allow_pickle=True)

    def pkl_load(p):
        with open(p, "rb") as f:
            return pickle.load(f)

    def pt_load(p):
        import torch

        t = torch.load(p, map_location="cpu", weights_only=False)
        return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)

    uf, itf = config.user_feature, config.item_feature
    text_width = 64

    def side_text(prefix, extra_review=False):
        fields = ["name", "main_comment", "main_list_comment"]
        mats = [pkl_load(tx / f"{prefix}_{f}_count{sfx}.pkl") for f in fields]
        if extra_review:
            mats.append(pkl_load(tx / f"product_review{sfx}.pkl"))
        padded = [text_from_scipy_csr(m, text_width) for m in mats]
        return np.stack(padded, axis=1), mats[0].shape[1]

    # only load what the configured feature sets require (a missing artifact
    # for an unused flag must not block training)
    user_cat = (
        np_load(cb / f"customer_feature_pad{sfx}.npy").astype(np.int32) if "c" in uf else None
    )
    item_cat = (
        np_load(cb / f"product_feature_pad{sfx}.npy").astype(np.int32) if "c" in itf else None
    )
    vocab = 0
    user_text = item_text = None
    if "t" in uf:
        user_text, vocab = side_text("user")
    if "t" in itf or "r" in itf:
        item_text, vocab = side_text("product", extra_review="r" in itf)

    user = SideFeatures(
        numeric=jnp.asarray(np_load(cb / f"user_numeric_feature{sfx}.npy"), jnp.float32)
        if "n" in uf and not skip_numeric
        else None,
        categorical=None if user_cat is None else jnp.asarray(user_cat),
        word2vec=jnp.asarray(np_load(tx / f"user_text_emb{sfx}.npy"), jnp.float32)
        if "w" in uf
        else None,
        bert=jnp.asarray(pt_load(tx / f"customer_deberta_feature{sfx}.pt"), jnp.float32)
        if "b" in uf
        else None,
        text=None if user_text is None else jnp.asarray(user_text),
    )
    item = SideFeatures(
        numeric=jnp.asarray(np_load(cb / f"product_numeric_feature{sfx}.npy"), jnp.float32)
        if "n" in itf and not skip_numeric
        else None,
        categorical=None if item_cat is None else jnp.asarray(item_cat),
        word2vec=jnp.asarray(np_load(tx / f"product_text_emb{sfx}.npy"), jnp.float32)
        if "w" in itf
        else None,
        sentence=jnp.asarray(np_load(cb / f"product_sentence_emb{sfx}.npy"), jnp.float32)
        if "s" in itf
        else None,
        bert=jnp.asarray(pt_load(tx / f"product_deberta_feature{sfx}.pt"), jnp.float32)
        if "b" in itf
        else None,
        text=None if item_text is None else jnp.asarray(item_text),
    )

    # per-edge purchase timestamps (tgsrec/sasgnn): buy_timestamp{sfx}.pkl is a
    # (n_users x m_items)-indexable sparse matrix in the reference
    # (`/root/reference/model/tgsrec.py:339-342` mat[user, item] lookups) — or a
    # flat [E] array in raw interaction order; both land as [E] user-CSR-ordered
    edge_time = None
    ts_path = cf / f"buy_timestamp{sfx}.pkl"
    if config.model in ("tgsrec", "sasgnn") and ts_path.exists():
        if dataset is None:
            raise ValueError(
                f"{config.model} needs dataset= to align {ts_path} to edge order"
            )
        ts = pkl_load(ts_path)
        tu, ti = dataset.train_user, dataset.train_item
        if hasattr(ts, "toarray") or hasattr(ts, "tocsr"):  # scipy sparse
            ts = ts.tocsr()
            raw = np.asarray(ts[tu, ti]).reshape(-1).astype(np.float32)
        else:
            raw = np.asarray(ts, dtype=np.float32).reshape(-1)
            if raw.shape[0] != len(tu):
                raise ValueError(
                    f"buy_timestamp length {raw.shape[0]} != train edges {len(tu)}"
                )
        order = np.lexsort((ti, tu))  # raw COO -> user-CSR edge order
        edge_time = jnp.asarray(raw[order])

    return FeatureStore(
        user=user,
        item=item,
        user_cat_vocab=0 if user_cat is None else int(user_cat.max()) + 1,
        item_cat_vocab=0 if item_cat is None else int(item_cat.max()) + 1,
        text_vocab=vocab,
        edge_time=edge_time,
    )


def load_attribute_coos(config: Config, base_path: str):
    """ASAGE attribute tensors (``attribute/{user,product}_attribute{sfx}.pt``,
    `/root/reference/model/asage.py:55-79`): [2, nnz] (entity, attribute) COO
    index pairs. Returns {"user_attr": (rows, cols, n, n_attrs), "item_attr":
    ...} kwargs for ASAGE, or None if the artifacts are absent (ASAGE then
    derives attribute graphs from the categorical features)."""
    from pathlib import Path

    import torch

    sfx = config.suffix
    at = Path(base_path) / "attribute"
    up = at / f"user_attribute{sfx}.pt"
    ip = at / f"product_attribute{sfx}.pt"
    if not (up.exists() and ip.exists()):
        return None

    def coo(p):
        t = torch.load(p, map_location="cpu", weights_only=False)
        arr = np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)
        rows, cols = arr[0].astype(np.int64), arr[1].astype(np.int64)
        return rows, cols, int(rows.max()) + 1, int(cols.max()) + 1

    return {"user_attr": coo(up), "item_attr": coo(ip)}


def load_relation_edges(config: Config, base_path: str):
    """RSAGE extra relation edge sets (``favorite_train{sfx}.csv``,
    ``review_train{sfx}.csv`` with cf_customer/cf_product columns,
    `/root/reference/model/rsage.py:168-187`). Returns [(u, i), ...] in label
    order (favorite=1, review=2) or None if absent."""
    from pathlib import Path

    import pandas as pd

    sfx = config.suffix
    base = Path(base_path)
    out = []
    for name in ("favorite_train", "review_train"):
        p = base / f"{name}{sfx}.csv"
        if not p.exists():
            return None
        df = pd.read_csv(p)
        out.append(
            (
                df["cf_customer"].values.astype(np.int64),
                df["cf_product"].values.astype(np.int64),
            )
        )
    return out
