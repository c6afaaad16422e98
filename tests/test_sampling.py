"""BPR sampler correctness + distribution tests (replacement for the reference's
unbounded CPU rejection loop, /root/reference/negative_sample.py:98-134)."""

import jax
import numpy as np

from furusato_recommend_tpu.sampling.bpr import sample_bpr
from furusato_recommend_tpu.sampling.weights import (
    capped_positive_edge_weights,
    edge_alias_from_weights,
    negative_alias,
    popularity_negative_weights,
)


def test_positives_are_positives_negatives_are_not(tiny_dataset, tiny_graph):
    batch = sample_bpr(jax.random.PRNGKey(0), tiny_graph, 4096)
    ap = tiny_dataset.all_pos()
    u = np.asarray(batch.user)
    p = np.asarray(batch.pos)
    n = np.asarray(batch.neg)
    v = np.asarray(batch.valid)
    assert v.all()  # every user in the synthetic set has positives
    for uu, pp, nn in zip(u[:500], p[:500], n[:500]):
        assert pp in ap[uu]
        assert nn not in ap[uu]


def test_user_and_positive_distribution(tiny_graph):
    # users uniform; positive uniform within a user's row
    batch = sample_bpr(jax.random.PRNGKey(1), tiny_graph, 60000)
    u = np.asarray(batch.user)
    freq = np.bincount(u, minlength=tiny_graph.n_users) / len(u)
    np.testing.assert_allclose(freq, 1.0 / tiny_graph.n_users, atol=0.004)


def test_zero_degree_users_masked():
    from furusato_recommend_tpu.data.graph import build_bipartite_graph

    # user 1 has no train interactions
    g = build_bipartite_graph(
        np.array([0, 0, 2]), np.array([0, 1, 2]), np.array([1]), np.array([0]), 3, 4
    )
    batch = sample_bpr(jax.random.PRNGKey(2), g, 3000)
    u = np.asarray(batch.user)
    v = np.asarray(batch.valid)
    assert not v[u == 1].any()
    assert v[u != 1].all()


def test_edge_alias_positive_cap(tiny_dataset, tiny_graph):
    # keep the cap feasible: sum of caps must exceed total draws
    n_draws = 15000
    w = capped_positive_edge_weights(tiny_dataset, n_draws, positive_num_limit=150)
    alias = edge_alias_from_weights(w)
    batch = sample_bpr(jax.random.PRNGKey(3), tiny_graph, n_draws, edge_alias=alias)
    p = np.asarray(batch.pos)
    u = np.asarray(batch.user)
    ap = tiny_dataset.all_pos()
    for uu, pp in zip(u[:300], p[:300]):
        assert pp in ap[uu]
    counts = np.bincount(p, minlength=tiny_dataset.m_items)
    # expected counts capped at limit; allow sampling noise
    assert counts.max() <= 150 * 1.35


def test_negative_popularity_distribution(tiny_dataset, tiny_graph):
    alias = negative_alias(tiny_dataset, negative_pow=0.5)
    batch = sample_bpr(jax.random.PRNGKey(4), tiny_graph, 50000, neg_alias=alias)
    n = np.asarray(batch.neg)
    freq = np.bincount(n, minlength=tiny_dataset.m_items).astype(float)
    w = popularity_negative_weights(tiny_dataset, 0.5)
    # negatives are drawn from pop^0.5 then filtered by non-membership; compare
    # rank correlation rather than exact proportions
    top = np.argsort(w)[-20:]
    bottom = np.argsort(w)[:20]
    assert freq[top].mean() > freq[bottom].mean()


def test_rejection_bias_bound(tiny_dataset, tiny_graph):
    """The bounded K-candidate scheme must match the reference's exact rejection
    distribution to within sampling noise (SURVEY.md §7.3 statistical parity)."""
    batch = sample_bpr(jax.random.PRNGKey(5), tiny_graph, 80000)
    n = np.asarray(batch.neg)
    u = np.asarray(batch.user)
    ap = tiny_dataset.all_pos()
    # exact conditional distribution: uniform over non-positives of each user.
    # Check marginal: for the globally most popular item i, P(neg=i) =
    # mean_u [u not pos of i]/(m - deg_u). Compare empirical vs exact.
    m = tiny_dataset.m_items
    deg = np.array([len(a) for a in ap])
    pop_item = int(np.argmax(tiny_dataset.item_occurrence()))
    has = np.zeros(tiny_dataset.n_users, bool)
    for uu in range(tiny_dataset.n_users):
        has[uu] = pop_item in ap[uu]
    p_exact = np.mean(np.where(has, 0.0, 1.0 / (m - deg)))
    p_emp = np.mean(n == pop_item)
    assert abs(p_emp - p_exact) < 5 * np.sqrt(p_exact / len(n)) + 1e-4
