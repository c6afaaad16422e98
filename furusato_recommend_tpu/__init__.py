"""furusato_recommend_tpu — a TPU-native (JAX/XLA/pjit/Pallas) recommender framework.

A ground-up re-design of the capabilities of `HiromasaYamanishi/furusato_recommend`
(a two-sided user-item recommender over a bipartite interaction graph: MF /
LightGCN-family / GraphSAGE-family / temporal & transformer GNNs / SASRec, trained
with BPR loss and evaluated with full-catalog top-K retrieval metrics), built
TPU-first:

- static-shape padded-CSR graph representation (vs. ragged Python lists),
- on-device vectorized BPR sampling (vs. CPU multiprocessing),
- segment-op graph aggregation + sharded SpMM (vs. torch-scatter / cuSPARSE),
- pjit/shard_map SPMD over a device mesh (vs. NCCL DDP),
- full epochs compiled as one XLA program (lax.scan over minibatches).

Reference layer map: /root/reference — see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
