"""gnngls_tpu — TPU-native GNN-guided local search for the TSP.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
proroklab/gnngls (ICLR 2022): a graph-attention model predicts per-edge
*regret* over the line graph of K_n, and a vectorized Guided Local Search
consumes the predictions to solve TSP instances.

Subpackages:
  core      static K_n line-graph topology, feature scalers
  ops       GAT message passing (city-group MXU formulation + Pallas), norms
  models    the edge-regret model family + torch checkpoint import
  search    fixed-shape 2-opt / relocate operators, local search, GLS (vmap)
  data      instance generation, exact/heuristic label oracles, datasets
  train     jitted train step, loops, checkpoints
  parallel  device-mesh sharding (data-parallel training, sharded eval)
  utils     host-side tour utilities
  cli       reference-compatible command-line entry points
"""

from .utils import is_equivalent_tour, is_valid_tour, tour_cost, tour_to_edge_vector

__version__ = "0.1.0"
