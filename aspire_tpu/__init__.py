"""aspire_tpu: a TPU-native fine-grained scientific-document similarity framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of allenai/aspire
(multi-vector document similarity with textual supervision; NAACL 2022).

Layers (bottom-up):
  core/   -- typed configs, mesh setup, pytree structs.
  text/   -- tokenization & featurization contracts (static-shape batches).
  models/ -- Flax BERT encoder + the document/sentence similarity model zoo.
  ops/    -- pairwise-distance & optimal-transport scoring kernels (XLA + Pallas).
  data/   -- training-example readers & co-citation pipeline tooling.
  train/  -- pjit/shard_map data-parallel trainer, schedules, checkpoints.
  index/  -- sharded multi-vector corpus index build + query serving.
  evaluation/ -- IR metrics, datasets, model registry, eval protocols.
"""

__version__ = "0.1.0"
