"""Distributed execution: device meshes, sharded matching, distributed
Schur-complement BA, and window-partitioned multi-host BA with pose
consensus.

The reference has no parallel code of any kind (SURVEY §2.5 — verified:
zero threading/multiprocessing/MPI/NCCL imports); this layer is the mapping
BASELINE.json's north star demands, built on jax.sharding + shard_map with
XLA collectives over ICI — no hand-written transport.
"""
