"""TPU-native multimodal perception framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
charyyev/efficient_multimodal_perception (camera + LiDAR triplane perception:
self-supervised pretraining + 3-D semantic occupancy / BEV elevation
fine-tuning on nuScenes), designed TPU-first:

* static-shape, channels-last (NHWC) compute throughout,
* pure-functional models (flax.linen) with a single generic trainer,
* XLA-fused gather/scatter ops + Pallas kernels replacing the reference's
  CUDA dependencies (spconv, torch_scatter, torch_geometric, F.grid_sample),
* pjit/shard_map data parallelism over a `jax.sharding.Mesh` instead of NCCL.

Subpackages
-----------
core      pure-jnp geometry (range projection, camera projection, voxel math)
ops       sampling/scatter/neighbor kernels (XLA + Pallas) with numpy oracles
models    flax model components and the five task models
losses    reconstruction / contrastive losses
data      nuScenes infos reader, static-shape batching, synthetic data
parallel  mesh + sharding helpers
train     trainer, optimizer, checkpointing, metrics
configs   python config system mirroring the reference's config names
"""

__version__ = "0.1.0"
