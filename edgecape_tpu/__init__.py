"""edgecape_tpu: a TPU-native (JAX/XLA/Pallas) framework for one-/few-shot
category-agnostic keypoint estimation with learned skeleton edge weights.

Re-designed from scratch for TPU after the capabilities of orhir/EdgeCape
(arXiv 2411.16665): frozen DINOv2 ViT-S/14 features, a graph-transformer
keypoint head that predicts continuous skeleton edge weights, and a Markovian
hop-distance attention bias — all as pure-functional JAX with static shapes,
batched episodic evaluation, and data-parallel training over a jax.sharding
Mesh.
"""

__version__ = "0.1.0"
