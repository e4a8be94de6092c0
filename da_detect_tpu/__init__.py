"""da_detect_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of DA-Detect.

DA-Detect (jinlong17/DA-Detect, WACV 2023) is a PyTorch/CUDA domain-adaptive
Faster R-CNN built on maskrcnn-benchmark. This package provides the same
capabilities — two-stage detection (Faster/Mask R-CNN, RetinaNet), image- and
instance-level gradient-reversal domain classifiers, AdvGRL, domain-triplet
metric regularization, COCO-style data/eval, and multi-chip training — built
TPU-first:

* static shapes everywhere (padded boxes + validity masks, fixed image buckets)
* the hot ops (ROIAlign, NMS) expressed as MXU-friendly matmuls / fixpoint
  iterations and Pallas kernels rather than CUDA ports
* one jitted SPMD train step over a ``jax.sharding.Mesh``
* functional model/optimizer state (flax.linen + optax-style), orbax checkpoints
"""

__version__ = "0.1.0"
