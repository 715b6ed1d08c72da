"""frodo-slam-tpu: a TPU-native real-time dense monocular SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of frodo-slam
(a MASt3R-SLAM fork with robot VIO extensions):

- Two-view pointmap network (ViT-L encoder + dual cross-attention decoder +
  DPT/desc heads) implemented as pure-functional JAX (``models/``).
- Dense iterative-projective matching and match refinement as TPU kernels
  (``ops/matching.py``).
- Sim(3) Lie-group library and Gauss-Newton trackers/backends compiled to
  single XLA programs (``ops/lie.py``, ``slam/``).
- ASMK retrieval loop closure (``retrieval/``).
- Device-mesh sharding utilities for multi-chip batched pair decoding
  (``parallel/``).

Reference behavior spec: /root/reference (jiaming-ai/frodo-slam); citations in
docstrings use ``file:line`` into that tree.
"""

__version__ = "0.1.0"
