"""vit-search-tpu: a TPU-native (JAX/XLA/Pallas/pjit) re-design of ViT-ResNAS.

Capability parity with the reference PyTorch implementation of
"Searching for Efficient Multi-Stage Vision Transformers" (yilunliao/vit-search),
re-architected for TPUs:

- Architectures are immutable ``network_def`` PyTrees (``vit_search_tpu.arch``).
- Weight-sharing supernets mask statically-padded super-dimensions with
  per-sub-batch channel masks carried as *data*, so multi-architecture
  sampling never retraces XLA (``vit_search_tpu.ops``, ``vit_search_tpu.models``).
- Training/eval steps are pure functions compiled once with ``jax.jit``/``pjit``
  over a device mesh; data parallelism is a mesh axis, not a process group
  (``vit_search_tpu.train``, ``vit_search_tpu.parallel``).
- Evolutionary NAS scores candidate populations as batched masked evaluation
  of the supernet (``vit_search_tpu.search``).

Layer map mirrors SURVEY.md section 1 of the reference analysis.
"""

__version__ = "0.1.0"
