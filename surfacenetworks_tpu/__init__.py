"""surfacenetworks_tpu — a TPU-native mesh-GNN framework (Surface Networks family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch+CUDA implementation of "Surface Networks" (Kostrikov, Jiang, Panozzo,
Zorin, Bruna — CVPR 2018):

* ``geometry``  — host-side mesh I/O and operator construction (cotangent
  Laplacian, quaternionic Dirac), vectorized NumPy (replaces libigl + the
  per-face Python loops of the reference ``src/utils/mesh.py``).
* ``sparse``    — static-shape padded-ELL sparse operators with XLA and Pallas
  SpMM kernels and transpose-operator custom VJPs (replaces the reference's
  NVRTC-compiled CUDA ``sparse_bmm``/``batch_csr`` kernels).
* ``nn``        — the op library: GraphConv1x1, graph batch-norm, masked global
  average, Lap/Dirac/Avg/Mlp residual blocks (reference ``src/utils/utils_pt.py``).
* ``models``    — per-task model zoos: normal prediction, mesh-MNIST
  classification + VAE, ARAP temporal prediction, FAUST dense correspondence.
* ``data``      — bucketed static-shape padded batching with masks.
* ``train``     — jit-compiled train steps, optimizers, checkpointing, metrics.
* ``dist``      — device-mesh data parallelism and edge-partitioned operator
  sharding with halo exchange (no reference analogue; TPU-native scale-out).
* ``serve``     — ahead-of-time StableHLO export (jax.export) for deployment
  without the model code (no reference analogue).
"""

__version__ = "0.1.0"

from surfacenetworks_tpu import geometry, sparse  # noqa: F401
