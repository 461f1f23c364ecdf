"""pointvit_tpu — TPU-native framework for adapting 2D ViTs to 3D point-cloud understanding.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`Irish-77/adapting-2D-ViTs-for-3D-point-cloud-understanding` (reference mounted at
/root/reference), redesigned for TPU:

- ``ops``      — XLA/Pallas compute kernels: farthest-point sampling, kNN grouping,
                 Morton (Z-order) serialization, differentiable point->image splatting.
- ``nn``       — Flax module zoo: ViT blocks (plain / parallel-adapter / serial-adapter),
                 mini-PointNet encoders, progressive point-patch tokenizer, heads.
- ``models``   — the three model families: AdaptPointFormer (APF), Pix4Point,
                 PointCloudRendererClassifier.
- ``data``     — ScanObjectNN + ModelNet40 loaders, numpy augment pipeline, host->device
                 feeding with an HBM-resident fast path.
- ``train``    — a single generic jit'd Trainer plus config-compatible wrappers matching
                 the reference's three trainer APIs.
- ``parallel`` — jax.sharding Mesh construction and batch-data-parallel helpers.
- ``pretrained`` — timm/torchvision checkpoint ingestion into Flax param pytrees
                 (gated on a local weight cache; this environment has no egress).

Everything in the per-step compute path is jit-compiled: tokenization (FPS/kNN/Morton),
rendering, ViT forward, loss, and optimizer update run as one XLA graph on device.
"""

__version__ = "0.1.0"
