"""TPU-native two-stage object detection (Faster R-CNN) framework.

A brand-new JAX / XLA / Pallas implementation with the capabilities of the
PyTorch reference ``3SAILab/two_stage_object_detection``: HarDNet / ResNet
backbones, an anchor-based Region Proposal Network, an RoI classification /
regression head, COCO-format data ingest with joint image/box augmentation,
anchor- and proposal-target assignment, smooth-L1 + cross-entropy training
losses, mAP evaluation, checkpoint/resume, and visualised inference.

Everything is shape-static and batch-vectorised so the whole
image -> detections path compiles to a single XLA graph per step; the
proposal hot path (anchor grid, box decode, IoU, score-sorted padded NMS,
RoI pooling) has Pallas TPU kernels, and training scales over a
``jax.sharding.Mesh`` with data parallelism.
"""

__version__ = "0.1.0"

from two_stage_object_detection_tpu.config import Config, load_config  # noqa: F401
