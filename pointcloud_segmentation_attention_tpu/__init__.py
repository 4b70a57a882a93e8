"""pointcloud_segmentation_attention_tpu — a TPU-native point-cloud segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tpfeifle/pointcloud-segmentation-attention (PointNet++ with attention-based
neighborhood aggregation on ScanNet), built TPU-first:

- ``ops``      — geometry kernels (farthest point sampling, ball query, grouping,
                 3-NN interpolation) as pure-XLA primitives plus Pallas TPU kernels.
- ``nn``       — set-abstraction / feature-propagation modules, shared MLPs,
                 scheduled-momentum BatchNorm, group-attention pooling layers.
- ``models``   — the model zoo (semantic seg, classification SSG/MSG, part seg,
                 PointNet v1 family) as configs over shared skeletons.
- ``data``     — host-side numpy pipelines: ScanNet chunk sampling / precompute /
                 full-scene chunking, ModelNet + ShapeNet-Part loaders, augmentations.
- ``parallel`` — device-mesh utilities: data-parallel pjit/shard_map training,
                 sharded full-scene inference.
- ``train``    — jitted train/eval steps, losses, streaming mIoU, schedules,
                 checkpointing.
- ``eval``     — full-scene stitched prediction, ScanNet benchmark export,
                 confusion-matrix IoU evaluator, voting classification eval.
- ``utils``    — config system, logging, profiling, point-cloud utilities.
- ``viz``      — headless visualization (colored PLY export, metric curves).
"""

__version__ = "0.1.0"
