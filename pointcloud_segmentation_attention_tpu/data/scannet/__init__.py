"""ScanNet v2 pipeline: scene store, label map, chunkers, precompute, eval
streams, PLY preprocessing, and the upstream-v1-compat dataset classes.

This is the framework equivalent of ``attention_points/scannet_dataset/``
(the reference project's core data deliverable) plus
``pointnet2_tensorflow/scannet/scannet_dataset.py`` (v1 compat).
"""
from pointcloud_segmentation_attention_tpu.data.scannet import (  # noqa: F401
    chunks,
    precompute,
    preprocessing,
    scenes,
    v1_compat,
)
from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (  # noqa: F401
    ChunkSet,
    full_scene_chunks,
    grid_chunks_for_eval,
    map_back,
    random_z_rotation,
    sample_random_chunk,
)
from pointcloud_segmentation_attention_tpu.data.scannet.label_map import (  # noqa: F401
    INVERSE_LABEL_MAP,
    LABEL_MAP,
    REFERENCE_LABEL_COUNTS,
    TRAIN_LABEL_WEIGHTS,
    VALID_CLASS_IDS_NYU40,
    compute_class_weights,
    map_labels,
    map_to_nyu40,
)
from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (  # noqa: F401
    load_scene,
    load_scene_mapped,
    make_synthetic_scene,
    official_splits_dir,
    read_split,
    save_scene,
    write_split,
    write_synthetic_dataset,
)
