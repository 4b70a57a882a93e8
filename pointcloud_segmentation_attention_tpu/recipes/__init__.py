"""End-to-end recipes exercising the full framework pipeline."""
from pointcloud_segmentation_attention_tpu.recipes.family_convergence import (  # noqa: F401
    run_attention_convergence,
    run_cls_convergence,
    run_partseg_convergence,
    run_s3dis_convergence,
)
from pointcloud_segmentation_attention_tpu.recipes.synthetic_convergence import (  # noqa: F401
    run_synthetic_convergence,
)
