"""End-to-end recipes exercising the full framework pipeline."""
from pointcloud_segmentation_attention_tpu.recipes.synthetic_convergence import (  # noqa: F401
    run_synthetic_convergence,
)
