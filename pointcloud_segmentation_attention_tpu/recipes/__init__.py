"""End-to-end recipes exercising the full framework pipeline."""
from pointcloud_segmentation_attention_tpu.recipes.attention_ablation import (  # noqa: F401
    run_attention_ablation,
)
from pointcloud_segmentation_attention_tpu.recipes.context_margin import (  # noqa: F401
    run_context_margin,
)
from pointcloud_segmentation_attention_tpu.recipes.feature_ablation import (  # noqa: F401
    run_feature_ablation,
)
from pointcloud_segmentation_attention_tpu.recipes.family_convergence import (  # noqa: F401
    run_attention_convergence,
    run_attention_net_convergence,
    run_cls_convergence,
    run_extended,
    run_partseg_convergence,
    run_s3dis_convergence,
    run_v1_scannet_convergence,
)
from pointcloud_segmentation_attention_tpu.recipes.synthetic_convergence import (  # noqa: F401
    run_synthetic_convergence,
)
from pointcloud_segmentation_attention_tpu.recipes.zero_precompute import (  # noqa: F401
    run_zero_precompute,
)
