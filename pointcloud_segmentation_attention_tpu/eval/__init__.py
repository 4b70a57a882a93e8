"""Evaluation: full-scene stitched prediction, benchmark export, IoU evaluators."""
from pointcloud_segmentation_attention_tpu.eval.full_scene import (
    generate_predictions,
    predict_scene_chunks,
)
from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
    ResidentSceneServer,
    deterministic_scene_chunks,
    generate_predictions_resident,
)
from pointcloud_segmentation_attention_tpu.eval.benchmark import (
    CLASS_LABELS,
    VALID_CLASS_IDS,
    evaluate,
    export_benchmark_txt,
    export_groundtruth_from_json,
    export_ids,
    load_ids,
    map_to_nyu40_for_benchmark,
)
from pointcloud_segmentation_attention_tpu.eval.voting import (
    evaluate_classification,
    evaluate_part_segmentation,
    vote_predict,
    vote_predict_partseg,
)
from pointcloud_segmentation_attention_tpu.eval.part_iou import (
    SEG_CLASSES,
    PartIoUAccumulator,
    restrict_logits_to_category,
    shape_iou,
)

__all__ = [
    "generate_predictions", "predict_scene_chunks",
    "ResidentSceneServer", "deterministic_scene_chunks",
    "generate_predictions_resident",
    "CLASS_LABELS", "VALID_CLASS_IDS", "evaluate", "export_benchmark_txt",
    "export_groundtruth_from_json", "export_ids", "load_ids",
    "map_to_nyu40_for_benchmark",
    "evaluate_classification", "vote_predict",
    "SEG_CLASSES", "PartIoUAccumulator", "restrict_logits_to_category", "shape_iou",
]
