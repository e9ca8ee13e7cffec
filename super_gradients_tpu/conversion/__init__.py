from super_gradients_tpu.conversion.export import (
    ExportResult,
    export_detection_model,
    export_pose_estimation_model,
    export_segmentation_model,
    load_exported,
)

__all__ = [
    "ExportResult",
    "export_detection_model",
    "export_pose_estimation_model",
    "export_segmentation_model",
    "load_exported",
]
