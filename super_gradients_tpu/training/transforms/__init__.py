from super_gradients_tpu.training.transforms.detection import (  # noqa: F401
    DetectionHSV,
    DetectionHorizontalFlip,
    DetectionMixup,
    DetectionMosaic,
    DetectionPaddedRescale,
    DetectionRandomAffine,
    DetectionSample,
    DetectionStandardize,
    DetectionVerticalFlip,
    ComposeDetectionTransforms,
)
