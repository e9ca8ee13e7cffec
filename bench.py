"""Benchmark: YOLO-NAS-M 640px COCO predict() throughput (images/sec/chip).

Driver contract: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Baseline (BASELINE.md north star): ≥ 2× A100-TensorRT images/sec/chip. Published A100
TRT FP16 batch-throughput for YOLO-NAS-M ≈ 640 img/s (extrapolated from T4 5.85 ms/img
b1 and Deci's A100 claims); we report vs_baseline = ours / (2 × 640).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 128))  # throughput peak of the b∈{64,96,128,192,256} sweep
IMAGE = int(os.environ.get("BENCH_IMAGE", 640))
MODEL = os.environ.get("BENCH_MODEL", "yolo_nas_m")
ITERS = int(os.environ.get("BENCH_ITERS", 30))
A100_TRT_IMG_PER_S = 640.0  # published-extrapolated reference throughput
BASELINE = 2.0 * A100_TRT_IMG_PER_S


def main():
    from super_gradients_tpu import models
    from super_gradients_tpu.ops.nms import batched_nms
    from super_gradients_tpu.ops.preprocess import standardize

    model = models.get(MODEL, num_classes=80, image_size=IMAGE)
    # deploy form: QARepVGG branches fused to single 3x3 convs, bf16 conv stack
    # (decode + NMS in fp32) — mirrors reference fuse_model=True + TRT FP16 engine
    module, variables = model._infer_module_and_vars(fuse_model=True, bf16=True)

    def predict_program(images_u8):
        x = standardize(images_u8).astype(jnp.bfloat16)
        out = module.apply(variables, x, train=False)
        return batched_nms(
            out.pred_bboxes.astype(jnp.float32), out.pred_scores.astype(jnp.float32),
            score_threshold=0.25, iou_threshold=0.7,
            nms_top_k=1024, max_predictions=300, mode="fast",
        )

    fn = jax.jit(predict_program)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, size=(BATCH, IMAGE, IMAGE, 3), dtype=np.uint8))

    # warmup / compile (+ hard D2H sync: on the axon relay, block_until_ready
    # alone does not drain the async dispatch queue at low call counts)
    out = fn(images)
    jax.block_until_ready(out)
    np.asarray(out.num_detections)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(images)
    jax.block_until_ready(out)
    np.asarray(out.num_detections)
    dt = time.perf_counter() - t0

    imgs_per_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"{MODEL} {IMAGE}px predict images/sec/chip (batch {BATCH}, fused fwd+decode+NMS)",
                "value": round(imgs_per_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(imgs_per_s / BASELINE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
