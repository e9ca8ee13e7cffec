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



# Headline NMS config. iou_dtype is fp32: tests/test_nms_bf16_iou.py measured
# 10-17% kept-box divergence for bf16 IoU on dense fixtures — far above the
# 0.5% gate — so the bf16-IoU fast path is NOT used for the headline number
# (it remains available via batched_nms(iou_dtype=jnp.bfloat16) for users who
# accept the tradeoff).
#
# nms_top_k=256 (vs the 1024 default): with score_threshold=0.25 every
# candidate below the threshold is inert (cannot suppress, cannot be output),
# so the result is EXACTLY equal to K=1024 whenever the above-threshold
# candidates fit in 256 — on COCO at conf 0.25 real images carry far fewer
# (tests/test_nms.py::test_topk_reduction_exact asserts the equality).
# Measured: 1288 -> 1400 img/s @ b128 on v5e.
#
# scores_are_logits: NMS prefilters on the head's raw logit map and sigmoids
# only the gathered candidates — identical outputs up to ordering within
# exact saturated-score ties (tests/test_ops_nms.py::
# test_logit_scores_bit_identical; caveat documented in ops/nms.py), and the
# full-map fp32 sigmoid is dead-code-eliminated.
HEADLINE_NMS_KWARGS = dict(
    score_threshold=0.25, iou_threshold=0.7, nms_top_k=256, max_predictions=300,
    mode="fast", iou_dtype=jnp.float32, scores_are_logits=True,
)


def build_program(model):
    """Fused predict program: raw uint8 NHWC → NMSOutput, one XLA executable.

    Deploy form mirrors reference fuse_model=True + TRT FP16 engine: QARepVGG
    branches fused to single 3x3 convs, bf16 conv stack, decode + NMS in fp32.
    The /255 standardization is folded into the stem weights and the stem runs
    in space-to-depth form (the 3-channel 3x3 conv uses ~4% of the MXU lanes;
    the bit-equivalent s2d form uses 48 — see yolo_nas.s2d_stem_params).
    """
    from super_gradients_tpu.ops.nms import batched_nms

    module, variables = model._infer_module_and_vars(
        fuse_model=True, bf16=True, stem_s2d=True, input_scale=1.0 / 255.0
    )

    def predict_program(images_u8):
        x = images_u8.astype(jnp.bfloat16)
        out = module.apply(variables, x, train=False)
        return batched_nms(out.pred_bboxes, out.cls_logits, **HEADLINE_NMS_KWARGS)

    from super_gradients_tpu.common.xla_tuning import tuned_jit

    return tuned_jit(predict_program)



def flops_per_call(fn, *args):
    """XLA cost-analysis FLOPs of the compiled program (None if unavailable)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile() if not hasattr(fn, "lower") else fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def peak_tflops():
    """bf16 peak of the attached chip (env-overridable)."""
    if os.environ.get("BENCH_PEAK_TFLOPS"):
        return float(os.environ["BENCH_PEAK_TFLOPS"])
    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0, "v6": 918.0}
    for k, v in table.items():
        if k in kind:
            return v
    return 197.0  # default to v5e


def measure(fn, batch, iters):
    rng = np.random.RandomState(0)
    host = rng.randint(0, 255, size=(batch, IMAGE, IMAGE, 3), dtype=np.uint8)
    images = jnp.asarray(host)
    # warmup / compile (+ hard D2H sync: on the axon relay, block_until_ready
    # alone does not drain the async dispatch queue at low call counts)
    out = fn(images)
    jax.block_until_ready(out)
    np.asarray(out.num_detections)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(images)
    jax.block_until_ready(out)
    np.asarray(out.num_detections)
    dt = time.perf_counter() - t0
    return batch * iters / dt


class _SyntheticCocoDataset:
    """In-memory COCO-like detection dataset for the training bench: random uint8
    images + random boxes, run through the REAL yolo_nas mosaic/affine/HSV train
    transform chain on the host (the pipeline whose cost must hide behind the
    train step)."""

    def __new__(cls, n, input_dim, max_boxes):
        from super_gradients_tpu.training.dataloaders import _yolo_nas_train_transforms
        from super_gradients_tpu.training.datasets import DetectionDataset

        class _DS(DetectionDataset):
            def _setup(self):
                rng = np.random.RandomState(0)
                for _ in range(n):
                    nb = rng.randint(1, 12)
                    wh = rng.randint(320, 640, size=2)
                    xy = rng.rand(nb, 2) * wh * 0.7
                    sz = rng.rand(nb, 2) * wh * 0.25 + 8
                    boxes = np.concatenate([xy, xy + sz], axis=1).astype(np.float32)
                    self._annotations.append({
                        "image": rng.randint(0, 255, (int(wh[1]), int(wh[0]), 3), dtype=np.uint8),
                        "boxes_xyxy": boxes,
                        "labels": rng.randint(0, 80, size=nb).astype(np.int32),
                    })

        return _DS(transforms=_yolo_nas_train_transforms(input_dim), max_boxes=max_boxes,
                   all_classes_list=[str(i) for i in range(80)])


def make_train_step(model, criterion, tx, mixed_precision=True):
    """One jitted train step under the Trainer's bf16 policy (fp32 master
    params/opt/BN buffers, bf16 forward+backward, fp32 loss — see
    training/mixed_precision.py)."""
    import optax

    from super_gradients_tpu.training.mixed_precision import to_bf16, to_f32

    cast_in, cast_out = (to_bf16, to_f32) if mixed_precision else ((lambda t: t), (lambda t: t))

    def loss_fn(p, bs, images, targets):
        out, mut = model.module.apply(
            {"params": cast_in(p), "batch_stats": bs}, cast_in(images), train=True, mutable=["batch_stats"]
        )
        loss, _aux = criterion(cast_out(out), targets)
        return loss, to_f32(mut["batch_stats"])

    def train_step(p, bs, opt, images, targets):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, images, targets)
        updates, new_opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), new_bs, new_opt, loss

    # donate the chained state (params/batch_stats/opt) — measured +2.4% on v5e
    # (512.3 -> 500.4 ms/step at b64); matches the Trainer's donated TrainState
    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def train_bench(batch, image, steps, num_workers, mixed_precision=True):
    """YOLO-NAS-M + PPYoloELoss train-step throughput with the mosaic input
    pipeline on worker processes. Returns (img/s, loader_wait_pct, flops/step)."""
    import optax

    from super_gradients_tpu import models
    from super_gradients_tpu.training.dataloaders import DataLoader
    from super_gradients_tpu.training.losses import get_loss

    model = models.get(MODEL, num_classes=80, image_size=image)
    criterion = get_loss("PPYoloELoss", {"num_classes": 80})
    tx = optax.sgd(1e-4, momentum=0.9)
    variables = model.variables
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)
    train_step = make_train_step(model, criterion, tx, mixed_precision)

    ds = _SyntheticCocoDataset(max(batch * 4, 64), (image, image), 120)
    loader = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=num_workers, prefetch_factor=4)

    it = iter(loader)
    first = next(it)
    imgs = jnp.asarray(first[0], jnp.float32)
    tgts = jnp.asarray(first[1], jnp.float32)
    n_flops = flops_per_call(train_step, params, batch_stats, opt_state, imgs, tgts)
    params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, imgs, tgts)
    jax.block_until_ready(loss)

    # pure-compute floor: same cached batch, no loader in the loop
    t0 = time.perf_counter()
    for _ in range(steps):
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, imgs, tgts)
    jax.block_until_ready(loss)
    compute_s = (time.perf_counter() - t0) / steps

    # end-to-end: batches stream from the mosaic pipeline workers
    done = 0
    t0 = time.perf_counter()
    while done < steps:
        try:
            b = next(it)
        except StopIteration:
            loader.set_epoch(done)
            it = iter(loader)
            b = next(it)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, jnp.asarray(b[0], jnp.float32), jnp.asarray(b[1], jnp.float32))
        done += 1
    jax.block_until_ready(loss)
    wall_s = (time.perf_counter() - t0) / steps
    loader.close()

    wait_pct = max(0.0, (wall_s - compute_s) / wall_s * 100.0)
    return batch / wall_s, wait_pct, n_flops, batch / compute_s


def main():
    from super_gradients_tpu import models

    model = models.get(MODEL, num_classes=80, image_size=IMAGE)
    fn = build_program(model)

    if os.environ.get("BENCH_SWEEP"):
        best_b, best = BATCH, 0.0
        for b in (64, 96, 128, 192, 256):
            v = measure(fn, b, max(8, ITERS // 2))
            print(f"# batch {b}: {v:.1f} img/s", file=sys.stderr)
            if v > best:
                best_b, best = b, v
        batch = best_b
    else:
        batch = BATCH

    imgs_per_s = measure(fn, batch, ITERS)

    result = {
        "metric": f"{MODEL} {IMAGE}px predict images/sec/chip (batch {batch}, fused fwd+decode+NMS)",
        "value": round(imgs_per_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_s / BASELINE, 4),
    }

    # MFU: cost-analysis FLOPs × throughput ÷ chip bf16 peak
    rng = np.random.RandomState(0)
    probe = jnp.asarray(rng.randint(0, 255, size=(batch, IMAGE, IMAGE, 3), dtype=np.uint8))
    fl = flops_per_call(fn, probe)
    if fl:
        achieved = fl / batch * imgs_per_s / 1e12
        result["achieved_tflops"] = round(achieved, 1)
        result["mfu_pct"] = round(achieved / peak_tflops() * 100.0, 1)

    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            # batch 96 = peak of the bf16 train-step sweep on v5e (r5, s2d stem
            # off): b64 150.8 img/s, b80 157.7, b96 157.6 @ 58.3 TF/s, b112/b128
            # fail to compile (VMEM/HBM); b96 amortizes host-loader cost best
            tb, tw = int(os.environ.get("BENCH_TRAIN_BATCH", 96)), int(os.environ.get("BENCH_TRAIN_WORKERS", max(2, (os.cpu_count() or 2) - 1)))
            tsteps = int(os.environ.get("BENCH_TRAIN_STEPS", 10))
            train_mp = os.environ.get("BENCH_TRAIN_MP", "1") != "0"
            t_ips, wait_pct, t_fl, t_compute_ips = train_bench(tb, IMAGE, tsteps, tw, mixed_precision=train_mp)
            result["train_images_per_s"] = round(t_ips, 2)
            result["train_compute_images_per_s"] = round(t_compute_ips, 2)  # step throughput w/o host loader
            result["train_loader_wait_pct"] = round(wait_pct, 1)  # NOTE: 1-vCPU host; mosaic is host-bound here
            result["train_mixed_precision"] = train_mp  # the Trainer's bf16 policy (mixed_precision=True)
            if t_fl:
                result["train_achieved_tflops"] = round(t_fl / tb * t_compute_ips / 1e12, 1)
        except Exception as e:
            print(f"# train bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
