"""Shared helpers for full-model forward-parity goldens vs the reference PyTorch code.

Each parity test builds the ACTUAL reference model class (loaded standalone via
``ref_loader``), randomizes it, converts its ``state_dict`` through
``conversion/torch_converter.py``, and asserts forward agreement with the flax
model — proving both architecture fidelity and converter correctness per family
(the north-star "checkpoint compatibility" pillar; ref model files cited in each
test).
"""

from __future__ import annotations

import numpy as np
import torch


def randomize_reference(net: torch.nn.Module, seed: int = 0, n_stats_batches: int = 2, input_hw=(64, 64), in_ch: int = 3):
    """Give a reference model non-trivial weights AND BatchNorm running stats.

    Default torch init already randomizes weights; running BN stats start at
    (0, 1) which would hide batch_stats conversion bugs — so run a couple of
    train-mode forwards to populate them.
    """
    torch.manual_seed(seed)
    # replay the default init under the seeded RNG: torch CONSTRUCTION happens
    # before this call with an unseeded global RNG, which made every
    # randomized-reference fixture nondeterministic across runs (flaky
    # borderline NMS keeps in the pipeline/tinycoco parity tests)
    def _reset(m):
        if callable(getattr(m, "reset_parameters", None)):
            try:
                m.reset_parameters()
            except Exception:
                pass

    net.apply(_reset)
    for p in net.parameters():
        if not p.is_floating_point() or not p.requires_grad:
            # frozen/integer buffers-as-Parameters (e.g. SSDHead dboxes/img_size)
            continue
        with torch.no_grad():
            # small scale keeps deep nets numerically tame in fp32
            p.add_(torch.randn_like(p) * 0.01)
    net.train()
    with torch.no_grad():
        for i in range(n_stats_batches):
            x = torch.randn(2, in_ch, *input_hw) * 0.5
            try:
                net(x)
            except Exception:
                break  # some heads need specific extra inputs; stats in backbone are set
    net.eval()
    return net


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def assert_close(got, ref, atol=5e-4, rtol=5e-3, name="output"):
    """fp32 parity modulo cross-library conv-reduction ordering.

    Deep stacks accumulate ~1e-4-level divergence between oneDNN (torch CPU) and
    XLA even for identical math; we bound the worst element AND require the bulk
    of elements to agree much tighter (catches real architecture bugs, which
    produce O(1) divergence, not O(1e-4)).
    """
    got = np.asarray(got, dtype=np.float32)
    ref = np.asarray(ref, dtype=np.float32)
    assert got.shape == ref.shape, f"{name}: shape {got.shape} vs ref {ref.shape}"
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol, err_msg=name)
    tight = np.abs(got - ref) <= 2e-4 + 1e-3 * np.abs(ref)
    assert tight.mean() > 0.97, f"{name}: only {tight.mean():.1%} of elements within tight tolerance"


class bare_module:
    """Minimal SgModel-like shim (variables/apply/update_variables) for goldens
    of modules that have no zoo entry of their own (e.g. backbone_mode trunks)."""

    def __init__(self, module, input_hw=(64, 64), in_ch=3):
        import jax
        import jax.numpy as jnp

        self.module = module
        self.variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, *input_hw, in_ch)), train=False)

    def update_variables(self, variables):
        self.variables = variables

    def apply(self, x, train=False):
        return self.module.apply(self.variables, x, train=train)


def convert_into(ref_net, model, rules, strict=True):
    from super_gradients_tpu.conversion.torch_converter import convert_state_dict

    variables = convert_state_dict(ref_net.state_dict(), model.variables, rules=rules, strict=strict)
    model.update_variables(variables)
    return model


def detection_parity(ref_net, model, input_hw=(64, 64), rules=None, atol=5e-4, seed=0,
                     ref_out_fn=None, got_out_fn=None):
    """Compare eval-mode decoded (pred_bboxes, pred_scores).

    ref_out_fn/got_out_fn map each side's forward output to (bboxes, scores);
    defaults fit the reference's ``(decoded, raw)`` tuple and our YoloNASOutputs.
    """
    import jax.numpy as jnp

    ref_net = randomize_reference(ref_net, seed=seed, input_hw=input_hw)
    convert_into(ref_net, model, rules or ())

    x = (np.random.RandomState(seed).rand(1, input_hw[0], input_hw[1], 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        ref_out = ref_net(to_nchw(x))
    if ref_out_fn is None:
        ref_out_fn = lambda o: (o[0][0], o[0][1])
    ref_boxes, ref_scores = [t.numpy() for t in ref_out_fn(ref_out)]

    got = model.apply(jnp.asarray(x), train=False)
    if got_out_fn is None:
        got_out_fn = lambda o: (o.pred_bboxes, o.pred_scores)
    got_boxes, got_scores = [np.asarray(t) for t in got_out_fn(got)]

    assert_close(got_scores, ref_scores, atol=atol, name="pred_scores")
    # boxes are in pixel units — scale tolerance accordingly
    assert_close(got_boxes, ref_boxes, atol=max(atol * 100, 5e-2), rtol=1e-3, name="pred_bboxes")


def segmentation_parity(ref_net, model, input_hw=(128, 256), rules=None, atol=5e-4, seed=0,
                        ref_out_fn=None):
    """Compare eval-mode segmentation logit maps (ref NCHW vs ours NHWC)."""
    import jax.numpy as jnp

    ref_net = randomize_reference(ref_net, seed=seed, input_hw=input_hw)
    convert_into(ref_net, model, rules or ())

    x = (np.random.RandomState(seed).rand(1, input_hw[0], input_hw[1], 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        ref_out = ref_net(to_nchw(x))
    if ref_out_fn is not None:
        ref_out = ref_out_fn(ref_out)
    elif isinstance(ref_out, (tuple, list)):
        ref_out = ref_out[0]
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    got = model.apply(jnp.asarray(x), train=False)
    if isinstance(got, (tuple, list)):
        got = got[0]
    assert_close(np.asarray(got), ref_out, atol=atol)


def pose_parity(ref_net, model, input_hw=(64, 64), rules=None, atol=5e-4, seed=0):
    """Compare eval-mode decoded pose outputs (bboxes, scores, pose coords, pose scores).

    Coordinate tolerance is RESOLUTION-SCALED: decoded coords are
    ``(anchor + offset) * stride`` pixel values, so fp32 accumulation error
    grows with image size, not with the coordinate's own magnitude (measured
    for yolo_nas_pose_s: boxes max-abs err 1.0e-3 at 64px, 5.9e-3 at 320px,
    mean 1.3e-4 — pure rounding, no systematic offset; a half-pixel decode
    bug would show as mean ~= 0.5 and is excluded by 3 orders of magnitude).
    3e-5 * max(H, W) gives ~1.6x headroom over the measured worst case at
    every resolution and is ~40x tighter than the old flat 5e-2 + 1e-3*|coord|
    band."""
    import jax.numpy as jnp

    coord_atol = 3e-5 * max(input_hw)

    ref_net = randomize_reference(ref_net, seed=seed, input_hw=input_hw)
    convert_into(ref_net, model, rules or ())

    x = (np.random.RandomState(seed).rand(1, input_hw[0], input_hw[1], 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        decoded = ref_net(to_nchw(x))[0]
    ref_boxes, ref_scores, ref_coords, ref_kscores = [t.numpy() for t in decoded]

    got = model.apply(jnp.asarray(x), train=False)
    assert_close(np.asarray(got.pred_scores), ref_scores, atol=atol, name="pred_scores")
    assert_close(np.asarray(got.pred_pose_scores), ref_kscores, atol=atol, name="pred_pose_scores")
    assert_close(np.asarray(got.pred_bboxes), ref_boxes, atol=coord_atol, rtol=1e-5, name="pred_bboxes")
    assert_close(np.asarray(got.pred_pose_coords), ref_coords, atol=coord_atol, rtol=1e-5, name="pred_pose_coords")


def classification_parity(ref_net, model, input_hw=(64, 64), rules=None, atol=5e-4, seed=0):
    """Forward both nets on one input; compare logits. Returns (got, ref)."""
    from super_gradients_tpu.conversion.torch_converter import convert_state_dict

    import jax.numpy as jnp

    ref_net = randomize_reference(ref_net, seed=seed, input_hw=input_hw)
    rules = rules if rules is not None else (model.config.torch_rules if getattr(model.config, "torch_rules", None) else ())
    variables = convert_state_dict(ref_net.state_dict(), model.variables, rules=rules, strict=True)
    model.update_variables(variables)

    x = (np.random.RandomState(seed).rand(2, input_hw[0], input_hw[1], 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        ref_out = ref_net(to_nchw(x)).numpy()
    got = np.asarray(model.apply(jnp.asarray(x), train=False))
    assert_close(got, ref_out, atol=atol)
    return got, ref_out
