"""Torch→flax conversion parity tests.

Golden strategy (SURVEY §4): build small torch modules with the REFERENCE's exact
attribute naming (``branch_3x3.conv`` etc. — see reference qarepvgg_block.py /
resnet.py), convert their state_dicts, and require forward parity to ~1e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from super_gradients_tpu.conversion.torch_converter import (
    RESNET_RULES,
    YOLO_NAS_RULES,
    convert_state_dict,
)
from super_gradients_tpu.models.classification.resnet import ResNet
from super_gradients_tpu.modules.blocks import QARepVGGBlock


class TorchQARepVGG(tnn.Module):
    """Minimal torch twin with reference naming (qarepvgg_block.py:105-165)."""

    def __init__(self, ch, use_residual=True):
        super().__init__()
        self.branch_3x3 = tnn.Sequential()
        self.branch_3x3.add_module("conv", tnn.Conv2d(ch, ch, 3, 1, 1, bias=False))
        self.branch_3x3.add_module("bn", tnn.BatchNorm2d(ch))
        self.branch_1x1 = tnn.Conv2d(ch, ch, 1, 1, 0, bias=True)
        self.post_bn = tnn.BatchNorm2d(ch)
        self.use_residual = use_residual

    def forward(self, x):
        y = self.branch_3x3(x) + self.branch_1x1(x)
        if self.use_residual:
            y = y + x
        return torch.relu(self.post_bn(y))


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d,)):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.2)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.rand_like(mod.weight) + 0.5)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)


def test_qarepvgg_torch_parity():
    torch.manual_seed(0)
    tm = TorchQARepVGG(8).eval()
    _randomize_bn(tm)

    fm = QARepVGGBlock(out_channels=8, use_residual=True, use_alpha=False, bn_eps=1e-5)
    x = np.random.RandomState(0).randn(2, 16, 16, 8).astype(np.float32)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = convert_state_dict(tm.state_dict(), template, rules=YOLO_NAS_RULES)

    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.shortcut = tnn.Sequential()
        if stride != 1 or cin != planes:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False), tnn.BatchNorm2d(planes)
            )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + self.shortcut(x))


class TorchResNet18(tnn.Module):
    """Reference-named ResNet18 (resnet.py:139-210 attribute layout)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for planes, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            blocks = tnn.Sequential(TorchBasicBlock(cin, planes, stride), TorchBasicBlock(planes, planes, 1))
            layers.append(blocks)
            cin = planes
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.linear = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.linear(x)


def test_resnet18_torch_parity():
    torch.manual_seed(1)
    tm = TorchResNet18(num_classes=10).eval()
    _randomize_bn(tm)

    fm = ResNet(num_blocks=(2, 2, 2, 2), num_classes=10, block="basic")
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = convert_state_dict(tm.state_dict(), template, rules=RESNET_RULES)

    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_strict_mode_reports_missing():
    fm = QARepVGGBlock(out_channels=8, use_residual=True)
    template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8)))
    import pytest

    with pytest.raises(KeyError):
        convert_state_dict({}, template, rules=YOLO_NAS_RULES, strict=True)
    # non-strict keeps template values
    out = convert_state_dict({}, template, rules=YOLO_NAS_RULES, strict=False)
    assert "params" in out


def test_no_key_matching_mode_recovers_by_shape():
    """StrictLoad.NO_KEY_MATCHING: unmatched torch keys map to leaves by shape order
    (reference adaptive solver, checkpoint_utils.py:79)."""
    from super_gradients_tpu.conversion.torch_converter import StrictLoad, convert_state_dict

    fm = ResNet(num_blocks=(1, 1, 1, 1), num_classes=4, block="basic")
    template = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))

    tm = TorchResNet18.__new__(TorchResNet18)  # skip init; build a rename victim manually
    import torch.nn as tnn

    # a state dict with WRONG names but right shapes for the stem conv
    sd = {"totally.renamed.stem": __import__("torch").randn(64, 3, 7, 7)}
    out = convert_state_dict(sd, template, rules=RESNET_RULES, strict=StrictLoad.NO_KEY_MATCHING)
    got = np.asarray(out["params"]["conv1"]["kernel"])
    ref = sd["totally.renamed.stem"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, ref)
