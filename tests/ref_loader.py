"""Load reference (PyTorch) model modules standalone for golden parity tests.

The reference package at /root/reference/src/super_gradients cannot be imported
whole: its top-level ``__init__`` pulls in the Trainer/hydra/torchvision stack and
several external deps that are absent in this environment.  Instead we:

1. install minimal stubs for the missing external packages (omegaconf,
   torchvision, hydra, pytorch_quantization, ...),
2. register "hollow" parent packages for the heavy ``super_gradients`` roots
   (their real ``__init__.py`` is NOT executed, but ``__path__`` points at the
   real directories so any *submodule* import underneath loads the REAL file),
3. import the actual reference model files through the normal import machinery.

This generalizes the proven standalone-load technique of
``tests/test_ppyolo_loss.py`` from one file to the whole model zoo, which is what
the full-model forward-parity goldens need (VERDICT r2 item #1).

Nothing here copies reference code — it executes the reference in-place, read-only,
as a test oracle.
"""

from __future__ import annotations

import importlib
import sys
import types
from types import SimpleNamespace

REF_SRC = "/root/reference/src"

# Packages whose real __init__.py must NOT run (too heavy / import the world).
# Submodules underneath still load for real.
_HOLLOW = (
    "super_gradients",
    "super_gradients.common",
    "super_gradients.training",
    "super_gradients.training.models",
    "super_gradients.training.datasets",
    "super_gradients.training.datasets.detection_datasets",
    "super_gradients.training.utils",
    "super_gradients.training.transforms",
    "super_gradients.training.losses",
    "super_gradients.training.metrics",
    "super_gradients.training.pipelines",
    "super_gradients.training.pretrained_models_pkg_placeholder",  # (no-op guard)
)

_installed = False


def _mod(name, **attrs):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        m.__path__ = []  # behave as a package so fabricated submodules can import
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    # attach to parent so `import a.b` then `a.b` attribute access works
    if "." in name:
        parent, _, child = name.rpartition(".")
        if parent in sys.modules:
            setattr(sys.modules[parent], child, m)
    return m


class _Placeholder:
    """Stands in for any stubbed-external symbol that models never actually call."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _Placeholder()


def _auto(m):
    """Give a stub module a __getattr__ that fabricates placeholders."""

    def __getattr__(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        val = _Placeholder()
        setattr(m, attr, val)
        return val

    m.__getattr__ = __getattr__
    return m


def _passthrough_decorator(*dargs, **dkwargs):
    """A decorator usable both bare and with arguments."""
    if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
        return dargs[0]

    def deco(obj):
        return obj

    return deco


# NOTE: no "albumentations"/"wandb"/"clearml" here beyond what ref model files
# need — stubs leak into the shared pytest process and must not flip the
# library's own optional-dependency gates (e.g. the albumentations bridge test).
_STUB_ROOTS = ("torchvision", "torchmetrics", "pytorch_quantization", "onnx", "onnxsim",
               "onnx_graphsurgeon", "onnxruntime", "dagshub",
               "deci_platform_client", "botocore", "boto3", "black",
               "data_gradients", "pycocotools", "hydra", "omegaconf", "deprecated", "coverage")


class _AutoStubFinder:
    """Meta-path finder fabricating empty auto-attr modules under stub roots."""

    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".", 1)[0]
        if root not in _STUB_ROOTS:
            return None
        import importlib.machinery
        import importlib.util

        def create_module(spec):
            m = types.ModuleType(fullname)
            m.__path__ = []
            return _auto(m)

        loader = importlib.machinery.ModuleSpec(fullname, None)
        spec = importlib.util.spec_from_loader(fullname, _StubLoader())
        spec.submodule_search_locations = []
        return spec


class _StubLoader:
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__path__ = []
        return _auto(m)

    def exec_module(self, module):
        pass


def _install_external_stubs():
    import torch

    if not any(isinstance(f, _AutoStubFinder) for f in sys.meta_path):
        sys.meta_path.append(_AutoStubFinder())

    # ---------------- omegaconf
    if "omegaconf" not in sys.modules:
        class DictConfig(dict):
            def __init__(self, content=None, **kw):
                super().__init__(content or {})

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

        class ListConfig(list):
            def __init__(self, content=None, **kw):
                super().__init__(content or [])

        class OmegaConf:
            @staticmethod
            def create(obj=None, **kw):
                if isinstance(obj, dict):
                    return DictConfig(obj)
                if isinstance(obj, list):
                    return ListConfig(obj)
                return DictConfig({})

            @staticmethod
            def to_container(cfg, resolve=True, **kw):
                if isinstance(cfg, dict):
                    return {k: OmegaConf.to_container(v) for k, v in cfg.items()}
                if isinstance(cfg, list):
                    return [OmegaConf.to_container(v) for v in cfg]
                return cfg

            to_object = to_container

            @staticmethod
            def is_config(obj):
                return isinstance(obj, (DictConfig, ListConfig))

            @staticmethod
            def merge(*cfgs):
                out = {}
                for c in cfgs:
                    out.update(dict(c))
                return DictConfig(out)

            @staticmethod
            def set_struct(cfg, flag):
                pass

            @staticmethod
            def resolve(cfg):
                pass

        _mod("omegaconf", DictConfig=DictConfig, ListConfig=ListConfig, OmegaConf=OmegaConf,
             MISSING="???", open_dict=lambda cfg: _nullcontext(cfg), II=lambda s: s)
        _mod("omegaconf.omegaconf", DictConfig=DictConfig, ListConfig=ListConfig, OmegaConf=OmegaConf)

    # ---------------- torchvision (ops used by models; datasets/transforms by data code)
    if "torchvision" not in sys.modules:
        tv = _mod("torchvision", __version__="0.15.2+stub")
        tv_ops = _mod("torchvision.ops")
        _mod("torchvision.ops.boxes", nms=_tv_nms, batched_nms=_tv_batched_nms)
        tv_ops.nms = _tv_nms
        tv_ops.batched_nms = _tv_batched_nms
        tv_ops.DeformConv2d = _make_deform_conv2d(torch)
        tv_ops.deform_conv2d = _deform_conv2d_func
        _mod("torchvision.ops.deform_conv", DeformConv2d=tv_ops.DeformConv2d, deform_conv2d=_deform_conv2d_func)
        _mod("torchvision.ops.misc", FrozenBatchNorm2d=torch.nn.BatchNorm2d)
        _auto(_mod("torchvision.transforms", Compose=list, ToTensor=object, Normalize=object,
             InterpolationMode=SimpleNamespace(BILINEAR="bilinear", NEAREST="nearest", BICUBIC="bicubic")))
        _auto(_mod("torchvision.transforms.functional"))
        _auto(_mod("torchvision.datasets", ImageFolder=object, CIFAR10=object, CIFAR100=object, MNIST=object))
        _auto(_mod("torchvision.models", resnet18=lambda **kw: None))
        _auto(_mod("torchvision.io"))
        _auto(tv_ops)

    # ---------------- torchmetrics
    if "torchmetrics" not in sys.modules:
        class Metric(torch.nn.Module):
            full_state_update = False

            def __init__(self, **kwargs):
                super().__init__()
                self._defaults = {}
                self._reductions = {}

            def add_state(self, name, default, dist_reduce_fx=None, persistent=False):
                setattr(self, name, default)
                self._defaults[name] = default
                self._reductions[name] = dist_reduce_fx

            def reset(self):
                for k, v in self._defaults.items():
                    setattr(self, k, v.clone() if hasattr(v, "clone") else type(v)(v))

            def forward(self, *a, **k):
                self.update(*a, **k)
                return self.compute()

        class MetricCollection(dict):
            def __init__(self, metrics, **kw):
                super().__init__(metrics if isinstance(metrics, dict) else {type(m).__name__: m for m in metrics})

        tm = _mod("torchmetrics", Metric=Metric, MetricCollection=MetricCollection)
        _mod("torchmetrics.metric", Metric=Metric)
        _mod("torchmetrics.classification", JaccardIndex=Metric, Accuracy=Metric)
        _mod("torchmetrics.utilities", rank_zero_warn=lambda *a, **k: None)
        _mod("torchmetrics.utilities.distributed", reduce=lambda x, reduction=None: x)
        tm.JaccardIndex = Metric

    # ---------------- misc small externals
    _mod("deprecated", deprecated=_passthrough_decorator)
    if "pytorch_quantization" not in sys.modules:
        class _TensorQuantizer(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        pq = _mod("pytorch_quantization", __version__="2.1.2")
        _mod("pytorch_quantization.nn", TensorQuantizer=_TensorQuantizer,
             QuantConv2d=torch.nn.Conv2d, QuantLinear=torch.nn.Linear)
        _mod("pytorch_quantization.nn.modules")
        _mod("pytorch_quantization.nn.modules._utils", QuantMixin=object, QuantInputMixin=object)
        _mod("pytorch_quantization.tensor_quant",
             QuantDescriptor=lambda **kw: SimpleNamespace(**kw))
        _mod("pytorch_quantization.calib", MaxCalibrator=object, HistogramCalibrator=object)
        pq.quant_modules = _mod("pytorch_quantization.quant_modules")
    for name in ("onnx", "onnxsim", "onnx_graphsurgeon", "onnxruntime", "wandb", "dagshub",
                 "clearml", "deci_platform_client", "botocore", "boto3", "black",
                 "data_gradients", "coverage", "pip"):
        if name not in sys.modules:
            _auto(_mod(name, __version__="0.0.0+stub"))
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            from packaging.version import parse as _parse_version

            import os as _os

            _mod("pkg_resources", parse_version=_parse_version,
                 get_distribution=lambda name: SimpleNamespace(version="0.0.0"),
                 DistributionNotFound=Exception,
                 resource_filename=lambda pkg, path: _os.path.join(REF_SRC, pkg.replace(".", "/"), path),
                 working_set=[])

    # reference cfg_utils needs real hydra; arch_params YAMLs are plain YAML though,
    # so serve them with a direct yaml load from the reference recipes dir
    if "super_gradients.common.environment.cfg_utils" not in sys.modules:
        import os as _os

        import yaml as _yaml

        def _deep_merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    _deep_merge(dst[k], v)
                else:
                    dst[k] = v
            return dst

        def _strip_pretrained(d):
            if isinstance(d, dict):
                d.pop("pretrained_weights", None)
                for v in d.values():
                    _strip_pretrained(v)
            return d

        def load_arch_params(config_name, recipes_dir_path=None, overriding_params=None):
            """Mini hydra-defaults composition: parents deep-merged in order, then self.
            pretrained_weights entries are stripped (zero-egress test oracle)."""
            base = recipes_dir_path or _os.path.join(REF_SRC, "super_gradients", "recipes")

            def load_one(name):
                if name.endswith(".yaml"):  # some callers pass the extension (unet.py:208)
                    name = name[: -len(".yaml")]
                with open(_os.path.join(base, "arch_params", name + ".yaml")) as f:
                    cfg = _yaml.safe_load(f) or {}
                defaults = cfg.pop("defaults", None)
                if not defaults:
                    return cfg
                merged = {}
                for item in defaults:
                    if item == "_self_":
                        _deep_merge(merged, cfg)
                    elif isinstance(item, str):
                        _deep_merge(merged, load_one(item))
                if "_self_" not in defaults:
                    _deep_merge(merged, cfg)
                return merged

            class _AttrDict(dict):
                """Nested configs need BOTH attr and item access (omegaconf
                DictConfig semantics — e.g. DEKR's arch_params.SPEC.STAGES)."""

                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError:
                        raise AttributeError(k)

            def _coerce(v):
                # YAML 1.1 reads `1e-3` as a string; omegaconf coerces — match that
                if isinstance(v, dict):
                    return _AttrDict({k: _coerce(x) for k, x in v.items()})
                if isinstance(v, list):
                    return [_coerce(x) for x in v]
                if isinstance(v, str):
                    try:
                        return float(v) if any(c in v for c in ".eE") and v[0].isdigit() else v
                    except ValueError:
                        return v
                return v

            return _coerce(_strip_pretrained(load_one(config_name)))

        _mod("super_gradients.common.environment.cfg_utils",
             load_arch_params=load_arch_params,
             load_recipe=lambda *a, **k: {},
             load_dataset_params=lambda *a, **k: {},
             load_experiment_cfg=lambda *a, **k: {},
             add_params_to_cfg=lambda *a, **k: None,
             maybe_instantiate_test_loaders=lambda *a, **k: None)

    if "stringcase" not in sys.modules:
        import re as _re

        def _snake(s):
            return _re.sub(r"(?<!^)(?=[A-Z])", "_", s).lower()

        _mod("stringcase",
             snakecase=_snake,
             camelcase=lambda s: (lambda p: p[0].lower() + p[1:] if p else p)(
                 "".join(w.capitalize() for w in s.split("_"))),
             pascalcase=lambda s: "".join(w.capitalize() for w in s.split("_")),
             capitalcase=lambda s: s[:1].upper() + s[1:],
             lowercase=lambda s: s.lower(),
             uppercase=lambda s: s.upper())
    _mod("pycocotools")
    _mod("pycocotools.coco", COCO=object)
    _mod("pycocotools.cocoeval", COCOeval=object)
    _mod("pycocotools.mask")
    _mod("data_gradients.dataset_adapters")
    _mod("data_gradients.dataset_adapters.config")
    _mod("data_gradients.dataset_adapters.config.typing_utils")

    # ---------------- hydra (only config-path machinery; models rarely touch it)
    if "hydra" not in sys.modules:
        hy = _mod("hydra", main=_passthrough_decorator)

        def _hydra_instantiate(cfg, **kw):
            """Recursive ``_target_`` instantiation (what arch_params_factory.py:23
            relies on — e.g. SSD's DefaultBoxes anchors)."""
            if isinstance(cfg, list):
                return [_hydra_instantiate(v) for v in cfg]
            if isinstance(cfg, dict):
                out = {k: _hydra_instantiate(v) for k, v in cfg.items()}
                target = out.pop("_target_", None)
                if target is None:
                    return type(cfg)(out)  # preserve _AttrDict
                import importlib as _il

                mod_name, _, attr = target.rpartition(".")
                obj = getattr(load_ref_module(mod_name) if mod_name.startswith("super_gradients") else _il.import_module(mod_name), attr)
                return obj(**out, **kw)
            return cfg

        _mod("hydra.utils", instantiate=_hydra_instantiate)
        _mod("hydra.core")
        _mod("hydra.core.global_hydra", GlobalHydra=SimpleNamespace(instance=lambda: SimpleNamespace(clear=lambda: None)))
        _mod("hydra.experimental")
        hy.initialize_config_dir = _passthrough_decorator


class _nullcontext:
    def __init__(self, obj=None):
        self.obj = obj

    def __enter__(self):
        return self.obj

    def __exit__(self, *a):
        return False


# --- functional torch fallbacks for torchvision native ops (test-oracle only) ---

def _tv_nms(boxes, scores, iou_threshold):
    """Pure-torch NMS with torchvision semantics (descending score, IoU > thr suppressed)."""
    import torch

    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i.item())
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long, device=boxes.device)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    import torch

    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long, device=boxes.device)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + 1)
    return _tv_nms(boxes + offsets[:, None], scores, iou_threshold)


def _deform_conv2d_func(input, offset, weight, bias=None, stride=(1, 1), padding=(0, 0), dilation=(1, 1), mask=None):
    """Pure-torch deformable conv v2 (bilinear sampling), matching torchvision.ops.deform_conv2d."""
    import torch
    import torch.nn.functional as F

    b, c_in, h, w = input.shape
    c_out, c_in_g, kh, kw = weight.shape
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation
    out_h = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    out_w = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    n_off_groups = offset.shape[1] // (2 * kh * kw)
    groups = c_in // c_in_g

    # base sampling grid: for each output pixel and kernel tap
    ys = torch.arange(out_h, device=input.device) * sh - ph
    xs = torch.arange(out_w, device=input.device) * sw - pw
    ky = torch.arange(kh, device=input.device) * dh
    kx = torch.arange(kw, device=input.device) * dw
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # [out_h,1,kh,1]
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # [1,out_w,1,kw]
    base_y = base_y.expand(out_h, out_w, kh, kw).float()
    base_x = base_x.expand(out_h, out_w, kh, kw).float()

    offset = offset.view(b, n_off_groups, kh * kw, 2, out_h, out_w)
    off_y = offset[:, :, :, 0].permute(0, 1, 3, 4, 2).reshape(b, n_off_groups, out_h, out_w, kh, kw)
    off_x = offset[:, :, :, 1].permute(0, 1, 3, 4, 2).reshape(b, n_off_groups, out_h, out_w, kh, kw)
    if mask is not None:
        m = mask.view(b, n_off_groups, kh * kw, out_h, out_w).permute(0, 1, 3, 4, 2)
        m = m.reshape(b, n_off_groups, out_h, out_w, kh, kw)
    else:
        m = None

    c_per_og = c_in // n_off_groups
    cols = []
    for og in range(n_off_groups):
        sy = base_y[None] + off_y[:, og]  # [b,out_h,out_w,kh,kw]
        sx = base_x[None] + off_x[:, og]
        gy = 2.0 * sy / max(h - 1, 1) - 1.0
        gx = 2.0 * sx / max(w - 1, 1) - 1.0
        grid = torch.stack([gx, gy], dim=-1).view(b, out_h, out_w * kh * kw, 2)
        feat = input[:, og * c_per_og:(og + 1) * c_per_og]
        sampled = F.grid_sample(feat, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        sampled = sampled.view(b, c_per_og, out_h, out_w, kh, kw)
        if m is not None:
            sampled = sampled * m[:, og][:, None]
        cols.append(sampled)
    col = torch.cat(cols, dim=1)  # [b,c_in,out_h,out_w,kh,kw]
    col = col.permute(0, 1, 4, 5, 2, 3).reshape(b, c_in * kh * kw, out_h * out_w)
    w_mat = weight.view(groups, c_out // groups, c_in_g * kh * kw)
    col = col.view(b, groups, c_in_g * kh * kw, out_h * out_w)
    out = torch.einsum("gok,bgkp->bgop", w_mat, col).reshape(b, c_out, out_h, out_w)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _make_deform_conv2d(torch):
    import torch.nn as nn

    class DeformConv2d(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, dilation=1, groups=1, bias=True):
            super().__init__()
            k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.weight = nn.Parameter(torch.empty(out_channels, in_channels // groups, *k))
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
            nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

        def forward(self, x, offset, mask=None):
            return _deform_conv2d_func(x, offset, self.weight, self.bias,
                                       stride=self.stride, padding=self.padding,
                                       dilation=self.dilation, mask=mask)

    return DeformConv2d


# ----------------------------------------------------------------- hollowing

# For `from <hollow_pkg> import X`: submodules searched (in order) to resolve X.
_PROVIDERS = {
    "super_gradients.training.models": (
        "super_gradients.training.models.sg_module",
        "super_gradients.training.models.classification_models.base_classifer",  # sic: reference filename typo
        "super_gradients.training.models.arch_params_factory",
        "super_gradients.training.models.classification_models.mobilenet",
        "super_gradients.training.models.classification_models.mobilenetv2",
        "super_gradients.training.models.classification_models.senet",
    ),
    "super_gradients.training.utils": (
        "super_gradients.training.utils.utils",
        "super_gradients.training.utils.version_utils",
        "super_gradients.training.utils.distributed_training_utils",
        "super_gradients.training.utils.pose_estimation",
    ),
    "super_gradients.common": (
        "super_gradients.common.data_types",
    ),
    "super_gradients.training": (),
    "super_gradients.training.losses": (),
    "super_gradients.training.datasets": (),
}


def _make_pkg_getattr(pkg_name):
    def __getattr__(attr):
        for provider in _PROVIDERS.get(pkg_name, ()):
            try:
                pm = importlib.import_module(provider)
            except Exception:
                continue
            if hasattr(pm, attr):
                val = getattr(pm, attr)
                setattr(sys.modules[pkg_name], attr, val)  # cache
                return val
        raise AttributeError(f"hollow package {pkg_name!r} has no attribute {attr!r}")

    return __getattr__


def _install_hollow_packages():
    import os

    for name in _HOLLOW:
        rel = name.replace(".", "/")
        path = os.path.join(REF_SRC, rel)
        if not os.path.isdir(path):
            continue
        if name in sys.modules:
            # another test's standalone loader may have parked a BARE module here
            # (e.g. test_ohem_golden's exception stubs) — repair it so submodule
            # imports resolve against the real reference tree
            m = sys.modules[name]
            if not hasattr(m, "__path__"):
                m.__path__ = [path]
            if not hasattr(m, "__getattr__"):
                m.__getattr__ = _make_pkg_getattr(name)
            continue
        m = types.ModuleType(name)
        m.__path__ = [path]
        m.__package__ = name
        m.__getattr__ = _make_pkg_getattr(name)
        sys.modules[name] = m
        if "." in name:
            parent, _, child = name.rpartition(".")
            if parent in sys.modules:
                setattr(sys.modules[parent], child, m)

    # stub the logger chain (its real import graph is circular outside the
    # package's own __init__ ordering; models only need get_logger)
    import logging

    class ILogger:
        def __init__(self, *a, **k):
            self._logger = logging.getLogger(type(self).__name__)

    _mod("super_gradients.common.abstractions")
    sys.modules["super_gradients.common.abstractions"].__path__ = [
        os.path.join(REF_SRC, "super_gradients/common/abstractions")
    ]
    _mod("super_gradients.common.abstractions.abstract_logger",
         get_logger=lambda name, *a, **k: logging.getLogger(name), ILogger=ILogger)

    class _ConsoleSink:
        @staticmethod
        def get_filename():
            return "/dev/null"

        @staticmethod
        def set_location(*a, **k):
            pass

    # keep the reference's console sink from writing ~/sg_logs on import;
    # other auto_logging submodules still load for real (real __path__)
    al = _mod("super_gradients.common.auto_logging")
    al.__path__ = [os.path.join(REF_SRC, "super_gradients/common/auto_logging")]
    _mod("super_gradients.common.auto_logging.console_logging", ConsoleSink=_ConsoleSink)

    # repair EVERY pre-existing bare super_gradients.* module (other tests'
    # standalone loaders park path-less stubs, e.g. test_ohem_golden's
    # super_gradients.common.exceptions) so submodule imports resolve against
    # the real reference tree
    for name in list(sys.modules):
        if not name.startswith("super_gradients"):
            continue
        m = sys.modules[name]
        if m is None or hasattr(m, "__path__") or hasattr(m, "__file__"):
            continue
        path = os.path.join(REF_SRC, name.replace(".", "/"))
        if os.path.isdir(path):
            m.__path__ = [path]
            if not hasattr(m, "__getattr__"):
                m.__getattr__ = _make_pkg_getattr(name)

    # attributes some leaf files expect on hollow parents
    sg = sys.modules["super_gradients"]
    if not hasattr(sg, "is_distributed"):
        sg.is_distributed = lambda: False
        sg.__version__ = "3.7.1"


def setup():
    """Idempotent: install stubs + hollow packages. Call before load_ref_module."""
    global _installed
    if _installed:
        return
    _install_external_stubs()
    _install_hollow_packages()
    _installed = True


def load_ref_module(dotted: str):
    """Import a REAL reference module, e.g.
    ``load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_nas_variants")``.
    """
    setup()
    return importlib.import_module(dotted)
