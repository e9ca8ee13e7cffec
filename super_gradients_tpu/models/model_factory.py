"""models.get — the model zoo entry point.

Reference parity: ``training/models/model_factory.py:31-256`` (``get`` →
``instantiate_model`` → registry lookup → pretrained load → head replace).

Each registered architecture is a builder returning a :class:`ModelSpec`; ``get``
initializes the flax variables, optionally loads/converts a checkpoint, and wraps
everything in the right task-specific SgModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import ARCHITECTURES
from super_gradients_tpu.inference.processing import Processing
from super_gradients_tpu.models.sg_model import (
    ClassificationModel,
    DetectionModel,
    SegmentationModel,
    SgModel,
)

logger = get_logger(__name__)

TASK_WRAPPERS = {
    "classification": ClassificationModel,
    "detection": DetectionModel,
    "segmentation": SegmentationModel,
    "generic": SgModel,
}


def _pose_wrapper(*args, **kwargs):
    from super_gradients_tpu.models.sg_model import PoseEstimationModel

    return PoseEstimationModel(*args, **kwargs)


TASK_WRAPPERS["pose_estimation"] = _pose_wrapper


@dataclasses.dataclass
class ModelSpec:
    """What an architecture builder returns (module + metadata)."""

    module: Any
    task: str
    num_classes: int
    input_hw: Tuple[int, int]
    config: Any = None
    processing: Optional[Processing] = None
    class_names: Optional[List[str]] = None
    torch_key_mapper: Optional[Callable] = None  # for checkpoint conversion
    wrapper_cls: Optional[type] = None  # override task wrapper (e.g. pose)
    # Shape used for the ONE-time param init. Fully-convolutional models produce
    # IDENTICAL variables at any valid size, so builders set a small init_hw to
    # avoid compiling the init program at full 640x640/512x1024 (minutes on CPU).
    # None = init at input_hw (required when params depend on H/W: ViT/BEiT
    # positional tables).
    init_hw: Optional[Tuple[int, int]] = None


def get_architecture(model_name: str) -> Callable:
    if model_name not in ARCHITECTURES:
        import difflib

        low = model_name.lower()
        close = [k for k in ARCHITECTURES if low in k.lower() or k.lower() in low]
        close += [k for k in difflib.get_close_matches(low, ARCHITECTURES, n=5, cutoff=0.75) if k not in close]
        hint = f" Close matches: {close[:5]}" if close else ""
        raise KeyError(f"Unknown architecture `{model_name}`.{hint} ({len(ARCHITECTURES)} registered)")
    return ARCHITECTURES[model_name]


def get(
    model_name: str,
    num_classes: Optional[int] = None,
    arch_params: Optional[Dict] = None,
    checkpoint_path: Optional[str] = None,
    pretrained_weights: Optional[str] = None,
    seed: int = 0,
    checkpoint_num_classes: Optional[int] = None,
    load_backbone: bool = False,
    strict_load=None,
    **kwargs,
) -> SgModel:
    """Instantiate a model from the zoo (ref ``models.get``, model_factory.py:192).

    Args:
        model_name: registered architecture name (e.g. ``"resnet18"``, ``"yolo_nas_s"``).
        num_classes: override the default class count (head re-init).
        arch_params: architecture-specific overrides forwarded to the builder.
        checkpoint_path: a checkpoint to load; ``.pth`` files are converted from
            torch on the fly (reference-weight ingestion), orbax dirs load natively.
        pretrained_weights: dataset tag (``"coco"``/``"imagenet"``). Requires the
            weight file to be available locally (this environment has no egress);
            use ``checkpoint_path`` with a downloaded reference ``.pth``.
    """
    if checkpoint_num_classes is not None and num_classes is not None and checkpoint_num_classes != num_classes:
        # load at the checkpoint's class count, then weight-preserving head swap
        # (ref model_factory.py:250-254 replace_head after load)
        base = get(
            model_name, num_classes=checkpoint_num_classes, arch_params=arch_params,
            checkpoint_path=checkpoint_path, pretrained_weights=pretrained_weights, seed=seed, **kwargs,
        )
        return replace_head(base, num_classes, seed=seed)

    builder = get_architecture(model_name)
    spec = builder(num_classes=num_classes, arch_params=arch_params or {}, **kwargs)

    if isinstance(spec, SgModel):
        # user-registered builders (@register_model) may construct the task
        # wrapper themselves (ref users register raw nn.Modules the same way —
        # model_factory.py:192 instantiates whatever the registry returns);
        # checkpoint/pretrained handling below still applies
        model = spec
        spec = None
    else:
        # zoo builders return a ModelSpec; init on CPU: param creation needs no
        # accelerator, and compiling the init program through the TPU toolchain
        # is pure waste (minutes on remote-compile)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            rng = jax.random.PRNGKey(seed)
            init_hw = spec.init_hw or spec.input_hw
            example = jnp.zeros((1, init_hw[0], init_hw[1], 3), dtype=jnp.float32)
            variables = jax.jit(spec.module.init, static_argnames=("train",))(rng, example, train=False)

        wrapper = spec.wrapper_cls or TASK_WRAPPERS[spec.task]
        model = wrapper(
            name=model_name,
            module=spec.module,
            variables=variables,
            num_classes=spec.num_classes,
            config=spec.config,
            processing=spec.processing,
            class_names=spec.class_names,
            input_hw=spec.input_hw,
        )

    if pretrained_weights is not None:
        # attach the processing params the published checkpoint was evaluated with
        # (ref model_factory.py instantiate_model -> get_pretrained_processing_params)
        from super_gradients_tpu.inference.processing import get_pretrained_processing_params

        proc_params = get_pretrained_processing_params(model_name, pretrained_weights)
        if proc_params:
            model.set_dataset_processing_params(**proc_params)

    if pretrained_weights is not None and checkpoint_path is None:
        # zero-egress env: resolve against the local mirror ($SG_PRETRAINED_DIR);
        # raises with the published URL when the file is absent
        from super_gradients_tpu.models.pretrained_models import resolve_pretrained_path

        checkpoint_path = resolve_pretrained_path(model_name, pretrained_weights)

    if checkpoint_path is not None:
        if checkpoint_path.endswith((".pth", ".pt")):
            from super_gradients_tpu.conversion.torch_converter import load_torch_weights

            rules = spec.torch_key_mapper() if spec is not None and spec.torch_key_mapper else ()
            load_torch_weights(
                model, checkpoint_path, rules=rules,
                strict=(strict_load if strict_load is not None else not load_backbone),
                only_subtree="backbone" if load_backbone else None,
            )
        else:
            from super_gradients_tpu.training.checkpoints import load_checkpoint_into_model

            load_checkpoint_into_model(model, checkpoint_path, only_subtree="backbone" if load_backbone else None)
    return model


def convert_from_torch(model: SgModel, state_dict, torch_key_mapper: Callable) -> SgModel:
    """Convert a torch state_dict into the model's variables (see conversion/)."""
    from super_gradients_tpu.conversion.torch_converter import convert_state_dict

    variables = convert_state_dict(state_dict, model.variables, torch_key_mapper)
    model.update_variables(variables)
    return model


def replace_head(model: SgModel, new_num_classes: int, seed: int = 0) -> SgModel:
    """Weight-preserving head replacement (ref ``SgModule.replace_head``,
    sg_module.py:9-80 + head_replacement_utils.py): rebuild the architecture with
    ``new_num_classes``, transfer every shape-matching weight (backbone/neck stay
    bit-identical), and leave only the class-dependent head tensors freshly
    initialized."""
    from super_gradients_tpu.training.checkpoints import transfer_weights

    new_model = get(model.name, num_classes=new_num_classes, seed=seed)
    merged = transfer_weights(model.variables, new_model.variables)
    new_model.update_variables(merged)
    new_model._processing = model._processing
    new_model._input_hw = model._input_hw
    return new_model
