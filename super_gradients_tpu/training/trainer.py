"""Trainer — the training engine.

Reference parity: ``training/sg_trainer/sg_trainer.py`` (Trainer :119, train :792,
epoch loop :1520-1643, _train_epoch :461, _validate_epoch :2176, checkpointing
:649-739, resume :309). TPU-native redesign (SURVEY §7):

- ONE jitted ``train_step(state, batch) -> (state, metrics)`` closed over the loss,
  optimizer, LR schedule and EMA decay; state is donated (in-place on device).
- Data parallelism: batches are device_put with batch-axis NamedSharding over the
  mesh; XLA/GSPMD inserts the gradient all-reduce over ICI — there is no DDP wrapper,
  no NCCL, no subprocess relaunch. BatchNorm stats are computed over the GLOBAL batch
  (free SyncBN — better than the reference's default).
- Gradient accumulation via ``optax.MultiSteps`` (ref batch_accumulate,
  sg_trainer.py:625-647); clip_grad_norm via ``optax.clip_by_global_norm``.
- EMA as a pytree branch updated in-step (ref utils/ema.py:27).
- Checkpoints: orbax pytree dirs — ckpt_latest / ckpt_best / ckpt_epoch_N /
  average_model with metric_to_watch bookkeeping (ref sg_trainer.py:649-739).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from super_gradients_tpu.common.config import load_recipe
from super_gradients_tpu.common.environment import generate_run_id, get_checkpoints_dir_path, get_latest_run_id
from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from super_gradients_tpu.training import checkpoints as ckpt_utils
from super_gradients_tpu.training.callbacks import Callback, CallbackHandler, PhaseContext
from super_gradients_tpu.training.ema import ema_update, make_decay_fn
from super_gradients_tpu.training.losses import get_loss
from super_gradients_tpu.training.metrics import MetricCollection, get_metric
from super_gradients_tpu.training.optimizers import build_optimizer
from super_gradients_tpu.training.schedules import build_lr_schedule
from super_gradients_tpu.training.train_state import TrainState

logger = get_logger(__name__)


def _metrics_view(out):
    """Metrics evaluate the STUDENT for KD composite outputs (the reference's
    KDTrainer validates the student net, kd_trainer.py:36-355)."""
    return out.student_output if hasattr(out, "student_output") else out


def _default_training_params() -> Dict:
    return load_recipe("training_hyperparams/default_train_params.yaml")


class _TrackedParams(dict):
    """training_params dict that records key reads.

    Structural guard against the silent-drop bug class (a knob declared in
    YAML and consumed by nothing — happened twice: ``pretrained_weights`` in
    round 2, ``mixed_precision`` in round 3). At the end of ``train()`` any
    key that was never read through ``get``/``[]`` is reported loudly."""

    _IGNORED = frozenset({"_convert_"})  # hydra instantiation marker, not a knob

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._read_keys = set()

    def __getitem__(self, k):
        self._read_keys.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self._read_keys.add(k)
        return super().get(k, default)

    def setdefault(self, k, default=None):
        self._read_keys.add(k)
        return super().setdefault(k, default)

    def unread_keys(self):
        return sorted(set(self) - self._read_keys - self._IGNORED)


class Trainer:
    """ref sg_trainer.py:119."""

    def __init__(self, experiment_name: str, ckpt_root_dir: Optional[str] = None, device: Optional[str] = None):
        self.experiment_name = experiment_name
        self.ckpt_root_dir = ckpt_root_dir
        self.run_id = generate_run_id()
        self.ckpt_dir: Optional[str] = None
        self.best_metric: Optional[float] = None
        self.train_state: Optional[TrainState] = None
        self.train_loss_history: List[float] = []
        self.valid_metrics_history: List[Dict[str, float]] = []
        self.test_metrics_history: List[Dict[str, Dict[str, float]]] = []
        self.train_metrics_history: List[Dict[str, float]] = []
        self._recipe_cfg: Optional[Dict] = None  # full cfg when launched via train_from_config
        self.unconsumed_training_params: List[str] = []  # silent-drop guard report

    # ------------------------------------------------------------------ train

    def train(
        self,
        model,
        training_params: Dict,
        train_loader,
        valid_loader=None,
        test_loaders: Optional[Dict[str, Any]] = None,
        additional_callbacks: Optional[Sequence[Callback]] = None,
    ):
        tp = _TrackedParams(_default_training_params())
        tp.update(training_params or {})
        self.training_params = tp

        # dataset → model processing-params handoff (ref sg_trainer
        # _maybe_set_preprocessing_params): trained checkpoints predict with the
        # dataset's class names / preprocessing without manual wiring
        ds = getattr(train_loader, "dataset", None)
        if (
            hasattr(model, "set_dataset_processing_params")
            and ds is not None
            and hasattr(ds, "get_dataset_preprocessing_params")
        ):
            try:
                model.set_dataset_processing_params(**ds.get_dataset_preprocessing_params())
            except Exception as e:  # never block training on predict-convenience wiring
                logger.debug(f"preprocessing-params handoff skipped: {e}")

        mesh = get_mesh()
        if tp.get("cross_replica_bn"):
            # always-on by construction: the batch axis is sharded over the mesh and
            # flax BN reduces over the full (global) batch under GSPMD — XLA inserts
            # the cross-device mean itself, the SyncBN analogue is free
            logger.info("cross_replica_bn=True: BN already reduces over the global batch on the mesh (no-op)")
        max_epochs = int(tp["max_epochs"])
        steps_per_epoch = len(train_loader)
        batch_accumulate = int(tp.get("batch_accumulate") or 1)
        total_opt_steps = max(1, max_epochs * steps_per_epoch // batch_accumulate)

        # ---- loss / schedule / optimizer -------------------------------
        criterion = get_loss(tp.get("loss"), tp.get("criterion_params"))
        # dict initial_lr = per-group fine-tune LRs (ref optimizer_utils.py:145-194
        # separate_lr_groups; initial_lr={'backbone': 1e-5, 'default': 1e-3});
        # finetune=True asks the model for its predefined mapping (SupportsFineTune)
        initial_lr = tp["initial_lr"]
        lr_group_dict = None
        if tp.get("finetune"):
            if hasattr(model, "get_finetune_lr_dict"):
                initial_lr = model.get_finetune_lr_dict(float(initial_lr))
                logger.info(f"finetune=True: initial_lr set to predefined mapping {initial_lr}")
            else:
                logger.warning("finetune=True has no effect: model does not implement get_finetune_lr_dict")
        if isinstance(initial_lr, dict):
            lr_group_dict = {k: float(v) for k, v in initial_lr.items()}
            initial_lr = lr_group_dict["default"] if "default" in lr_group_dict else next(iter(lr_group_dict.values()))
        lr_schedule = build_lr_schedule(
            lr_mode=tp.get("lr_mode"),
            initial_lr=float(initial_lr),
            max_epochs=max_epochs,
            steps_per_epoch=max(1, steps_per_epoch // batch_accumulate),
            lr_warmup_epochs=int(tp.get("lr_warmup_epochs") or 0),
            lr_warmup_steps=int(tp.get("lr_warmup_steps") or 0),
            warmup_initial_lr=tp.get("warmup_initial_lr"),
            lr_cooldown_epochs=int(tp.get("lr_cooldown_epochs") or 0),
            warmup_mode=tp.get("warmup_mode", "LinearEpochLRWarmup"),
            cosine_final_lr_ratio=float(tp.get("cosine_final_lr_ratio") or 0.01),
            lr_updates=tp.get("lr_updates") or [],
            lr_decay_factor=float(tp.get("lr_decay_factor") or 0.1),
            lr_schedule_function=tp.get("lr_schedule_function"),
            step_lr_update_freq=tp.get("step_lr_update_freq"),
        )
        tx = build_optimizer(
            optimizer=tp.get("optimizer", "SGD"),
            params=model.params,
            lr_schedule=lr_schedule,
            optimizer_params=tp.get("optimizer_params"),
            zero_weight_decay_on_bias_and_bn=bool(tp.get("zero_weight_decay_on_bias_and_bn")),
            lr_group_dict=lr_group_dict,
        )
        if tp.get("clip_grad_norm"):
            tx = optax.chain(optax.clip_by_global_norm(float(tp["clip_grad_norm"])), tx)
        frozen_patterns = list(tp.get("frozen_param_patterns") or [])
        # kd_module trained through the plain Trainer (recipe path): the teacher must
        # never receive updates OR weight decay (ref KDTrainer; kd_trainer.py does the
        # same for the class-based flow)
        if "teacher" in (model.params or {}) and "student" in (model.params or {}) and "teacher" not in frozen_patterns:
            frozen_patterns.append("teacher")
            logger.info("kd_module detected: freezing `teacher` subtree (no updates, no weight decay)")
        if frozen_patterns:
            # Freeze matching subtrees entirely: the main transform never sees them
            # (so decoupled/coupled weight decay cannot decay them — ref KD teacher
            # semantics, kd_trainer.py) and their update is forced to zero.
            def _mask(params, invert=False):
                def leaf_mask(path, _):
                    s = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
                    frozen = any(pat in s for pat in frozen_patterns)
                    return frozen if invert else not frozen

                return jax.tree_util.tree_map_with_path(leaf_mask, params)

            tx = optax.chain(
                optax.masked(tx, lambda p: _mask(p)),
                optax.masked(optax.set_to_zero(), lambda p: _mask(p, invert=True)),
            )
        if batch_accumulate > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=batch_accumulate)

        # ---- EMA --------------------------------------------------------
        use_ema = bool(tp.get("ema"))
        ema_params_cfg = dict(tp.get("ema_params") or {})
        decay_fn = make_decay_fn(
            decay=float(ema_params_cfg.get("decay", 0.9999)),
            decay_type=ema_params_cfg.get("decay_type", "exp"),
            beta=float(ema_params_cfg.get("beta", 15)),
            total_steps=total_opt_steps,
        ) if use_ema else None

        # ---- state ------------------------------------------------------
        # copies, not aliases: the train step donates the TrainState, and donating
        # buffers aliased by model.variables would invalidate the model wrapper
        # (predict/visualization callbacks during training would hit
        # "Array has been deleted")
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), model.params)
        batch_stats = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), model.batch_stats)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            # NOTE: must be a real copy — aliasing params would make donate_argnums
            # donate the same buffer twice (XLA hard-abort)
            ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params) if use_ema else None,
            ema_batch_stats=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), batch_stats) if use_ema else None,
        )

        # ---- resume -----------------------------------------------------
        start_epoch = 0
        self.ckpt_dir = get_checkpoints_dir_path(self.experiment_name, self.ckpt_root_dir, self.run_id)
        if tp.get("resume") or tp.get("run_id") or tp.get("resume_path"):
            state, start_epoch = self._try_resume(tp, state)
        if jax.process_index() == 0:
            os.makedirs(self.ckpt_dir, exist_ok=True)
            self._persist_recipe(tp, model)

        # state replicated over the mesh (also re-commits orbax-restored arrays that
        # land on a single device and would clash with batch-sharded inputs)
        state = jax.device_put(state, replicated_sharding(mesh))

        # ---- jitted steps -----------------------------------------------
        module = model.module
        has_bn = bool(batch_stats)

        # in-graph QAT: STE weight fake-quant + calibrated activation fake-quant
        # (ref selective_quantization_utils.py:50 + calibrator.py — enabled by the
        # QATTrainer via training_params["qat_params"])
        qat_cfg = dict(tp.get("qat_params") or {})
        if qat_cfg.get("enabled"):
            from super_gradients_tpu.training.quantization import make_qat_forward

            apply_fn, param_transform = make_qat_forward(module, qat_cfg)
        else:
            apply_fn, param_transform = module.apply, (lambda p: p)

        # bf16 mixed-precision policy (ref sg_trainer.py:503 autocast +
        # :1765 GradScaler; mixed_precision.py docstring for the TPU design):
        # params/opt/EMA stay fp32, forward+backward compute in bf16, outputs
        # upcast to fp32 before the criterion and metrics. QAT fake-quant runs
        # in fp32 (param_transform precedes the cast) so quantization math is
        # unaffected.
        mixed_precision = bool(tp.get("mixed_precision"))
        from super_gradients_tpu.training.mixed_precision import to_bf16, to_f32

        if mixed_precision:
            cast_in, cast_out = to_bf16, to_f32
        else:
            cast_in, cast_out = (lambda t: t), (lambda t: t)

        base_rng = jax.random.PRNGKey(int(tp.get("seed") or 42))

        train_metrics = MetricCollection([get_metric(m) for m in (tp.get("train_metrics_list") or [])])
        has_train_metrics = bool(train_metrics.metrics)
        valid_metrics = MetricCollection([get_metric(m) for m in (tp.get("valid_metrics_list") or [])])

        def _build_steps(criterion):
            """Close the jitted train/eval steps over the (current) criterion —
            called again when a stage-switch callback changes criterion_params
            (ref YoloXTrainingStageSwitchCallback / PPYoloETrainingStageSwitchCallback)."""
            return _make_train_step(criterion), _make_eval_step(criterion)

        def _make_train_step(criterion):
          def train_step(st: TrainState, train_dev_states, inputs, targets):
            rngs = {"dropout": jax.random.fold_in(base_rng, st.step)}

            def loss_fn(p):
                variables = {"params": cast_in(param_transform(p))}
                x = cast_in(inputs)
                if has_bn:
                    variables["batch_stats"] = st.batch_stats
                    out, mut = apply_fn(variables, x, train=True, mutable=["batch_stats"], rngs=rngs)
                    # flax BN computes mean/var in fp32 regardless of activation
                    # dtype; keep the running buffers fp32 (master precision)
                    new_bs = to_f32(mut["batch_stats"]) if mixed_precision else mut["batch_stats"]
                else:
                    out = apply_fn(variables, x, train=True, rngs=rngs)
                    new_bs = st.batch_stats
                out = cast_out(out)  # fp32 loss/assigner/metric math
                loss, aux = criterion(out, targets)
                return loss, (aux, new_bs, out)

            (loss, (aux, new_bs, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            # train-phase metrics on the live outputs (ref sg_trainer.py:519-528,
            # 1977-1984 MetricsUpdateCallback at TRAIN_BATCH_END)
            if has_train_metrics:
                out_sg = _metrics_view(jax.lax.stop_gradient(out))
                new_train_dev = train_metrics.update_device_only(train_dev_states, out_sg, targets)
                train_host_aux = train_metrics.preprocess_device(out_sg, targets)
            else:
                new_train_dev, train_host_aux = train_dev_states, ()
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)

            opt_step = st.step // batch_accumulate
            new_ema_p, new_ema_bs = st.ema_params, st.ema_batch_stats
            if use_ema:
                applied = (st.step + 1) % batch_accumulate == 0
                d = decay_fn(opt_step.astype(jnp.float32))
                cand_p = ema_update(st.ema_params, new_params, d)
                new_ema_p = jax.tree_util.tree_map(
                    lambda c, e: jnp.where(applied, c, e), cand_p, st.ema_params
                )
                if has_bn:
                    cand_bs = ema_update(st.ema_batch_stats, new_bs, d)
                    new_ema_bs = jax.tree_util.tree_map(
                        lambda c, e: jnp.where(applied, c, e), cand_bs, st.ema_batch_stats
                    )

            new_state = st.replace(
                step=st.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema_params=new_ema_p,
                ema_batch_stats=new_ema_bs,
            )
            metrics = {"loss": loss, "lr": lr_schedule(opt_step.astype(jnp.float32))}
            metrics.update({k: v for k, v in aux.items()})
            return new_state, new_train_dev, train_host_aux, metrics

          return jax.jit(train_step, donate_argnums=0)

        def _make_eval_step(criterion):
          def eval_step(variables, dev_metric_states, inputs, targets):
            # validation runs under the same bf16 policy as training (the
            # reference validates inside autocast too); BN running stats are
            # read-only here so fp32 buffers with bf16 activations are exact
            variables = {**variables, "params": cast_in(param_transform(variables["params"]))}
            out = cast_out(apply_fn(variables, cast_in(inputs), train=False))
            mout = _metrics_view(out)
            new_dev = valid_metrics.update_device_only(dev_metric_states, mout, targets)
            host_aux = valid_metrics.preprocess_device(mout, targets)
            loss, _ = criterion(out, targets)
            return new_dev, host_aux, loss

          return jax.jit(eval_step)

        train_step, eval_step = _build_steps(criterion)

        # ---- callbacks / context ----------------------------------------
        def _resolve_callback(c):
            """Accept Callback instances, registry names, or {name: params} dicts
            (recipes declare phase_callbacks in YAML — ref default_train_params)."""
            if isinstance(c, Callback):
                return c
            from super_gradients_tpu.common.registry import CALLBACKS

            if isinstance(c, str):
                if c not in CALLBACKS:
                    raise KeyError(f"Unknown callback `{c}`; registered: {sorted(CALLBACKS)}")
                return CALLBACKS[c]()
            if isinstance(c, dict) and len(c) == 1:
                name, params = next(iter(c.items()))
                if name not in CALLBACKS:
                    raise KeyError(f"Unknown callback `{name}`; registered: {sorted(CALLBACKS)}")
                return CALLBACKS[name](**(params or {}))
            raise TypeError(f"Cannot resolve phase callback from {c!r}")

        callbacks = [_resolve_callback(c) for c in list(tp.get("phase_callbacks") or []) + list(additional_callbacks or [])]
        handler = CallbackHandler(callbacks)
        context = PhaseContext(
            trainer=self,
            model=model,
            training_params=tp,
            experiment_name=self.experiment_name,
            ckpt_dir=self.ckpt_dir,
            train_loader=train_loader,
            valid_loader=valid_loader,
        )

        # cadence / naming knobs read up-front (their action sites are conditional;
        # reading here lets the silent-drop guard distinguish "consumed, acted on
        # when relevant" from "ignored")
        run_test_freq = int(tp.get("run_test_freq") or 1)
        run_validation_freq = int(tp.get("run_validation_freq") or 1)
        precise_bn_batches = int(tp.get("precise_bn_batch_size") or 16)
        ckpt_name = tp.get("ckpt_name", "ckpt_latest")
        ckpt_best_name = tp.get("ckpt_best_name", "ckpt_best")
        save_ckpt_epoch_list = list(tp.get("save_ckpt_epoch_list") or [])
        tp.get("load_opt_params", True)  # acted on inside _try_resume when resuming

        metric_to_watch = tp.get("metric_to_watch", "Accuracy")
        best_tracker = ckpt_utils.BestCheckpointTracker(bool(tp.get("greater_metric_to_watch_is_better", True)))
        averager = ckpt_utils.AverageBestModels(greater_is_better=best_tracker.greater_is_better) if tp.get("average_best_models") else None

        data_sharding = batch_sharding(mesh)
        silent = bool(tp.get("silent_mode")) or jax.process_index() != 0

        # ---- experiment logger (ref sg_trainer.py:1985-2040) -----------
        from super_gradients_tpu.common.sg_loggers import get_sg_logger

        sg_logger_params = dict(tp.get("sg_logger_params") or {})
        sg_logger_params.setdefault("experiment_name", self.experiment_name)
        sg_logger_params.setdefault("checkpoints_dir_path", self.ckpt_dir)
        self.sg_logger = get_sg_logger(tp.get("sg_logger", "base_sg_logger"), **sg_logger_params)
        self.sg_logger.add_config("training_params", {k: v for k, v in tp.items() if not callable(v)})
        context.update_context(sg_logger=self.sg_logger)

        handler.on_training_start(context)
        max_train_batches = tp.get("max_train_batches")
        max_valid_batches = tp.get("max_valid_batches")
        # host-sync cadence: loss/lr floats are fetched every N batches only, keeping
        # XLA dispatch fully async in between (ref weak: per-step float() serialized
        # H2D/compute on TPU)
        sync_every = int(tp.get("train_logging_frequency") or 50)

        mesh_batch_axis = int(mesh.shape.get("batch", 1)) if mesh is not None else 1
        repl_sharding = replicated_sharding(mesh)

        def put_batch(arr):
            """device_put with batch sharding; a final partial batch that does not
            divide the mesh batch axis falls back to replicated placement (exact,
            one extra compile) instead of raising a sharding error. Pytree-aware:
            dense-target tasks (e.g. DEKR) ship tuples of target tensors."""

            def _put(x):
                a = jnp.asarray(x)
                sh = data_sharding if a.shape[0] % mesh_batch_axis == 0 else repl_sharding
                return jax.device_put(a, sh)

            return jax.tree_util.tree_map(_put, arr)

        try:
            for epoch in range(start_epoch, max_epochs):
                context.update_context(epoch=epoch)
                if context.stop_training:
                    break
                train_loader.set_epoch(epoch) if hasattr(train_loader, "set_epoch") else None
                handler.on_train_loader_start(context)
                # stage-switch callbacks may have requested a criterion change —
                # rebuild + re-jit the steps once (ref sg_trainer loss mutation via
                # YoloX/PPYoloE stage-switch callbacks)
                if context._criterion_updates:
                    if callable(tp.get("loss")) and not isinstance(tp.get("loss"), str):
                        logger.warning("criterion update requested but loss is an instance — ignoring")
                    else:
                        new_cp = {**(tp.get("criterion_params") or {}), **context._criterion_updates}
                        tp["criterion_params"] = new_cp
                        criterion = get_loss(tp.get("loss"), new_cp)
                        train_step, eval_step = _build_steps(criterion)
                        logger.info(f"Criterion rebuilt with {context._criterion_updates} (epoch {epoch})")
                    context._criterion_updates = {}
                t0 = time.time()
                loss_sum, loss_count = jnp.zeros(()), 0
                last_metrics = {}
                train_mstates = train_metrics.init()
                py_step = int(state.step)  # host-side step counter — never read state.step per batch

                def _device_prefetched(loader):
                    """Double-buffer host→device: the next batch's (async) device_put
                    is issued while the current step computes, so H2D overlaps the
                    train step instead of serializing before it."""
                    from collections import deque

                    buf = deque()
                    for b in loader:
                        buf.append((put_batch(b[0]), put_batch(b[1]), b))
                        if len(buf) >= 2:
                            yield buf.popleft()
                    while buf:
                        yield buf.popleft()

                for batch_idx, (inputs, targets, batch) in enumerate(_device_prefetched(train_loader)):
                    if max_train_batches and batch_idx >= max_train_batches:
                        break
                    context.update_context(batch_idx=batch_idx, step=py_step, train_batch=batch)
                    handler.on_train_batch_start(context)
                    train_dev = train_metrics.device_states(train_mstates)
                    state, new_train_dev, train_host_aux, step_metrics = train_step(state, train_dev, inputs, targets)
                    train_mstates = train_metrics.merge_device_states(train_mstates, new_train_dev)
                    if has_train_metrics and train_metrics.has_host_metrics():
                        train_mstates = train_metrics.update_host(
                            train_mstates, jax.device_get(train_host_aux), np.asarray(batch[1])
                        )
                    loss_sum = loss_sum + step_metrics["loss"]
                    loss_count += 1
                    py_step += 1
                    last_metrics = step_metrics
                    context.step_metrics = step_metrics  # device dict; float() on read syncs
                    if loss_count % sync_every == 0:
                        context.update_context(
                            loss_avg=float(loss_sum) / loss_count, lr=float(step_metrics["lr"])
                        )
                    handler.on_train_batch_end(context)
                epoch_time = time.time() - t0
                train_loss = float(loss_sum) / max(loss_count, 1)
                self.train_loss_history.append(train_loss)
                context.update_context(loss_avg=train_loss, lr=float(last_metrics["lr"]) if last_metrics else None)
                context.metrics_dict.update({"train_loss": train_loss})
                train_results = train_metrics.compute(train_mstates) if has_train_metrics else {}
                if has_train_metrics:
                    self.train_metrics_history.append(train_results)
                context.metrics_dict.update({f"Train_{k}": v for k, v in train_results.items()})
                # live weights for visualization/inspection callbacks (ref: context.net)
                context.update_context(eval_variables=self._eval_variables(state, use_ema, has_bn), train_state=state)
                handler.on_train_loader_end(context)

                # ---------- precise BN (per-epoch, before validation — ref
                # sg_trainer.py:1552-1562: affects metric_to_watch & best ckpt) ----------
                if tp.get("precise_bn") and has_bn:
                    from super_gradients_tpu.training.precise_bn import precise_bn_stats

                    precise = precise_bn_stats(module, state.params, state.batch_stats, train_loader, num_batches=precise_bn_batches)
                    # copy recomputed buffers into the EMA branch too (the reference's
                    # ModelEMA.update_attr copies non-param buffers before validation)
                    state = state.replace(
                        batch_stats=precise,
                        ema_batch_stats=jax.tree_util.tree_map(lambda x: x, precise) if use_ema else state.ema_batch_stats,
                    )

                # ---------- validation ----------
                should_validate = valid_loader is not None and (
                    (epoch + 1) % run_validation_freq == 0 or epoch == max_epochs - 1
                )
                valid_results: Dict[str, float] = {}
                if should_validate:
                    handler.on_validation_loader_start(context)
                    eval_vars = self._eval_variables(state, use_ema, has_bn)
                    valid_results = self._run_eval_loop(
                        eval_step, eval_vars, valid_metrics, valid_loader, put_batch, max_valid_batches, handler, context
                    )
                    self.valid_metrics_history.append(valid_results)
                    context.update_context(valid_metrics=valid_results)
                    handler.on_validation_loader_end(context)

                # ---------- test loaders (ref sg_trainer.py:1596-1615) ----------
                test_results: Dict[str, Dict[str, float]] = {}
                should_test = test_loaders and (
                    (epoch + 1) % run_test_freq == 0 or epoch == max_epochs - 1
                )
                if should_test:
                    eval_vars = self._eval_variables(state, use_ema, has_bn)
                    for tname, tloader in test_loaders.items():
                        res = self._run_eval_loop(
                            eval_step, eval_vars, valid_metrics, tloader, put_batch, max_valid_batches, None, context
                        )
                        test_results[tname] = res
                        context.metrics_dict.update({f"{tname}:{k}": v for k, v in res.items()})
                    self.test_metrics_history.append(test_results)
                    handler.on_test_loader_end(context)

                if not silent:
                    msg = f"Epoch {epoch + 1}/{max_epochs} | loss {train_loss:.4f} | {epoch_time:.1f}s"
                    if valid_results:
                        msg += " | " + " ".join(f"{k}={v:.4f}" for k, v in valid_results.items())
                    logger.info(msg)

                self.sg_logger.add_scalar("Train/loss", train_loss, epoch)
                for k, v in train_results.items():
                    self.sg_logger.add_scalar(f"Train/{k}", v, epoch)
                if "lr" in last_metrics:
                    self.sg_logger.add_scalar("Train/lr", float(last_metrics["lr"]), epoch)
                self.sg_logger.add_scalar("Train/epoch_time_s", epoch_time, epoch)
                for k, v in valid_results.items():
                    self.sg_logger.add_scalar(f"Valid/{k}", v, epoch)
                for tname, res in test_results.items():
                    for k, v in res.items():
                        self.sg_logger.add_scalar(f"Test_{tname}/{k}", v, epoch)
                self.sg_logger.flush()

                # ---------- checkpointing ----------
                if tp.get("save_model", True) and jax.process_index() == 0:
                    self._save_epoch_checkpoints(
                        state, model, epoch, valid_results, metric_to_watch, best_tracker, averager, use_ema, has_bn,
                        ckpt_name=ckpt_name, ckpt_best_name=ckpt_best_name, save_ckpt_epoch_list=save_ckpt_epoch_list,
                    )
        except KeyboardInterrupt:
            logger.info("Ctrl-C — finishing gracefully (checkpoint preserved)")

        handler.on_training_end(context)
        self.sg_logger.close()

        unread = tp.unread_keys()
        self.unconsumed_training_params = unread
        if unread:
            logger.warning(
                f"training_params keys declared but never consumed this run (silent-drop guard): {unread} — "
                f"each is either unsupported on TPU or misspelled; file an issue if you expected an effect"
            )

        # hand the trained weights back to the model wrapper (EMA if enabled)
        final_vars = self._eval_variables(state, use_ema, has_bn)
        model.update_variables(jax.device_get(final_vars))
        self.train_state = state
        return model

    def _run_eval_loop(self, eval_step, eval_vars, metrics, loader, put_batch, max_batches, handler, context) -> Dict[str, float]:
        """One pass over ``loader`` with the jitted eval step (validation & test_loaders)."""
        mstates = metrics.init()
        vloss_sum, vcount = jnp.zeros(()), 0
        for vidx, batch in enumerate(loader):
            if max_batches and vidx >= max_batches:
                break
            if context is not None:
                context.update_context(batch_idx=vidx, valid_batch=batch)
            inputs = put_batch(batch[0])
            targets = put_batch(batch[1])
            dev_states = metrics.device_states(mstates)
            new_dev, host_aux, vloss = eval_step(eval_vars, dev_states, inputs, targets)
            mstates = metrics.merge_device_states(mstates, new_dev)
            if metrics.has_host_metrics():
                mstates = metrics.update_host(mstates, jax.device_get(host_aux), np.asarray(batch[1]))
            vloss_sum = vloss_sum + vloss
            vcount += 1
            if handler is not None:
                handler.on_validation_batch_end(context)
        results = metrics.compute(mstates)
        results["Loss"] = float(vloss_sum) / max(vcount, 1)
        return results

    # ------------------------------------------------------------ internals

    @staticmethod
    def _eval_variables(state: TrainState, use_ema: bool, has_bn: bool) -> Dict:
        v = state.ema_variables if use_ema else state.variables
        return v

    def _save_epoch_checkpoints(self, state, model, epoch, valid_results, metric_to_watch, best_tracker, averager,
                                use_ema, has_bn, ckpt_name="ckpt_latest", ckpt_best_name="ckpt_best",
                                save_ckpt_epoch_list=()):
        state_tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats or {},
            "ema_params": state.ema_params if use_ema else {},
            "ema_batch_stats": (state.ema_batch_stats or {}) if use_ema else {},
            # full optimizer state (momentum / Adam moments / MultiSteps counters) —
            # ref sg_trainer.py:692-715 saves optimizer_state_dict; without it resume
            # silently resets momentum
            "opt_state": state.opt_state,
        }
        meta = {"epoch": epoch, "metrics": valid_results, "experiment": self.experiment_name, "ckpt_version": 2}
        ckpt_utils.save_checkpoint(self.ckpt_dir, ckpt_name, state_tree, meta)

        if epoch in (save_ckpt_epoch_list or ()):
            ckpt_utils.save_checkpoint(self.ckpt_dir, f"ckpt_epoch_{epoch}", state_tree, meta)

        watched = valid_results.get(metric_to_watch)
        if watched is not None:
            if averager is not None:
                averager.update(watched, state.ema_params if use_ema else state.params)
            if best_tracker.is_improvement(watched):
                self.best_metric = watched
                ckpt_utils.save_checkpoint(self.ckpt_dir, ckpt_best_name, state_tree, meta)
                logger.info(f"New best {metric_to_watch}={watched:.4f} → ckpt_best")
        if averager is not None and averager.snapshots:
            avg = averager.averaged_params()
            ckpt_utils.save_checkpoint(self.ckpt_dir, "average_model", {"params": avg, "batch_stats": state.batch_stats or {}})

    def _try_resume(self, tp, state: TrainState):
        resume_path = tp.get("resume_path")
        if resume_path:
            ckpt_dir, name = os.path.split(os.path.abspath(resume_path))
        else:
            run_id = tp.get("run_id") or get_latest_run_id(self.experiment_name, self.ckpt_root_dir)
            if run_id is None:
                logger.warning("resume=True but no previous run found — starting fresh")
                return state, 0
            self.run_id = run_id  # continue in the same run dir
            self.ckpt_dir = get_checkpoints_dir_path(self.experiment_name, self.ckpt_root_dir, run_id)
            ckpt_dir, name = self.ckpt_dir, tp.get("ckpt_name", "ckpt_latest")
        if not ckpt_utils.checkpoint_exists(ckpt_dir, name):
            logger.warning(f"resume checkpoint {ckpt_dir}/{name} missing — starting fresh")
            return state, 0
        meta = ckpt_utils.load_metadata(ckpt_dir, name)
        target = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats or {},
            "ema_params": state.ema_params or {},
            "ema_batch_stats": state.ema_batch_stats or {},
        }
        # the restore target must match the saved tree structure, so opt_state is
        # always included for v2 checkpoints; load_opt_params=False discards it
        # after the restore (momentum/moments start fresh — ref sg_trainer.py:1331,1419)
        has_opt = int(meta.get("ckpt_version", 1)) >= 2
        restore_opt = has_opt and bool(tp.get("load_opt_params", True))
        if has_opt:
            target["opt_state"] = state.opt_state
        restored = ckpt_utils.load_checkpoint(ckpt_dir, name, target)
        start_epoch = int(meta.get("epoch", -1)) + 1
        state = state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"] or state.batch_stats,
            ema_params=restored["ema_params"] if state.ema_params is not None else None,
            ema_batch_stats=restored["ema_batch_stats"] if state.ema_batch_stats is not None else None,
            opt_state=restored["opt_state"] if restore_opt else state.opt_state,
        )
        if not restore_opt:
            if not tp.get("load_opt_params", True):
                logger.info("load_opt_params=False — momentum/moments start fresh")
            else:
                logger.warning("Checkpoint has no optimizer state (v1 format) — momentum/moments start fresh")
        logger.info(f"Resumed from {ckpt_dir}/{name} at epoch {start_epoch}")
        return state, start_epoch

    # ------------------------------------------------------- recipe persistence

    def _persist_recipe(self, tp: Dict, model):
        """Write the resolved recipe next to the checkpoints so
        ``resume_experiment`` can rebuild everything (ref cfg_utils.py:60
        load_experiment_cfg / sg_trainer.py:309-329)."""
        import json

        def _clean(obj):
            if isinstance(obj, dict):
                return {k: _clean(v) for k, v in obj.items() if not callable(v)}
            if isinstance(obj, (list, tuple)):
                return [_clean(v) for v in obj if not callable(v)]
            if isinstance(obj, (str, int, float, bool)) or obj is None:
                return obj
            return repr(obj)

        recipe = self._recipe_cfg if self._recipe_cfg is not None else {
            "experiment_name": self.experiment_name,
            "architecture": getattr(model, "name", None),
            "num_classes": getattr(model, "num_classes", None),
            "training_hyperparams": tp,
        }
        try:
            with open(os.path.join(self.ckpt_dir, "recipe.json"), "w") as f:
                json.dump(_clean(recipe), f, indent=2)
        except Exception as e:  # never fail training over recipe serialization
            logger.warning(f"Could not persist recipe.json: {e}")

    # ----------------------------------------------------------- evaluation

    def evaluate(self, model, data_loader, training_params: Dict = None, metrics_list=None) -> Dict[str, float]:
        """Standalone evaluation loop (ref Trainer.evaluate :2218 / test :2096)."""
        tp = _default_training_params()
        tp.update(training_params or {})
        mesh = get_mesh()
        metrics = MetricCollection([get_metric(m) for m in (metrics_list or tp.get("valid_metrics_list") or [])])
        criterion = get_loss(tp.get("loss"), tp.get("criterion_params")) if tp.get("loss") else None
        module = model.module
        variables = model.variables

        @jax.jit
        def eval_step(dev_states, inputs, targets):
            out = module.apply(variables, inputs, train=False)
            mout = _metrics_view(out)
            new_dev = metrics.update_device_only(dev_states, mout, targets)
            host_aux = metrics.preprocess_device(mout, targets)
            loss = criterion(out, targets)[0] if criterion is not None else jnp.zeros(())
            return new_dev, host_aux, loss

        data_sharding = batch_sharding(mesh)
        repl_sharding = replicated_sharding(mesh)
        mesh_batch_axis = int(mesh.shape.get("batch", 1)) if mesh is not None else 1
        mstates = metrics.init()
        # loss stays on device across the loop; ONE host sync at the end
        # (the per-batch float(loss) pattern serializes dispatch — same fix as the
        # train loop's train_logging_frequency batching)
        loss_sum, count = jnp.zeros(()), 0
        for batch in data_loader:
            a = jnp.asarray(batch[0])
            sh = data_sharding if a.shape[0] % mesh_batch_axis == 0 else repl_sharding
            inputs = jax.device_put(a, sh)
            targets = jax.device_put(jnp.asarray(batch[1]), sh)
            dev_states = metrics.device_states(mstates)
            new_dev, host_aux, loss = eval_step(dev_states, inputs, targets)
            mstates = metrics.merge_device_states(mstates, new_dev)
            if metrics.has_host_metrics():
                mstates = metrics.update_host(mstates, jax.device_get(host_aux), np.asarray(batch[1]))
            loss_sum = loss_sum + loss
            count += 1
        if count == 0:
            logger.warning("evaluate(): data loader yielded 0 batches (dataset smaller than "
                           "batch_size with drop_last?) — metrics are empty")
        results = metrics.compute(mstates)
        if criterion is not None:
            results["Loss"] = float(loss_sum) / max(count, 1)
        return results

    def test(self, model, test_loader, test_metrics_list=None, loss=None) -> Dict[str, float]:
        """ref Trainer.test (:2096)."""
        tp = {"loss": loss} if loss else {}
        return self.evaluate(model, test_loader, tp, metrics_list=test_metrics_list)

    # ----------------------------------------------------------- class APIs

    @staticmethod
    def _trigger_cfg_modifying_callbacks(cfg: Dict) -> Dict:
        """Run registered pre-launch callbacks over the cfg before anything is
        built (ref sg_trainer.py:255,300-306 _trigger_cfg_modifying_callbacks)."""
        from super_gradients_tpu.common.registry import PRE_LAUNCH_CALLBACKS

        for entry in cfg.get("pre_launch_callbacks_list") or []:
            if isinstance(entry, str):
                cb = PRE_LAUNCH_CALLBACKS[entry]()
            elif isinstance(entry, dict):
                name, params = next(iter(entry.items()))
                cb = PRE_LAUNCH_CALLBACKS[name](**(params or {}))
            else:
                cb = entry  # instance
            cfg = cb(cfg) or cfg
        return cfg

    @staticmethod
    def _model_from_cfg(cfg: Dict):
        """models.get with the FULL checkpoint_params surface (ref
        model_factory.py:192-256): checkpoint_path, pretrained_weights,
        load_backbone, strict_load, checkpoint_num_classes; for kd_module
        architectures the teacher subtree additionally honors
        teacher_pretrained_weights / teacher_checkpoint_path (ref
        kd_trainer.py:85-92 — a random teacher would distill noise)."""
        from super_gradients_tpu import models

        cp = cfg.get("checkpoint_params") or {}
        model = models.get(
            cfg["architecture"],
            num_classes=cfg.get("num_classes") or (cfg.get("arch_params") or {}).get("num_classes"),
            arch_params=cfg.get("arch_params"),
            checkpoint_path=cp.get("checkpoint_path"),
            pretrained_weights=cp.get("pretrained_weights"),
            checkpoint_num_classes=cp.get("checkpoint_num_classes"),
            load_backbone=bool(cp.get("load_backbone")),
            strict_load=cp.get("strict_load"),
        )
        teacher_src = cp.get("teacher_pretrained_weights") or cp.get("teacher_checkpoint_path")
        if teacher_src and "teacher" in (model.params or {}):
            ap = cfg.get("arch_params") or {}
            teacher_name = ap.get("teacher") or ap.get("teacher_architecture")
            if teacher_name is None:
                raise ValueError("teacher_pretrained_weights set but arch_params has no teacher name")
            teacher = models.get(
                teacher_name,
                num_classes=cfg.get("num_classes") or ap.get("num_classes"),
                arch_params=ap.get("teacher_arch_params"),
                pretrained_weights=cp.get("teacher_pretrained_weights"),
                checkpoint_path=cp.get("teacher_checkpoint_path"),
            )
            variables = {col: dict(tree) for col, tree in model.variables.items()}
            variables["params"]["teacher"] = teacher.params
            if teacher.batch_stats:
                variables.setdefault("batch_stats", {})["teacher"] = teacher.batch_stats
            model.update_variables(variables)
            logger.info(f"kd_module teacher `{teacher_name}` loaded from {teacher_src}")
        return model

    @classmethod
    def train_from_config(cls, cfg: Dict):
        """Recipe entry (ref sg_trainer.py:234): build model + loaders + train."""
        from super_gradients_tpu.training import dataloaders

        cfg = cls._trigger_cfg_modifying_callbacks(dict(cfg))
        trainer = cls(experiment_name=cfg.get("experiment_name", "experiment"), ckpt_root_dir=cfg.get("ckpt_root_dir"))
        trainer._recipe_cfg = cfg
        model = cls._model_from_cfg(cfg)
        train_loader = dataloaders.get(
            cfg.get("train_dataloader"),
            dataset_params=(cfg.get("dataset_params") or {}).get("train_dataset_params"),
            dataloader_params=(cfg.get("dataset_params") or {}).get("train_dataloader_params"),
        )
        valid_loader = dataloaders.get(
            cfg.get("val_dataloader"),
            dataset_params=(cfg.get("dataset_params") or {}).get("val_dataset_params"),
            dataloader_params=(cfg.get("dataset_params") or {}).get("val_dataloader_params"),
        )
        model = trainer.train(model, cfg.get("training_hyperparams") or {}, train_loader, valid_loader)
        return model, trainer

    @classmethod
    def evaluate_checkpoint(cls, experiment_name: str, ckpt_root_dir: Optional[str] = None,
                            ckpt_name: str = "ckpt_best", run_id: Optional[str] = None) -> Dict[str, float]:
        """Reload a previous run's persisted recipe, rebuild model + val loader,
        load the named checkpoint and run validation
        (ref Trainer.evaluate_checkpoint, sg_trainer.py:407)."""
        import json

        from super_gradients_tpu.training import dataloaders
        from super_gradients_tpu.training.checkpoints import load_checkpoint_into_model

        run_id = run_id or get_latest_run_id(experiment_name, ckpt_root_dir)
        if run_id is None:
            raise FileNotFoundError(f"No previous run found for experiment `{experiment_name}`")
        ckpt_dir = get_checkpoints_dir_path(experiment_name, ckpt_root_dir, run_id)
        recipe_path = os.path.join(ckpt_dir, "recipe.json")
        if not os.path.exists(recipe_path):
            raise FileNotFoundError(f"{recipe_path} missing — evaluate_checkpoint needs a recipe-launched run")
        with open(recipe_path) as f:
            cfg = json.load(f)
        model = cls._model_from_cfg(cfg)
        load_checkpoint_into_model(model, os.path.join(ckpt_dir, ckpt_name))
        valid_loader = dataloaders.get(
            cfg.get("val_dataloader"),
            dataset_params=(cfg.get("dataset_params") or {}).get("val_dataset_params"),
            dataloader_params=(cfg.get("dataset_params") or {}).get("val_dataloader_params"),
        )
        trainer = cls(experiment_name, ckpt_root_dir=ckpt_root_dir)
        return trainer.evaluate(model, valid_loader, cfg.get("training_hyperparams") or {})

    @classmethod
    def resume_experiment(cls, experiment_name: str, ckpt_root_dir: Optional[str] = None, run_id: Optional[str] = None):
        """Reload the persisted recipe of a previous run and continue training
        (ref sg_trainer.py:309-329 + cfg_utils.py:60 load_experiment_cfg)."""
        import json

        run_id = run_id or get_latest_run_id(experiment_name, ckpt_root_dir)
        if run_id is None:
            raise FileNotFoundError(f"No previous run found for experiment `{experiment_name}`")
        ckpt_dir = get_checkpoints_dir_path(experiment_name, ckpt_root_dir, run_id)
        recipe_path = os.path.join(ckpt_dir, "recipe.json")
        if not os.path.exists(recipe_path):
            raise FileNotFoundError(
                f"{recipe_path} missing — the run predates recipe persistence; "
                f"use train(..., training_params={{'resume': True}}) instead"
            )
        with open(recipe_path) as f:
            cfg = json.load(f)
        if "architecture" not in cfg or cfg.get("train_dataloader") is None and "dataset_params" not in cfg:
            raise ValueError(
                "Persisted recipe lacks model/dataloader config (the run was launched via "
                "Trainer.train() directly) — resume by calling train() again with "
                "training_params={'resume': True, 'run_id': run_id}"
            )
        cfg.setdefault("training_hyperparams", {})
        cfg["training_hyperparams"]["resume"] = True
        cfg["training_hyperparams"]["run_id"] = run_id
        if ckpt_root_dir:
            cfg["ckpt_root_dir"] = ckpt_root_dir
        return cls.train_from_config(cfg)
