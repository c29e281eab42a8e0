"""Training engine for learned reconstruction (reference: Trainer,
lensless/recon/utils.py:531-1496).

TPU-native redesign: the entire inner loop (forward, loss, grads, optax
update) is one jit function; data parallelism is sharding the batch over
the mesh 'data' axis (XLA inserts the gradient psum — replacing
DataParallel).  Feature parity:

* losses: L1/L2 on max-normalized, ROI-cropped outputs (utils.py:
  1006-1051), optional LPIPS term (1055-1068), optional L1 penalty on
  trainable-mask params (1069-1071);
* auxiliary losses: unrolled-output factor (1073-1115) and pre-processor
  measurement consistency ||H x_caminv - pre(y)|| (1117-1129);
* optimizers: Adam, or AdamW with weight decay masked off 1-D params
  (841-861);
* LR schedules: slow_start, final_lr exponential, exp_decay,
  cosine-with-5%-warmup, step (863-945) as optax schedules;
* NaN handling: optax.apply_if_finite replaces the skip_NAN step logic
  (1144-1165); global-norm clipping (1139-1142);
* trainable-mask co-optimization with its own optimizer + projection
  (1172-1176; hardware/trainable_mask.py protocol);
* per-epoch evaluation via eval.benchmark, best-model tracking by a
  configurable metric, checkpointing with config snapshot + metrics.json
  (1186-1354, 1421-1496) via orbax.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 10
    # optimizer (utils.py:841-861)
    optimizer: str = "Adam"
    lr: float = 1e-4
    weight_decay: float = 0.01
    # schedules (utils.py:863-945); at most one active
    slow_start: Optional[float] = None
    final_lr: Optional[float] = None
    exp_decay: Optional[float] = None
    cosine_decay_warmup: bool = False
    step: Optional[int] = None
    gamma: float = 0.1
    lr_step_epoch: bool = True  # epoch-level vs step-level schedules
    # losses
    loss: str = "l2"
    lpips_weight: Optional[float] = None
    l1_mask: Optional[float] = None
    unrolled_output_factor: Optional[float] = None
    pre_proc_aux: Optional[float] = None
    # stability
    clip_grad: Optional[float] = 1.0
    skip_nan: bool = False
    # ROI crop before loss {'vertical': (v0,v1), 'horizontal': (h0,h1)}
    crop: Optional[dict] = None
    # augmentation: rotate data+lensed+PSF by uniform(-deg, +deg) per
    # batch (utils.py:983-993)
    random_rotate: Optional[float] = None
    # per-epoch processor schedule (utils.py:1375-1400): epoch at which
    # the pre/post processor starts being applied / stops / resumes
    # receiving gradient updates.  None = from the start / never.
    pre_process_delay: Optional[int] = None
    post_process_delay: Optional[int] = None
    pre_process_freeze: Optional[int] = None
    post_process_freeze: Optional[int] = None
    pre_process_unfreeze: Optional[int] = None
    post_process_unfreeze: Optional[int] = None
    # eval / checkpoints
    # metric_for_best=None replicates the reference composite eval loss
    # (utils.py:1235-1253): MSE + lpips*LPIPS + aux terms, lower-better.
    metric_for_best: Optional[str] = "PSNR"
    save_dir: Optional[str] = None
    save_examples: bool = False  # per-epoch example reconstruction PNGs
    eval_batch_size: int = 4
    # known number of train batches per epoch (avoids materializing the
    # loader to count it; falls back to len(train_loader()) if sized)
    steps_per_epoch: Optional[int] = None


_HIGHER_BETTER = {"PSNR", "SSIM"}


def make_lr_schedule(config: TrainerConfig, steps_per_epoch: int) -> Callable:
    """optax schedule replicating utils.py:863-945 (as lr multipliers
    applied to config.lr)."""
    spe = max(steps_per_epoch, 1)

    def epoch_of(step):
        return step // spe if config.lr_step_epoch else step

    total = config.epochs * (1 if config.lr_step_epoch else spe)

    if config.slow_start:
        def sched(step):
            e = epoch_of(step)
            return config.lr * jnp.where(
                e == 0, config.slow_start,
                jnp.where(e == 1, math.sqrt(config.slow_start), 1.0),
            )
    elif config.final_lr:
        final_decay = (config.final_lr / config.lr) ** (1.0 / max(config.epochs - 1, 1))
        def sched(step):
            return config.lr * final_decay ** epoch_of(step)
    elif config.exp_decay:
        def sched(step):
            return config.lr * config.exp_decay ** epoch_of(step)
    elif config.cosine_decay_warmup:
        warmup = int(0.05 * total)
        def sched(step):
            s = epoch_of(step)
            warm = jnp.maximum(warmup, 1)
            progress = jnp.clip((s - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
            return config.lr * jnp.where(
                s < warmup, s / warm, 0.5 * (1 + jnp.cos(jnp.pi * progress))
            )
    elif config.step:
        def sched(step):
            return config.lr * config.gamma ** (epoch_of(step) // config.step)
    else:
        def sched(step):
            return jnp.asarray(config.lr)
    return sched


def make_optimizer(config: TrainerConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(config, steps_per_epoch)
    if config.optimizer == "AdamW":
        def decay_mask(params):
            return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
        core = optax.adamw(sched, weight_decay=config.weight_decay, mask=decay_mask)
    else:
        core = optax.adam(sched)
    chain = []
    if config.clip_grad:
        chain.append(optax.clip_by_global_norm(config.clip_grad))
    chain.append(core)
    tx = optax.chain(*chain)
    if config.skip_nan:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def measure_gradient(grads) -> float:
    """Global L2 norm of a gradient pytree (reference
    recon/utils.py:397-418 measure_gradient)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves)))


def gradient_norms(grads) -> dict:
    """Per-top-level-module L2 gradient norms — the per-component view
    the reference prints when diagnosing training (utils.py:397-418
    applied per submodule)."""
    out = {}
    for key, sub in (grads.items() if isinstance(grads, dict) else []):
        out[key] = measure_gradient(sub)
    return out


def _norm_crop(img, crop, eps=1e-12):
    """Max-normalize per sample then ROI-crop (utils.py:1006-1051)."""
    m = jnp.max(img, axis=(-1, -2, -3), keepdims=True) + eps
    img = img / m
    if crop is not None:
        img = img[..., crop["vertical"][0]:crop["vertical"][1],
                  crop["horizontal"][0]:crop["horizontal"][1], :]
    return img


class Trainer:
    """Orchestrates training of a TrainableRecon-style flax model.

    Parameters
    ----------
    model : flax module with ``__call__(data, psf, background=None, train=...)``
    psf : (D, H, W, C) array (ignored per-batch if batches carry 'psfs')
    train_loader : callable -> iterable of dict batches with keys
        'lensless', 'lensed' and optional 'psfs', 'background'
    test_batches : list of the same dict format (held-out eval)
    lpips_apply : optional ``(pred_nhwc, target_nhwc) -> (B,)`` callable
    mask : optional trainable-mask protocol object (see
        hardware/trainable_mask.py): attributes ``params``,
        ``get_psf(params)``, ``project(params)``, ``make_optimizer()``
    """

    def __init__(self, model, psf, train_loader, test_batches,
                 config: TrainerConfig = TrainerConfig(),
                 lpips_apply=None, mask=None, seed=0,
                 extra_eval_sets: Optional[dict] = None,
                 loggers: Optional[list] = None):
        self.model = model
        self.psf = jnp.asarray(psf)
        self.train_loader = train_loader
        self.test_batches = test_batches
        self.config = config
        self.lpips_apply = lpips_apply
        self.mask = mask
        # extra held-out sets (utils.py:1259-1301): name -> dict with
        # 'batches' and optional 'psf' (used when the set is not
        # multimask, i.e. its batches don't carry per-sample 'psfs')
        self.extra_eval_sets = extra_eval_sets or {}
        # observability sinks: callables (data_dict, step) -> None with
        # the wandb.log signature (see train/loggers.py; reference
        # utils.py:729-733, 1228-1307).  Per-step loss/lr and per-epoch
        # train loss + eval metrics flow through every logger.
        self.loggers: list = list(loggers or [])
        self.metrics_log: dict = {}
        # per-step scalar log (local wandb equivalent): appended as JSON
        # lines to <save_dir>/train_log.jsonl by train() each epoch
        self._step_log: list = []
        self._global_step = 0
        self.best_metric = None
        self.best_params = None
        self._rng = jax.random.PRNGKey(seed)
        self._np_rng = np.random.RandomState(seed)
        # processor schedule state; delays mean "skip until that epoch"
        self._skip_pre = config.pre_process_delay is not None
        self._skip_post = config.post_process_delay is not None
        self._frozen: frozenset = frozenset()

        # init params from the first batch
        first = next(iter(train_loader()))
        data0 = jnp.asarray(first["lensless"])
        psf0 = self._batch_psf(first)
        self._rng, sub = jax.random.split(self._rng)
        kwargs = {}
        if first.get("background") is not None:
            kwargs["background"] = jnp.asarray(first["background"])
        self.variables = self.model.init(sub, data0, psf0, **kwargs)
        self._has_batch_stats = "batch_stats" in self.variables

        if config.steps_per_epoch is not None:
            steps_per_epoch = config.steps_per_epoch
        else:
            # only use len() when the loader's iterable is sized — never
            # materialize it (an HITL loader may block per item)
            try:
                steps_per_epoch = len(train_loader())
            except TypeError:
                steps_per_epoch = max(len(test_batches), 1)
        self.tx = make_optimizer(config, steps_per_epoch)
        self.opt_state = self.tx.init(self.variables["params"])

        if self.mask is not None:
            self.mask_tx = self.mask.make_optimizer()
            self.mask_opt_state = self.mask_tx.init(self.mask.params)

        self._rebuild_step()

    def _rebuild_step(self):
        """(Re)jit the train step for the current skip/freeze
        configuration — the analog of the reference's re-counting of
        requires_grad params when the schedule changes (utils.py:1402-1407)."""
        self._train_step = jax.jit(self._build_train_step(
            self._skip_pre, self._skip_post, self._frozen))

    # ------------------------------------------------------------------

    def _batch_psf(self, batch):
        if batch.get("psfs") is not None:
            return jnp.asarray(batch["psfs"])
        if self.mask is not None:
            return self.mask.get_psf(self.mask.params)
        return self.psf

    def _active_model(self, skip_pre=False, skip_post=False):
        """Model with the schedule's skip flags applied (the full param
        tree is initialized once with everything on; skipped blocks just
        receive zero gradient)."""
        if (skip_pre or skip_post) and hasattr(self.model, "skip_pre"):
            return self.model.clone(skip_pre=skip_pre or self.model.skip_pre,
                                    skip_post=skip_post or self.model.skip_post)
        return self.model

    def _build_train_step(self, skip_pre=False, skip_post=False,
                          frozen: frozenset = frozenset()):
        cfg = self.config
        model = self._active_model(skip_pre, skip_post)
        base_loss = (lambda a, b: jnp.mean(jnp.abs(a - b))) if cfg.loss == "l1" \
            else (lambda a, b: jnp.mean((a - b) ** 2))
        need_inter = bool(cfg.unrolled_output_factor or cfg.pre_proc_aux)

        def loss_fn(params, batch_stats, data, psf, lensed, background, mask_params):
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            if mask_params is not None:
                psf = self.mask.get_psf(mask_params)

            kwargs = dict(train=True) if batch_stats is not None else {}
            mutable = ["batch_stats"] if batch_stats is not None else False
            out = model.apply(variables, data, psf,
                              background=background, mutable=mutable, **kwargs)
            new_stats = None
            if batch_stats is not None:
                out, updated = out
                new_stats = updated.get("batch_stats", batch_stats)

            if need_inter:
                y_pred, cam_inv, pre_out = out[0], out[1], out[2]
            else:
                y_pred = out if not isinstance(out, tuple) else out[0]
                cam_inv = pre_out = None

            yp = _norm_crop(y_pred, cfg.crop)
            yt = _norm_crop(lensed, cfg.crop)
            loss = base_loss(yp, yt)

            if cfg.lpips_weight and self.lpips_apply is not None:
                loss = loss + cfg.lpips_weight * jnp.mean(
                    self.lpips_apply(yp.reshape((-1,) + yp.shape[-3:]),
                                     yt.reshape((-1,) + yt.shape[-3:]))
                )

            if cfg.l1_mask and mask_params is not None:
                for p in jax.tree_util.tree_leaves(mask_params):
                    loss = loss + cfg.l1_mask * jnp.mean(jnp.abs(p))

            if cfg.unrolled_output_factor:
                ci = _norm_crop(cam_inv, cfg.crop)
                aux = base_loss(ci, yt)
                if cfg.lpips_weight and self.lpips_apply is not None:
                    aux = aux + cfg.lpips_weight * jnp.mean(
                        self.lpips_apply(ci.reshape((-1,) + ci.shape[-3:]),
                                         yt.reshape((-1,) + yt.shape[-3:]))
                    )
                loss = loss + cfg.unrolled_output_factor * aux

            if cfg.pre_proc_aux:
                from ..ops.fft_conv import FFTConvolver

                conv = FFTConvolver.from_psf(psf, pad=True, norm="ortho")
                eps = 1e-12
                ci_norm = cam_inv / (jnp.max(cam_inv, axis=(-1, -2, -3), keepdims=True) + eps)
                Hx = conv.convolve(ci_norm)
                mins = jnp.min(Hx, axis=(-1, -2, -3), keepdims=True)
                Hx = Hx - mins
                Hx = Hx / jnp.maximum(jnp.max(Hx, axis=(-1, -2, -3), keepdims=True), eps)
                err = jnp.sum((Hx - pre_out) ** 2, axis=(-1, -2, -3, -4)) / np.prod(psf.shape)
                loss = loss + cfg.pre_proc_aux * jnp.mean(err)

            return loss, new_stats

        def train_step(params, opt_state, batch_stats, data, psf, lensed,
                       background, mask_params, mask_opt_state):
            if mask_params is not None:
                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 6), has_aux=True
                )(params, batch_stats, data, psf, lensed, background, mask_params)
                grads, mask_grads = grads
            else:
                (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch_stats, data, psf, lensed, background, None
                )
                mask_grads = None

            updates, opt_state = self.tx.update(grads, opt_state, params)
            if frozen:
                # exact freeze (utils.py:1385-1397 freeze_pre/post_process):
                # zero the *updates* of frozen top-level blocks so stale
                # optimizer momentum cannot move them either
                updates = {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                               if k in frozen else v)
                           for k, v in updates.items()}
            params = optax.apply_updates(params, updates)

            if mask_params is not None:
                m_updates, mask_opt_state = self.mask_tx.update(
                    mask_grads, mask_opt_state, mask_params
                )
                mask_params = optax.apply_updates(mask_params, m_updates)
                mask_params = self.mask.project(mask_params)

            return params, opt_state, new_stats, loss, mask_params, mask_opt_state

        return train_step

    # ------------------------------------------------------------------

    def train_epoch(self) -> float:
        losses = []
        for batch in self.train_loader():
            data = jnp.asarray(batch["lensless"])
            lensed = jnp.asarray(batch["lensed"])
            background = (jnp.asarray(batch["background"])
                          if batch.get("background") is not None else None)
            psf = self._batch_psf(batch)
            if self.config.random_rotate:
                # random-rotate augmentation of data + truth + PSF
                # (utils.py:983-993); host-side like the data layer's
                # other geometry ops — shapes are unchanged so the jitted
                # step does not retrace
                from ..data.image import rotate_HWC

                angle = self._np_rng.uniform(-self.config.random_rotate,
                                             self.config.random_rotate)
                data = jnp.asarray(rotate_HWC(np.asarray(data), angle))
                lensed = jnp.asarray(rotate_HWC(np.asarray(lensed), angle))
                psf = jnp.asarray(rotate_HWC(np.asarray(psf), angle))
            stats = self.variables.get("batch_stats") if self._has_batch_stats else None
            mask_params = self.mask.params if self.mask is not None else None
            mask_opt = self.mask_opt_state if self.mask is not None else None

            params, self.opt_state, new_stats, loss, mask_params, mask_opt = \
                self._train_step(self.variables["params"], self.opt_state, stats,
                                 data, psf, lensed, background, mask_params, mask_opt)
            self.variables = dict(self.variables, params=params)
            if new_stats is not None:
                self.variables["batch_stats"] = new_stats
            if self.mask is not None:
                self.mask.params = mask_params
                self.mask_opt_state = mask_opt
            losses.append(float(loss))
            self._global_step += 1
            self._step_log.append({"step": self._global_step,
                                   "loss": float(loss)})
            self._log({"train/loss_step": float(loss)}, self._global_step)
        return float(np.mean(losses)) if losses else float("nan")

    def _log(self, data: dict, step: int):
        """Fan a scalar dict out to every registered logger; a failing
        sink must never take training down (observability is additive)."""
        for logger in self.loggers:
            try:
                logger(data, step)
            except Exception as e:  # pragma: no cover - defensive
                import warnings

                warnings.warn(f"logger {logger!r} failed: {e}")

    def _flush_step_log(self, epoch: int):
        """Append this epoch's per-step scalars to train_log.jsonl —
        the local equivalent of the reference's wandb.log stream
        (utils.py:1348-1354)."""
        if not self.config.save_dir or not self._step_log:
            self._step_log = []
            return
        os.makedirs(self.config.save_dir, exist_ok=True)
        path = os.path.join(self.config.save_dir, "train_log.jsonl")
        with open(path, "a") as f:
            for rec in self._step_log:
                f.write(json.dumps(dict(rec, epoch=epoch)) + "\n")
        self._step_log = []

    def save_examples(self, epoch: int, n_examples: int = 4):
        """Save example (lensless, reconstruction, truth) PNG triplets
        from the first eval batch — the reference logs these images to
        wandb each epoch (utils.py:1248-1258)."""
        if not self.config.save_dir:
            return
        from ..data.io import save_image

        batch = next(iter(self.test_batches())) if callable(self.test_batches) \
            else self.test_batches[0]
        data = jnp.asarray(batch["lensless"])[:n_examples]
        psf = self._batch_psf(batch)
        if psf.ndim > 4 and psf.shape[0] == batch["lensless"].shape[0]:
            psf = psf[:n_examples]
        model = self._active_model(self._skip_pre, self._skip_post)
        kwargs = {}
        if batch.get("background") is not None:
            kwargs["background"] = jnp.asarray(batch["background"])[:n_examples]
        out = model.apply(self.variables, data, psf, **kwargs)
        recon = np.asarray(out[0] if isinstance(out, tuple) else out)
        out_dir = os.path.join(self.config.save_dir, f"epoch{epoch}")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(min(n_examples, recon.shape[0])):
            img = np.squeeze(recon[i])
            save_image(img / max(img.max(), 1e-12),
                       os.path.join(out_dir, f"recon_{i}.png"))
            truth = np.squeeze(np.asarray(batch["lensed"][i]))
            save_image(truth / max(truth.max(), 1e-12),
                       os.path.join(out_dir, f"lensed_{i}.png"))
        return out_dir

    def _eval_batches(self, batches, psf_default) -> dict:
        """benchmark() over one eval set with per-batch PSFs and
        backgrounds forwarded (multimask / background-subtraction models
        are evaluated with the same inputs they train on)."""
        from ..eval.benchmark import benchmark

        model = self._active_model(self._skip_pre, self._skip_post)

        def reconstruct(lensless, psfs=None, background=None):
            psf = psfs if psfs is not None else psf_default
            kwargs = {}
            if background is not None:
                kwargs["background"] = background
            out = model.apply(self.variables, lensless, psf, **kwargs)
            return out[0] if isinstance(out, tuple) else out

        return benchmark(reconstruct, batches, crop=self.config.crop,
                         lpips_fn=self.lpips_apply)

    def evaluate(self) -> dict:
        """Held-out metrics + extra eval sets (utils.py:1186-1309).
        Extra-set metrics are namespaced ``<set>_<metric>``; sets whose
        batches carry per-sample 'psfs' (multimask) use those, otherwise
        the set's own 'psf' (or the training PSF)."""
        psf = self._batch_psf({})
        metrics = self._eval_batches(self.test_batches, psf)
        for name, spec in self.extra_eval_sets.items():
            set_psf = spec.get("psf")
            set_psf = psf if set_psf is None else jnp.asarray(set_psf)
            extra = self._eval_batches(spec["batches"], set_psf)
            for k, v in extra.items():
                metrics[f"{name}_{k}"] = v
        return metrics

    def train(self, verbose: bool = True, start_epoch: int = 0) -> dict:
        """Full loop: eval at epoch 0, then train/eval per epoch with the
        processor add/freeze/unfreeze schedule and best-model tracking
        (utils.py:1356-1419).  ``start_epoch`` (e.g. from :meth:`resume`)
        skips completed epochs AND replays the processor schedule up to
        that point so delayed/frozen processors resume in the right
        state."""
        if start_epoch == 0:
            metrics0 = self.evaluate()
            self.metrics_log[0] = {"eval": metrics0}
            self._maybe_update_best(metrics0)
            self._log(dict({"epoch": 0},
                           **{f"eval/{k}": v for k, v in metrics0.items()}), 0)
        cfg = self.config
        if start_epoch:
            # replay schedule flags for the skipped epochs
            changed = False
            for e in range(start_epoch):
                if cfg.pre_process_delay is not None and e == cfg.pre_process_delay:
                    self._skip_pre, changed = False, True
                if cfg.post_process_delay is not None and e == cfg.post_process_delay:
                    self._skip_post, changed = False, True
                frozen = set(self._frozen)
                for name, fz, uf in (("pre_block", cfg.pre_process_freeze,
                                      cfg.pre_process_unfreeze),
                                     ("post_block", cfg.post_process_freeze,
                                      cfg.post_process_unfreeze)):
                    if fz is not None and e == fz:
                        frozen.add(name); changed = True
                    if uf is not None and e == uf:
                        frozen.discard(name); changed = True
                self._frozen = frozenset(frozen)
            if changed:
                self._rebuild_step()
        for epoch in range(start_epoch + 1, cfg.epochs + 1):
            # schedule epochs are 0-based like the reference's loop index
            e = epoch - 1
            changed = False
            if cfg.pre_process_delay is not None and e == cfg.pre_process_delay:
                self._skip_pre, changed = False, True
            if cfg.post_process_delay is not None and e == cfg.post_process_delay:
                self._skip_post, changed = False, True
            frozen = set(self._frozen)
            if cfg.pre_process_freeze is not None and e == cfg.pre_process_freeze:
                frozen.add("pre_block"); changed = True
            if cfg.post_process_freeze is not None and e == cfg.post_process_freeze:
                frozen.add("post_block"); changed = True
            if cfg.pre_process_unfreeze is not None and e == cfg.pre_process_unfreeze:
                frozen.discard("pre_block"); changed = True
            if cfg.post_process_unfreeze is not None and e == cfg.post_process_unfreeze:
                frozen.discard("post_block"); changed = True
            if changed:
                self._frozen = frozenset(frozen)
                self._rebuild_step()
                if verbose:
                    print(f"epoch {epoch}: schedule change — "
                          f"skip_pre={self._skip_pre} skip_post={self._skip_post} "
                          f"frozen={sorted(self._frozen)}")

            train_loss = self.train_epoch()
            eval_metrics = self.evaluate()
            self.metrics_log[epoch] = {"loss": train_loss, "eval": eval_metrics}
            self._maybe_update_best(eval_metrics)
            self._flush_step_log(epoch)
            self._log(dict({"epoch": epoch, "train/loss": train_loss},
                           **{f"eval/{k}": v for k, v in eval_metrics.items()}),
                      self._global_step)
            if verbose:
                print(f"epoch {epoch}: loss={train_loss:.6f} {eval_metrics}")
            if self.config.save_dir:
                self.save(epoch)
                if self.config.save_examples:
                    ex_dir = self.save_examples(epoch)
                    if ex_dir:
                        self._log({"examples_dir": ex_dir}, self._global_step)
        return self.metrics_log

    def _eval_loss(self, metrics: dict) -> float:
        """Reference composite eval loss when no best-metric is named
        (utils.py:1235-1253): MSE + lpips*LPIPS + l1*|mask| (+ aux
        terms); lower is better."""
        cfg = self.config
        loss = metrics.get("MSE", 0.0)
        if cfg.lpips_weight and "LPIPS_Vgg" in metrics:
            loss += cfg.lpips_weight * metrics["LPIPS_Vgg"]
        if cfg.l1_mask and self.mask is not None:
            for p in jax.tree_util.tree_leaves(self.mask.params):
                loss += cfg.l1_mask * float(jnp.mean(jnp.abs(p)))
        if cfg.unrolled_output_factor and "MSE_unrolled" in metrics:
            aux = metrics["MSE_unrolled"]
            if cfg.lpips_weight and "LPIPS_Vgg_unrolled" in metrics:
                aux += cfg.lpips_weight * metrics["LPIPS_Vgg_unrolled"]
            loss += cfg.unrolled_output_factor * aux
        if cfg.pre_proc_aux and "ReconstructionError_PreProc" in metrics:
            loss += cfg.pre_proc_aux * metrics["ReconstructionError_PreProc"]
        return float(loss)

    def _maybe_update_best(self, metrics: dict):
        key = self.config.metric_for_best
        if key is None:
            val, higher = self._eval_loss(metrics), False
        elif key in metrics:
            val, higher = metrics[key], key in _HIGHER_BETTER
        else:
            return
        better = (self.best_metric is None
                  or (val > self.best_metric if higher else val < self.best_metric))
        if better:
            self.best_metric = val
            self.best_params = jax.tree_util.tree_map(lambda x: x, self.variables)

    def save(self, epoch, best: bool = True):
        """Checkpoint params (+ best) with config + metrics snapshot
        (utils.py:1421-1496 analog, via orbax)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(self.config.save_dir)
        os.makedirs(path, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, f"recon_epoch{epoch}"), self.variables, force=True)
        if best and self.best_params is not None:
            ckptr.save(os.path.join(path, "recon_epochBEST"), self.best_params, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(path, "metrics.json"), "w") as f:
            json.dump(self.metrics_log, f, indent=2, default=float)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.config), f, indent=2, default=str)
        if self.mask is not None:
            np.save(os.path.join(path, "mask_params.npy"),
                    np.asarray(jax.tree_util.tree_leaves(self.mask.params)[0]))
            # learned PSF alongside the raw mask params (utils.py:1421-1496
            # saves psf.npy / psf.png per checkpoint)
            np.save(os.path.join(path, "psf.npy"),
                    np.asarray(self.mask.get_psf(self.mask.params)))

    def restore(self, ckpt_dir: Optional[str] = None, epoch="BEST"):
        """Restore model variables from an orbax checkpoint written by
        ``save`` — the resume path the reference lacks (its Trainer can
        only load final weights through model_dict).  ``epoch`` is an int
        or 'BEST'."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(ckpt_dir or self.config.save_dir)
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            self.variables)
        self.variables = ckptr.restore(
            os.path.join(path, f"recon_epoch{epoch}"), target)
        metrics_path = os.path.join(path, "metrics.json")
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                self.metrics_log = {int(k): v for k, v in json.load(f).items()}
        return self.variables

    def resume(self, ckpt_dir: Optional[str] = None) -> int:
        """Restore the latest epoch checkpoint + metrics log and return
        the epoch to continue from."""
        path = os.path.abspath(ckpt_dir or self.config.save_dir)
        epochs = sorted(int(d.rsplit("epoch", 1)[1])
                        for d in os.listdir(path)
                        if d.startswith("recon_epoch")
                        and d.rsplit("epoch", 1)[1].isdigit())
        if not epochs:
            return 0
        self.restore(path, epochs[-1])
        return epochs[-1]
