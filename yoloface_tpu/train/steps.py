"""Training step + optimizer wiring, data-parallel over a device mesh.

Functional port of the reference trainer's inner loop
(`yoloface/pytorch/train.py:281-315`: forward → loss → backward →
clip_grad_norm(1.0) → Adam step, cosine-annealed LR), re-designed TPU-first:

  * one jitted ``train_step`` carries model params, BatchNorm batch_stats
    and optimizer state through a pure function;
  * data parallelism comes from sharding the batch over a 1-D
    ``jax.sharding.Mesh`` ('data' axis) and replicating params — XLA inserts
    the gradient all-reduce over ICI (the psum the reference never needed on
    one MCU);
  * BatchNorm statistics are synchronized across devices via
    ``axis_name='data'`` semantics implicitly: with jit-over-mesh, the batch
    dimension is global, so XLA computes global-batch statistics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from yoloface_tpu.models.yoloface import YoloFace
from yoloface_tpu.parallel import mesh as mesh_lib
from yoloface_tpu.train.loss import yolo_loss


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters from the reference `Config` (train.py:31-49)."""
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 100
    batch_size: int = 32
    grad_clip_norm: float = 1.0
    steps_per_epoch: int = 100          # for the cosine schedule horizon
    optimizer: str = "adam"             # adam | adamw | sgd (train_simplified)
    warmup_steps: int = 0
    min_lr_fraction: float = 0.01       # eta_min of CosineAnnealingLR
    # scheduler family from the reference's train_simplified.py:44-46,
    # 269-295: cosine (CosineAnnealingLR) | step (StepLR, gamma 0.5) |
    # plateau (ReduceLROnPlateau on the train loss, factor 0.5)
    lr_scheduler: str = "cosine"
    step_size_epochs: int = 20          # StepLR step_size
    step_gamma: float = 0.5             # StepLR gamma
    plateau_patience: int = 5           # ReduceLROnPlateau patience (steps
    plateau_factor: float = 0.5         # of the metric fed to update())


def make_optimizer(cfg: TrainConfig) -> Tuple[optax.GradientTransformation,
                                              optax.Schedule]:
    total_steps = max(cfg.epochs * cfg.steps_per_epoch, 1)
    if cfg.lr_scheduler == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=total_steps,
            end_value=cfg.learning_rate * cfg.min_lr_fraction,
        )
    elif cfg.lr_scheduler == "step":
        # StepLR: lr * gamma^(epoch // step_size), with linear warmup
        boundary = max(cfg.step_size_epochs * cfg.steps_per_epoch, 1)

        def schedule(count):
            lr = cfg.learning_rate * cfg.step_gamma ** (count // boundary)
            if cfg.warmup_steps:
                lr = lr * jnp.minimum(1.0, (count + 1) / cfg.warmup_steps)
            return lr
    elif cfg.lr_scheduler == "plateau":
        # base lr constant (+ warmup); the decay itself is the
        # reduce_on_plateau transform chained below, driven by the loss
        # value passed to tx.update — the jit-pure analogue of torch's
        # stateful ReduceLROnPlateau
        def schedule(count):
            lr = jnp.asarray(cfg.learning_rate)
            if cfg.warmup_steps:
                lr = lr * jnp.minimum(1.0, (count + 1) / cfg.warmup_steps)
            return lr
    else:
        raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")
    if cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay or 1e-4)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    links = [optax.clip_by_global_norm(cfg.grad_clip_norm), opt]
    if cfg.lr_scheduler == "plateau":
        links.append(optax.contrib.reduce_on_plateau(
            factor=cfg.plateau_factor, patience=cfg.plateau_patience,
            min_scale=1e-6 / cfg.learning_rate))
    tx = optax.chain(*links)
    return tx, schedule


def _plateau_scale(opt_state):
    """Current ReduceLROnPlateau scale (1.0 when no plateau link)."""
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "scale")):
        if hasattr(s, "scale"):
            return s.scale
    return jnp.asarray(1.0)


def init_state(rng, cfg: TrainConfig, model: Optional[YoloFace] = None,
               input_shape=(1, 56, 56, 3)):
    """Initialize params/batch_stats/opt_state as a plain dict pytree."""
    model = model or YoloFace()
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=True)
    tx, _ = make_optimizer(cfg)
    params = variables["params"]
    return {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(cfg: TrainConfig, model: Optional[YoloFace] = None):
    """Returns a pure train_step(state, images, targets) -> (state, metrics)."""
    model = model or YoloFace()
    tx, schedule = make_optimizer(cfg)

    def loss_fn(params, batch_stats, images, targets):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"])
        return yolo_loss(out, targets), mutated["batch_stats"]

    def train_step(state, images, targets):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"], state["batch_stats"],
                                   images, targets)
        # value= feeds the plateau scheduler when configured; the other
        # chains ignore extra args (optax extra-args protocol)
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"], value=loss)
        new_params = optax.apply_updates(state["params"], updates)
        gnorm = optax.global_norm(grads)
        new_state = {
            "params": new_params,
            "batch_stats": new_stats,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "lr": schedule(state["step"]) * _plateau_scale(new_opt)}
        return new_state, metrics

    return train_step


def make_sharded_train_step(cfg: TrainConfig, mesh,
                            model: Optional[YoloFace] = None):
    """The multi-chip training step: batch sharded over the 'data' axis,
    state replicated; XLA inserts the ICI all-reduce for gradients."""
    step = make_train_step(cfg, model)
    repl = mesh_lib.replicated(mesh)
    batch = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, batch, batch),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model: Optional[YoloFace] = None):
    model = model or YoloFace()

    def eval_step(state, images, targets):
        out = model.apply({"params": state["params"],
                           "batch_stats": state["batch_stats"]},
                          images, train=False)
        return yolo_loss(out, targets)

    return jax.jit(eval_step)
