"""Full training loop: epochs, validation, checkpointing, resume, metrics.

Port of the reference trainers' outer loops (`yoloface/pytorch/train.py:
281-475` and `yoloface/tensorflow/train_tf.py:756-960`), TPU-native:

  * one jitted, data-parallel train step (`yoloface_tpu.train.steps`)
    sharded over a 1-D device mesh;
  * Orbax checkpointing (params + batch_stats + optimizer state + step),
    with auto-resume from the latest checkpoint — the analogue of
    train_tf.py's tf.train.Checkpoint restore (:944-960);
  * best-checkpoint tracking by validation loss (train.py:339-352);
  * metrics stream to ``metrics.jsonl`` (and TensorBoard via tf.summary if
    TensorFlow is importable) — the loss/lr curves of train_tf.py:782-821.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import numpy as np

from yoloface_tpu.models.yoloface import YoloFace
from yoloface_tpu.parallel import mesh as mesh_lib
from yoloface_tpu.train.data import AugmentConfig, FaceDataset
from yoloface_tpu.train.steps import (TrainConfig, init_state,
                                      make_eval_step,
                                      make_sharded_train_step,
                                      make_train_step)


@dataclasses.dataclass
class TrainerConfig(TrainConfig):
    train_dir: str = ""
    val_dir: str = ""
    checkpoint_dir: str = "checkpoints"
    save_interval: int = 10           # epochs (train.py Config.save_interval)
    log_every: int = 10               # steps
    seed: int = 0
    use_mesh: bool = True
    tensorboard: bool = False


class Trainer:
    def __init__(self, cfg: TrainerConfig, model: Optional[YoloFace] = None):
        self.cfg = cfg
        self.model = model or YoloFace()
        self.ckpt_dir = os.path.abspath(cfg.checkpoint_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)

        self.train_ds = FaceDataset(cfg.train_dir,
                                    augment_cfg=AugmentConfig())
        self.val_ds = (FaceDataset(cfg.val_dir) if cfg.val_dir else None)
        cfg.steps_per_epoch = max(len(self.train_ds) // cfg.batch_size, 1)

        if cfg.use_mesh and len(jax.devices()) > 1:
            self.mesh = mesh_lib.make_mesh()
            self.train_step = make_sharded_train_step(cfg, self.mesh,
                                                      self.model)
        else:
            self.mesh = None
            self.train_step = jax.jit(make_train_step(cfg, self.model),
                                      donate_argnums=(0,))
        self.eval_step = make_eval_step(self.model)

        self.state = init_state(jax.random.PRNGKey(cfg.seed), cfg,
                                self.model)
        if self.mesh is not None:
            self.state = mesh_lib.replicate(self.state, self.mesh)
        self.start_epoch = 0
        self._maybe_resume()

        self._metrics_path = os.path.join(self.ckpt_dir, "metrics.jsonl")
        self._tb = None
        if cfg.tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(self.ckpt_dir, "tb"))
            except Exception:
                self._tb = None

    # ------------------------------------------------------------ ckpt io
    def _ckpt_mgr(self):
        import orbax.checkpoint as ocp
        return ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=5,
                                                 create=True))

    def _maybe_resume(self):
        """Auto-resume from the latest checkpoint (train_tf.py:944-960)."""
        import orbax.checkpoint as ocp
        mgr = self._ckpt_mgr()
        latest = mgr.latest_step()
        if latest is None:
            return
        target = jax.tree.map(np.asarray, self.state)
        restored = mgr.restore(
            latest, args=ocp.args.StandardRestore(target))
        self.state = (mesh_lib.replicate(restored, self.mesh)
                      if self.mesh is not None else
                      jax.tree.map(jax.numpy.asarray, restored))
        self.start_epoch = int(latest)
        print(f"resumed from checkpoint at epoch {latest}")

    def save(self, epoch: int):
        import orbax.checkpoint as ocp
        mgr = self._ckpt_mgr()
        mgr.save(epoch, args=ocp.args.StandardSave(
            jax.tree.map(np.asarray, self.state)))
        mgr.wait_until_finished()

    # ------------------------------------------------------------- logging
    def _log(self, record: dict):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in record.items():
                    if isinstance(v, (int, float)) and k != "epoch":
                        tf.summary.scalar(k, v, step=record.get("step", 0))

    # --------------------------------------------------------------- train
    def validate(self) -> float:
        if self.val_ds is None:
            return float("nan")
        losses = []
        for imgs, tgts in self.val_ds.batches(
                self.cfg.batch_size, shuffle=False, epochs=1,
                drop_remainder=False):
            losses.append(float(self.eval_step(self.state, imgs, tgts)))
        return float(np.mean(losses)) if losses else float("nan")

    def fit(self, epochs: Optional[int] = None) -> dict:
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        best_val = float("inf")
        history = {"train_loss": [], "val_loss": []}
        step = 0
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            epoch_losses = []
            it = self.train_ds.batches(cfg.batch_size, seed=cfg.seed + epoch,
                                       epochs=1)
            for imgs, tgts in it:
                if self.mesh is not None:
                    imgs, tgts = mesh_lib.shard_batch((imgs, tgts),
                                                      self.mesh)
                self.state, metrics = self.train_step(self.state, imgs, tgts)
                step += 1
                loss = float(metrics["loss"])
                epoch_losses.append(loss)
                if step % cfg.log_every == 0:
                    self._log({"step": step, "epoch": epoch, "loss": loss,
                               "lr": float(metrics["lr"]),
                               "grad_norm": float(metrics["grad_norm"])})
            train_loss = float(np.mean(epoch_losses)) if epoch_losses else 0.0
            val_loss = self.validate()
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            dt = time.time() - t0
            print(f"Epoch {epoch + 1}/{epochs}, Train Loss: {train_loss:.4f},"
                  f" Val Loss: {val_loss:.4f}, Time: {dt:.2f}s")
            self._log({"epoch": epoch, "train_loss": train_loss,
                       "val_loss": val_loss, "epoch_time_s": dt,
                       "step": step})
            if (epoch + 1) % cfg.save_interval == 0 or epoch == epochs - 1:
                self.save(epoch + 1)
            if np.isfinite(val_loss) and val_loss < best_val:
                best_val = val_loss
                self.save_best()
        try:
            self.plot_history(history)
        except Exception:
            pass  # plotting is best-effort observability
        return history

    def plot_history(self, history: dict, path: Optional[str] = None):
        """Loss/LR curves like the reference trainers (train.py:455-463,
        train_tf.py:864-904); writes ``training_curves.png``."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(10, 4))
        ax[0].plot(history["train_loss"], label="train")
        if any(np.isfinite(v) for v in history["val_loss"]):
            ax[0].plot(history["val_loss"], label="val")
        ax[0].set_xlabel("epoch")
        ax[0].set_ylabel("loss")
        ax[0].legend()
        ax[0].set_title("loss")
        lrs = []
        try:
            with open(self._metrics_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if "lr" in rec:
                        lrs.append(rec["lr"])
        except OSError:
            pass
        if lrs:
            ax[1].plot(lrs)
            ax[1].set_xlabel("logged step")
            ax[1].set_title("learning rate")
        fig.tight_layout()
        out = path or os.path.join(self.ckpt_dir, "training_curves.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        return out

    def save_best(self):
        """Best-model snapshot as a plain npz (the analogue of
        best_model.pth, train.py:349)."""
        flat = jax.tree_util.tree_flatten_with_path(
            {"params": self.state["params"],
             "batch_stats": self.state["batch_stats"]})[0]
        arrays = {jax.tree_util.keystr(path): np.asarray(leaf)
                  for path, leaf in flat}
        np.savez(os.path.join(self.ckpt_dir, "best_model.npz"), **arrays)
