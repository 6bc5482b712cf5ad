"""Training CLI: ``python -m yoloface_tpu.train --train-dir ... [options]``.

The entry-point analogue of ``python train.py`` (yoloface/pytorch/train.py
main :406) / ``python train_tf.py`` with argparse like yoloface_test.py."""

import argparse

from yoloface_tpu.train.trainer import Trainer, TrainerConfig


def main(argv=None):
    p = argparse.ArgumentParser(description="Train yoloface on TPU")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", default="")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adamw", "sgd"])
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--save-interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-mesh", action="store_true",
                   help="disable data-parallel sharding")
    p.add_argument("--tensorboard", action="store_true")
    args = p.parse_args(argv)

    cfg = TrainerConfig(
        train_dir=args.train_dir, val_dir=args.val_dir,
        checkpoint_dir=args.checkpoint_dir, epochs=args.epochs,
        batch_size=args.batch_size, learning_rate=args.lr,
        optimizer=args.optimizer, warmup_steps=args.warmup_steps,
        grad_clip_norm=args.grad_clip, save_interval=args.save_interval,
        seed=args.seed, use_mesh=not args.no_mesh,
        tensorboard=args.tensorboard,
    )
    history = Trainer(cfg).fit()
    print("final train loss:", history["train_loss"][-1])


if __name__ == "__main__":
    main()
