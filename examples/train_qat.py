"""Quantization-aware training demo: PTQ baseline vs QAT fine-tune.

Extends the train->quantize->deploy loop of ``examples/train_synthetic``
(the reference's train.py -> tflite_quantize.py -> MCU chain) with the
framework's beyond-parity QAT stage:

  1. train the Flax model in float (short run);
  2. PTQ-calibrate, deploy on Int8Engine, measure the DEPLOYED task loss
     and detector hit-rate — the baseline;
  3. QAT fine-tune through the frozen int8 grid
     (quantize/qat.py: STE fake-quant, differentiable BN fold);
  4. re-deploy through the SAME calibrate chain and re-measure.

The headline number is the deployed quantized-domain task loss: QAT
optimizes exactly that, so it must not regress vs PTQ.

Run: python -m examples.train_qat [--steps 300] [--qat-steps 150]
"""

from __future__ import annotations

import argparse

import numpy as np

from examples.train_synthetic import evaluate_deployed, make_batch, train


def deployed_loss(state_vars, template, ranges, imgs, tgts):
    """Task loss of the DEPLOYED int8 graph's dequantized output."""
    import jax.numpy as jnp

    from yoloface_tpu.quantize.calibrate import (build_int8_graph,
                                                 fold_batchnorm)
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.train.loss import yolo_loss

    g = build_int8_graph(template, fold_batchnorm(state_vars), ranges)
    eng = Int8Engine(g, mode="exact")
    inq = g.tensor(g.inputs[0]).qparams
    x8 = np.clip(np.round(np.asarray(imgs) / inq.scale + inq.zero_point),
                 -128, 127).astype(np.int8)
    outq = g.tensor(g.outputs[0]).qparams
    y = ((np.asarray(eng(x8)).astype(np.float32) - outq.zero_point)
         * outq.scale)
    return float(yolo_loss(jnp.asarray(y), jnp.asarray(tgts)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--qat-steps", type=int, default=150)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--qat-lr", type=float, default=3e-4)
    args = p.parse_args(argv)

    from yoloface_tpu.io.tflite_import import load_tflite
    from yoloface_tpu.quantize import qat
    from yoloface_tpu.quantize.calibrate import fold_batchnorm, observe_ranges

    state = train(steps=args.steps, batch=args.batch, lr=args.lr)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    template = load_tflite(
        "/root/reference/yoloface/tflite/yoloface_int8.tflite")

    rng = np.random.default_rng(123)
    rep_imgs, _, _ = make_batch(rng, 16)
    ranges = observe_ranges(template, fold_batchnorm(variables), rep_imgs)
    val_imgs, val_tgts, _ = make_batch(rng, 64)

    ptq_loss = deployed_loss(variables, template, ranges, val_imgs, val_tgts)
    ptq_metrics = evaluate_deployed(state)
    print(f"PTQ : deployed loss {ptq_loss:.3f}  {ptq_metrics}")

    def batches():
        brng = np.random.default_rng(7)
        for _ in range(args.qat_steps):
            imgs, tgts, _ = make_batch(brng, args.batch)
            yield imgs, tgts

    v_qat, losses = qat.qat_finetune(template, variables, ranges,
                                     batches(), lr=args.qat_lr)
    print(f"QAT : fake-quant loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"over {len(losses)} steps")

    qat_loss = deployed_loss(v_qat, template, ranges, val_imgs, val_tgts)
    state_qat = dict(state)
    state_qat["params"] = v_qat["params"]
    state_qat["batch_stats"] = v_qat["batch_stats"]
    qat_metrics = evaluate_deployed(state_qat)
    print(f"QAT : deployed loss {qat_loss:.3f}  {qat_metrics}")
    print(f"deployed-loss improvement: {ptq_loss - qat_loss:+.3f} "
          f"({'QAT wins' if qat_loss <= ptq_loss else 'PTQ wins'})")
    return {"ptq_loss": ptq_loss, "qat_loss": qat_loss,
            "ptq": ptq_metrics, "qat": qat_metrics}


if __name__ == "__main__":
    main()
