"""End-to-end learning demo for an ARBITRARY darknet graph: define a net
as a darknet .cfg, train it directly in JAX (DarknetNet.apply is a pure
differentiable function), PTQ-quantize with the generic template builder,
deploy on the int8 engine, and measure detection quality.

The second-model-family counterpart of examples/train_synthetic.py: where
that demo trains the fixed Flax yoloface, this one exercises the path the
reference does not have at all — cfg-defined architecture -> JAX training
-> `template_from_darknet` -> calibrate -> flatbuffer-ready int8 graph.

Run: python -m examples.train_darknet [--steps 300]
"""

from __future__ import annotations

import argparse

import numpy as np

CFG = """
[net]
width=32
height=32
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=24
size=3
stride=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
activation=leaky

[convolutional]
filters=18
size=1
stride=1
activation=linear

[yolo]
"""

SIZE, GRID, STRIDE = 32, 4, 8
ANCHORS = np.array([[6.0, 6.0], [12.0, 12.0], [20.0, 20.0]], np.float32)


def make_sample(rng: np.random.Generator):
    img = rng.uniform(0.0, 0.35, (SIZE, SIZE, 3)).astype(np.float32)
    size = int(rng.integers(8, 18))
    x0 = int(rng.integers(0, SIZE - size))
    y0 = int(rng.integers(0, SIZE - size))
    img[y0:y0 + size, x0:x0 + size] = rng.uniform(0.75, 1.0, 3)
    cx, cy = x0 + size / 2.0, y0 + size / 2.0
    return img, (cx, cy, float(size), float(size))


def build_target(label):
    """[GRID,GRID,3,6] target: best-anchor assignment, sigmoid-space xy,
    log-space wh (the v3 target convention at this scale)."""
    cx, cy, w, h = label
    t = np.zeros((GRID, GRID, 3, 6), np.float32)
    col = min(int(cx / STRIDE), GRID - 1)
    row = min(int(cy / STRIDE), GRID - 1)
    inter = np.minimum(ANCHORS[:, 0], w) * np.minimum(ANCHORS[:, 1], h)
    union = ANCHORS[:, 0] * ANCHORS[:, 1] + w * h - inter
    a = int(np.argmax(inter / union))
    t[row, col, a] = [cx / STRIDE - col, cy / STRIDE - row,
                      np.log(w / ANCHORS[a, 0]), np.log(h / ANCHORS[a, 1]),
                      1.0, 1.0]
    return t


def make_batch(rng, n):
    imgs, tgts, labels = [], [], []
    for _ in range(n):
        img, lab = make_sample(rng)
        imgs.append(img)
        tgts.append(build_target(lab))
        labels.append(lab)
    return np.stack(imgs), np.stack(tgts), np.asarray(labels, np.float32)


def loss_fn(pred, target):
    """yolo loss at one scale: coord MSE x5, obj/noobj BCE x1/x0.5."""
    import jax
    import jax.numpy as jnp
    p = pred.reshape(pred.shape[0], GRID, GRID, 3, 6)
    obj = target[..., 4]
    xy = jax.nn.sigmoid(p[..., 0:2])
    coord = (jnp.square(xy - target[..., 0:2]).sum(-1)
             + jnp.square(p[..., 2:4] - target[..., 2:4]).sum(-1))
    logit = p[..., 4]
    bce = jnp.maximum(logit, 0) - logit * obj + jnp.log1p(
        jnp.exp(-jnp.abs(logit)))
    n = pred.shape[0]
    return (5.0 * (obj * coord).sum()
            + (obj * bce).sum() + 0.5 * ((1 - obj) * bce).sum()) / n


def train(steps=300, batch=32, lr=3e-3, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from yoloface_tpu.io.darknet_cfg import DarknetNet

    net = DarknetNet(CFG)
    rng = np.random.default_rng(seed)
    params = {}
    for i, layer in enumerate(net.layers):
        if layer.kind != "conv":
            continue
        k, co = layer.size, layer.filters
        ci = 1 if layer.depthwise else layer.cin
        p = {"kernel": jnp.asarray(rng.normal(
            0, np.sqrt(2.0 / (k * k * ci)), (k, k, ci, co)), jnp.float32)}
        if layer.bn:
            p["bn_scale"] = jnp.ones(co)
            p["bn_bias"] = jnp.zeros(co)
            p["bn_mean"] = jnp.zeros(co)
            p["bn_var"] = jnp.ones(co)
        else:
            p["bias"] = jnp.zeros(co)
        params[f"layer{i}"] = p

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, tgts):
        def run(p):
            out = net.apply(p, imgs)
            return loss_fn(out[0] if isinstance(out, list) else out, tgts)
        loss, grads = jax.value_and_grad(run)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        imgs, tgts, _ = make_batch(rng, batch)
        params, opt_state, loss = step(params, opt_state, imgs, tgts)
        losses.append(float(loss))
        if (i + 1) % max(steps // 6, 1) == 0:
            print(f"step {i + 1}/{steps}  loss={losses[-1]:.3f}",
                  flush=True)
    return net, jax.tree.map(np.asarray, params), losses


def evaluate_deployed(net, params, n_eval=24, conf=0.5, seed=123):
    from yoloface_tpu.io.darknet_cfg import template_from_darknet
    from yoloface_tpu.pipeline.head import (HeadConfig, clamp_boxes,
                                            decode, select_detections)
    from yoloface_tpu.quantize.calibrate import calibrate_from_weights
    from yoloface_tpu.runtime.engine import Int8Engine
    from yoloface_tpu.train.evaluate import box_iou

    template, weights = template_from_darknet(net, params)
    rng = np.random.default_rng(seed)
    rep, _, _ = make_batch(rng, 16)
    graph = calibrate_from_weights(weights, rep, template)
    eng = Int8Engine(graph, mode="exact")

    imgs, _, labels = make_batch(rng, n_eval)
    x = np.clip(np.round(imgs * 255) - 128, -128, 127).astype(np.int8)
    y = eng(x)
    q = graph.tensor(graph.outputs[0]).qparams
    cfg = HeadConfig(grid=GRID, stride=STRIDE,
                     anchors=tuple(map(tuple, ANCHORS)),
                     conf_threshold=conf)
    boxes, cscore, _ = decode(np.asarray(y), scale=q.scale,
                              zero_point=q.zero_point, cfg=cfg)
    boxes = clamp_boxes(boxes, limit=SIZE - 1.0)
    b, s, v = select_detections(boxes, cscore, cfg)
    b, s, v = map(np.asarray, (b, s, v))

    hits, ious = 0, []
    for i in range(n_eval):
        cx, cy, w, h = labels[i]
        gt = np.array([[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]])
        if not v[i].any():
            continue
        best = b[i][v[i]][np.argmax(s[i][v[i]])]
        iou = float(box_iou(best[None], gt)[0, 0])
        ious.append(iou)
        if iou >= 0.5:
            hits += 1
    return {"hit_rate": hits / n_eval,
            "mean_iou": float(np.mean(ious)) if ious else 0.0,
            "detected": len(ious), "n_eval": n_eval}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    args = p.parse_args(argv)
    net, params, losses = train(args.steps, args.batch, args.lr)
    metrics = evaluate_deployed(net, params)
    print("deployed int8 cfg-net detector:", metrics)
    return losses, metrics


if __name__ == "__main__":
    main()
