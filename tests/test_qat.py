"""Quantization-aware training: the fake-quant grid is the deployment grid.

Beyond-parity capability (the reference stops at PTQ,
yoloface/tflite/tflite_quantize.py); these tests pin the three contracts
that make QAT trustworthy: the simulation tracks the deployed int8 engine,
the STE training loop actually optimizes through the grid, and the QAT'd
variables flow through the SAME calibrate/export chain as PTQ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloface_tpu.quantize import qat
from yoloface_tpu.quantize.calibrate import (build_int8_graph,
                                             fold_batchnorm, observe_ranges)
from yoloface_tpu.runtime.engine import Int8Engine
from yoloface_tpu.train.steps import TrainConfig, init_state


@pytest.fixture(scope="module")
def setup(int8_graph):
    from examples.train_synthetic import make_batch
    state = init_state(jax.random.PRNGKey(0), TrainConfig(batch_size=8))
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    rng = np.random.default_rng(0)
    imgs, tgts = make_batch(rng, 16)[:2]
    ranges = observe_ranges(int8_graph, fold_batchnorm(variables), imgs)
    return variables, imgs, tgts, ranges


def test_qat_sim_tracks_deployed_engine(int8_graph, setup):
    """Fake-quant forward == deployed int8 engine to within ~1 int8 step on
    average (residual: int32 bias rounding + the engine's double rounding
    vs the sim's single float rounding)."""
    variables, imgs, _, ranges = setup
    g = build_int8_graph(int8_graph, fold_batchnorm(variables), ranges)
    eng = Int8Engine(g, mode="exact")
    inq = g.tensor(g.inputs[0]).qparams
    x8 = np.clip(np.round(np.asarray(imgs) / inq.scale + inq.zero_point),
                 -128, 127).astype(np.int8)
    outq = g.tensor(g.outputs[0]).qparams
    y_eng = ((np.asarray(eng(x8)).astype(np.float32) - outq.zero_point)
             * outq.scale)
    act_sz = qat.qat_act_qparams(int8_graph, ranges)
    y_sim = np.asarray(qat.qat_forward(int8_graph, variables,
                                       jnp.asarray(imgs), act_sz))
    err = np.abs(y_sim - y_eng) / outq.scale
    assert err.mean() < 1.5, f"mean {err.mean():.2f} int8 steps"
    assert err.max() <= 10, f"max {err.max():.2f} int8 steps"


def test_qat_step_optimizes_through_the_grid(int8_graph, setup):
    variables, imgs, tgts, ranges = setup
    step, init_opt = qat.make_qat_step(int8_graph, ranges, lr=1e-3)
    opt = init_opt(variables)
    v = variables
    losses = []
    for _ in range(6):
        v, opt, loss = step(v, opt, jnp.asarray(imgs), jnp.asarray(tgts))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_qat_variables_deploy_through_the_ptq_chain(int8_graph, setup):
    """qat_finetune -> the SAME build_int8_graph chain -> runnable engine;
    the deployed output of the QAT'd weights tracks the QAT sim at least as
    closely as the pre-QAT weights did (the grids stayed aligned)."""
    variables, imgs, tgts, ranges = setup
    batches = [(imgs, tgts)] * 4
    v2, losses = qat.qat_finetune(int8_graph, variables, ranges, batches,
                                  lr=1e-3)
    assert losses[-1] < losses[0]
    g = build_int8_graph(int8_graph, fold_batchnorm(v2), ranges)
    eng = Int8Engine(g, mode="exact")
    inq = g.tensor(g.inputs[0]).qparams
    x8 = np.clip(np.round(np.asarray(imgs) / inq.scale + inq.zero_point),
                 -128, 127).astype(np.int8)
    y8 = np.asarray(eng(x8))
    assert y8.shape[1:] == (7, 7, 18) and y8.dtype == np.int8
    outq = g.tensor(g.outputs[0]).qparams
    y_eng = (y8.astype(np.float32) - outq.zero_point) * outq.scale
    act_sz = qat.qat_act_qparams(int8_graph, ranges)
    y_sim = np.asarray(qat.qat_forward(int8_graph, v2,
                                       jnp.asarray(imgs), act_sz))
    err = np.abs(y_sim - y_eng) / outq.scale
    assert err.mean() < 1.5, f"mean {err.mean():.2f} int8 steps"


def test_weight_space_qat_arbitrary_darknet_template():
    """QAT generalizes to ANY imported template: the folded float weights
    of a darknet-cfg graph are the trainable leaves (no Flax model
    needed); optimization reduces a quantized-domain loss and the result
    deploys through calibrate_from_weights' chain unchanged."""
    from yoloface_tpu.io.darknet_cfg import DarknetNet, template_from_darknet
    from yoloface_tpu.quantize.calibrate import observe_ranges

    cfg = """
[net]
width=16
height=16
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
filters=4
size=1
stride=1
activation=linear
"""
    net = DarknetNet(cfg)
    rng = np.random.default_rng(3)
    params = {}
    for i, layer in enumerate(net.layers):
        if layer.kind != "conv":
            continue
        k, co = layer.size, layer.filters
        ci = 1 if layer.depthwise else layer.cin
        p = {"kernel": rng.normal(0, 0.4 / np.sqrt(k * k * ci),
                                  (k, k, ci, co)).astype(np.float32)}
        if layer.bn:
            p["bn_scale"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
            p["bn_bias"] = rng.normal(0, 0.2, co).astype(np.float32)
            p["bn_mean"] = rng.normal(0, 0.2, co).astype(np.float32)
            p["bn_var"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
        else:
            p["bias"] = rng.normal(0, 0.2, co).astype(np.float32)
        params[f"layer{i}"] = p
    template, weights = template_from_darknet(net, params)

    imgs = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    target = rng.normal(0, 0.5, (8, 8, 8, 4)).astype(np.float32)
    ranges = observe_ranges(template, weights, imgs)

    loss_fn = lambda out, tgt: jnp.mean((out - tgt) ** 2)  # noqa: E731
    step, init_opt = qat.make_qat_step_weights(template, ranges, loss_fn,
                                               lr=3e-3)
    opt = init_opt(weights)
    w, losses = weights, []
    for _ in range(10):
        w, opt, loss = step(w, opt, jnp.asarray(imgs), jnp.asarray(target))
        losses.append(float(loss))
    assert losses[-1] < losses[0] and np.isfinite(losses).all()

    # deploys through the unchanged PTQ chain
    w_np = {k: (np.asarray(a), np.asarray(b)) for k, (a, b) in w.items()}
    g = build_int8_graph(template, w_np, ranges,
                         input_qparams=None)
    eng = Int8Engine(g, mode="exact")
    inq = g.tensor(g.inputs[0]).qparams
    x8 = np.clip(np.round(imgs / inq.scale + inq.zero_point),
                 -128, 127).astype(np.int8)
    y = np.asarray(eng(x8))
    assert y.shape == (8, 8, 8, 4) and y.dtype == np.int8
