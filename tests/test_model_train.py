"""FP32 model + trainer tests: parameter-count parity with the reference,
loss parity against a direct torch port of YoloLoss, and training smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloface_tpu.models.yoloface import YoloFace, count_params
from yoloface_tpu.train.loss import yolo_loss
from yoloface_tpu.train.steps import TrainConfig, init_state, make_train_step


@pytest.fixture(scope="module")
def model_vars():
    model = YoloFace()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 56, 56, 3)), train=True)
    return model, variables


def test_parameter_counts_match_reference(model_vars):
    """Keras summary (`yoloface/tensorflow/output.txt:69-71`): 11,302 total =
    10,214 trainable + 1,088 non-trainable (BN moving stats)."""
    _, variables = model_vars
    trainable = count_params(variables["params"])
    bn_stats = count_params(variables["batch_stats"])
    assert trainable == 10214
    assert bn_stats == 1088


def test_forward_shape_and_determinism(model_vars):
    model, variables = model_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    y1 = model.apply(variables, x, train=False)
    y2 = model.apply(variables, x, train=False)
    assert y1.shape == (2, 7, 7, 18)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_intermediate_spatial_dims(model_vars):
    """Stride-2 darknet padding must give 56->28->14->7 like the int8 graph."""
    model, variables = model_vars
    y = model.apply(variables, jnp.zeros((1, 56, 56, 3)), train=False)
    assert y.shape == (1, 7, 7, 18)


def test_loss_matches_torch_reference():
    """yolo_loss vs a direct torch port of YoloLoss (train.py:204-261)."""
    torch = pytest.importorskip("torch")

    def torch_yolo_loss(pred_nchw, targets):
        lambda_coord, lambda_noobj = 5.0, 0.5
        mse = torch.nn.MSELoss(reduction="sum")
        bce = torch.nn.BCEWithLogitsLoss(reduction="sum")
        b = pred_nchw.size(0)
        p = pred_nchw.view(b, 3, 6, 7, 7).permute(0, 1, 3, 4, 2)
        obj = targets[..., 4] == 1
        noobj = targets[..., 4] == 0
        loss = 0
        for i in range(4):
            loss = loss + lambda_coord * mse(p[obj][..., i],
                                             targets[obj][..., i])
        loss = loss + bce(p[obj][..., 4], targets[obj][..., 4])
        loss = loss + lambda_noobj * bce(p[noobj][..., 4],
                                         targets[noobj][..., 4])
        loss = loss + bce(p[obj][..., 5], targets[obj][..., 5])
        return (loss / b).item()

    rng = np.random.default_rng(3)
    b = 4
    pred_nhwc = rng.normal(0, 1, (b, 7, 7, 18)).astype(np.float32)
    targets = np.zeros((b, 3, 7, 7, 6), np.float32)
    # sprinkle some objects
    for _ in range(6):
        bi, ai, gi, gj = (rng.integers(0, d) for d in (b, 3, 7, 7))
        targets[bi, ai, gi, gj] = [*rng.uniform(0, 1, 4), 1.0, 1.0]

    got = float(yolo_loss(jnp.asarray(pred_nhwc), jnp.asarray(targets)))
    # torch port consumes NCHW with anchor-major channel groups — identical
    # memory layout to NHWC transposed
    pred_nchw = torch.tensor(pred_nhwc).permute(0, 3, 1, 2).contiguous()
    want = torch_yolo_loss(pred_nchw, torch.tensor(targets))
    assert abs(got - want) / max(abs(want), 1.0) < 1e-5


def test_train_step_overfits_tiny_batch():
    """A few Adam steps on one fixed batch must cut the loss sharply
    (sanity of grads through BN + the whole backbone)."""
    cfg = TrainConfig(learning_rate=5e-3, epochs=1, steps_per_epoch=50)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))

    rng = np.random.default_rng(5)
    images = rng.uniform(0, 1, (4, 56, 56, 3)).astype(np.float32)
    targets = np.zeros((4, 3, 7, 7, 6), np.float32)
    targets[0, 1, 3, 3] = [0.5, 0.5, 0.1, 0.1, 1.0, 1.0]
    targets[2, 0, 2, 5] = [0.3, 0.7, -0.2, 0.4, 1.0, 1.0]

    losses = []
    for _ in range(80):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # BN on the head (Keras twin layout) standardizes the conf channel, so
    # the noobj BCE floor decays slowly; 25% in 80 steps is the smoke bar.
    assert losses[-1] < losses[0] * 0.75, losses[::20]


def test_grad_clipping_applied():
    cfg = TrainConfig(grad_clip_norm=1.0)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    images = np.ones((2, 56, 56, 3), np.float32) * 100.0  # absurd inputs
    targets = np.zeros((2, 3, 7, 7, 6), np.float32)
    targets[:, :, :, :, 4] = 1.0
    targets[:, :, :, :, 0:4] = 50.0
    _, metrics = step(state, images, targets)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_step_scheduler_halves_lr():
    """StepLR parity (train_simplified.py:276-281): lr halves every
    step_size epochs, staircase."""
    from yoloface_tpu.train.steps import make_optimizer
    cfg = TrainConfig(learning_rate=1e-3, epochs=4, steps_per_epoch=10,
                      lr_scheduler="step", step_size_epochs=2,
                      step_gamma=0.5)
    _, sched = make_optimizer(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(5e-4)
    assert float(sched(40)) == pytest.approx(2.5e-4)


def test_plateau_scheduler_reduces_on_stuck_loss():
    """ReduceLROnPlateau parity (train_simplified.py:283-291): when the
    loss fed to the optimizer stops improving for `patience` updates, the
    effective lr (reported in metrics) is scaled by `factor`."""
    cfg = TrainConfig(learning_rate=1e-3, lr_scheduler="plateau",
                      plateau_patience=3, plateau_factor=0.5)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    # a batch the model cannot fit (constant images, impossible targets)
    # keeps the loss flat enough to trigger the plateau after patience
    images = np.zeros((2, 56, 56, 3), np.float32)
    targets = np.zeros((2, 3, 7, 7, 6), np.float32)
    lrs = []
    for _ in range(30):
        state, metrics = step(state, images, targets)
        lrs.append(float(metrics["lr"]))
    assert lrs[0] == pytest.approx(1e-3, rel=1e-3)
    assert min(lrs) <= 1e-3 * 0.5 + 1e-9, lrs


def test_cosine_default_unchanged():
    from yoloface_tpu.train.steps import make_optimizer
    cfg = TrainConfig(learning_rate=1e-3, epochs=1, steps_per_epoch=100)
    _, sched = make_optimizer(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-2)
