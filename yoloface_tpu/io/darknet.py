"""Darknet ``.weights`` importer -> Flax YoloFace variables.

Port of ``yoloface.load_darknet_weights``
(`yoloface/pytorch/yoloface.py:177-285`): a 5-int32 header followed by a
flat float32 stream; per conv-BN block the order is
[bn_bias, bn_gamma, bn_mean, bn_var, conv_weights(OIHW)], walked in the
fixed layer order conv1 .. conv16 (dw then pw each), then the head conv's
[bias, weights].  (The reference repo references ``yoloface-50k.weights``
but does not ship it — this importer restores the capability; the
round-trip is tested against the exporter below.)

The head layer difference: the Darknet/PyTorch twin ends with a bias-conv
while the Keras/TFLite twin ends with conv+BN (see models/yoloface.py).  On
import, the head bias is installed as identity-BN beta, exactly like
:mod:`yoloface_tpu.models.import_weights`.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# (flax path, (cout, cin, kh, kw)) in the reference's exact load order
# (yoloface.py:250-272); depthwise convs have cin=1 groups=cout in darknet
LAYER_ORDER: List[Tuple[str, Tuple[int, int, int, int]]] = [
    ("conv1", (8, 3, 3, 3)),
    ("conv2/dw", (8, 1, 3, 3)), ("conv2/pw", (4, 8, 1, 1)),
    ("conv3", (18, 4, 1, 1)),
    ("conv4/dw", (18, 1, 3, 3)), ("conv4/pw", (6, 18, 1, 1)),
    ("conv5", (36, 6, 1, 1)),
    ("conv6/dw", (36, 1, 3, 3)), ("conv6/pw", (6, 36, 1, 1)),
    ("conv7", (18, 6, 1, 1)),
    ("conv8", (24, 36, 1, 1)),
    ("conv9/dw", (24, 1, 3, 3)), ("conv9/pw", (8, 24, 1, 1)),
    ("conv10", (40, 8, 1, 1)),
    ("conv11/dw", (40, 1, 3, 3)), ("conv11/pw", (8, 40, 1, 1)),
    ("conv12", (40, 8, 1, 1)),
    ("conv13/dw", (40, 1, 3, 3)), ("conv13/pw", (8, 40, 1, 1)),
    ("conv14", (24, 8, 1, 1)),
    ("conv15", (40, 48, 1, 1)),
    ("conv16/dw", (40, 1, 3, 3)), ("conv16/pw", (32, 40, 1, 1)),
]
HEAD_SHAPE = (18, 32, 1, 1)  # conv17: bias then weights, no BN


def _set_path(tree: Dict, path: str, leaf: Dict):
    node = tree
    parts = path.split("/")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = leaf


def load_darknet_weights(path_or_bytes) -> Dict:
    """Parse a darknet .weights file into Flax YoloFace variables."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    header = np.frombuffer(raw[:20], dtype=np.int32)
    weights = np.frombuffer(raw[20:], dtype=np.float32)

    params: Dict = {}
    stats: Dict = {}
    ptr = 0

    def take(n):
        nonlocal ptr
        out = weights[ptr:ptr + n]
        if out.size != n:
            raise ValueError(
                f"darknet weights truncated at float {ptr} (+{n})")
        ptr += n
        return np.asarray(out, np.float32)

    for path, (co, ci, kh, kw) in LAYER_ORDER:
        bn_bias = take(co)
        bn_gamma = take(co)
        bn_mean = take(co)
        bn_var = take(co)
        w_oihw = take(co * ci * kh * kw).reshape(co, ci, kh, kw)
        if path.endswith("dw"):
            kernel = w_oihw.transpose(2, 3, 1, 0)   # OIHW(I=1) -> HWIO [kh,kw,1,C]
        else:
            kernel = w_oihw.transpose(2, 3, 1, 0)   # -> HWIO [kh,kw,ci,co]
        _set_path(params, path, {
            "conv": {"kernel": np.ascontiguousarray(kernel)},
            "bn": {"scale": bn_gamma, "bias": bn_bias},
        })
        _set_path(stats, path, {"bn": {"mean": bn_mean, "var": bn_var}})

    co, ci, kh, kw = HEAD_SHAPE
    head_bias = take(co)
    head_w = take(co * ci * kh * kw).reshape(co, ci, kh, kw)
    eps = 1e-5
    _set_path(params, "conv17", {
        "conv": {"kernel": np.ascontiguousarray(
            head_w.transpose(2, 3, 1, 0))},
        "bn": {"scale": np.ones(co, np.float32), "bias": head_bias},
    })
    _set_path(stats, "conv17", {
        "bn": {"mean": np.zeros(co, np.float32),
               "var": np.full(co, 1.0 - eps, np.float32)},
    })
    if ptr != weights.size:
        raise ValueError(
            f"darknet weights size mismatch: consumed {ptr}, file has "
            f"{weights.size}")
    return {"params": params, "batch_stats": stats,
            "header": header.copy()}


def save_darknet_weights(variables: Dict, out_path: str,
                         header: np.ndarray | None = None):
    """Inverse: Flax variables -> darknet .weights (round-trip testable)."""
    chunks = [np.asarray(header if header is not None
                         else np.array([0, 2, 0, 0, 0], np.int32),
                         np.int32).tobytes()]
    params, stats = variables["params"], variables["batch_stats"]

    def get(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    for path, (co, ci, kh, kw) in LAYER_ORDER:
        mod, st = get(params, path), get(stats, path)
        for arr in (mod["bn"]["bias"], mod["bn"]["scale"],
                    st["bn"]["mean"], st["bn"]["var"]):
            chunks.append(np.asarray(arr, np.float32).tobytes())
        kernel = np.asarray(mod["conv"]["kernel"], np.float32)
        chunks.append(np.ascontiguousarray(
            kernel.transpose(3, 2, 0, 1)).tobytes())  # HWIO -> OIHW
    mod = get(params, "conv17")
    chunks.append(np.asarray(mod["bn"]["bias"], np.float32).tobytes())
    kernel = np.asarray(mod["conv"]["kernel"], np.float32)
    chunks.append(np.ascontiguousarray(
        kernel.transpose(3, 2, 0, 1)).tobytes())
    with open(out_path, "wb") as f:
        f.write(b"".join(chunks))
