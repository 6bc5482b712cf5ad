"""FP32 yoloface model in Flax — the trainable twin of the int8 graph.

Architecture ported from the reference definition
(`yoloface/pytorch/yoloface.py:67-175`, confirmed against the imported
`yoloface_int8.tflite` graph): a 56x56x3 -> 7x7x18 single-class YOLO
backbone of depthwise-separable convolutions, two maxpool-route branches and
three residual adds; ~11.3k parameters.

TPU-first notes:
  * NHWC layout throughout (XLA TPU native).
  * Stride-2 convolutions use darknet-style top-left padding ((1,0),(1,0)) —
    exactly the PAD ops in the TFLite graph (`yolo_to_h5.py:223-225`
    introduced them) — so post-training quantization of this model
    reproduces the reference graph structure.
  * BatchNorm after every conv except the final head conv; LeakyReLU(0.1)
    activations except on pointwise-projection convs (is_relu=False in the
    reference helper, `yoloface.py:9-40`).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

DARKNET_PAD = ((1, 0), (1, 0))  # top/left zero pad for stride-2 3x3 convs


class ConvBNLeaky(nn.Module):
    """Conv2D helper (`yoloface.py:9-40`): conv (no bias) + BN + optional
    LeakyReLU(0.1)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    darknet_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.darknet_pad:
            pad: Any = [(0, 0), DARKNET_PAD[0], DARKNET_PAD[1], (0, 0)]
            x = jnp.pad(x, pad)
            padding = "VALID"
        else:
            padding = "SAME"
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=padding,
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class DepthwiseSeparable(nn.Module):
    """depthwise_conv helper (`yoloface.py:42-65`): 3x3 depthwise (+leaky)
    then 1x1 pointwise (leaky only if ``relu``)."""

    hidden: int
    features: int
    stride1: int = 1
    relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNLeaky(self.hidden, kernel=3, stride=self.stride1,
                        groups=self.hidden, relu=True,
                        darknet_pad=self.stride1 == 2, name="dw")(x, train)
        x = ConvBNLeaky(self.features, kernel=1, relu=self.relu,
                        name="pw")(x, train)
        return x


class YoloFace(nn.Module):
    """The flagship detector backbone; forward mirrors `yoloface.py:123-175`.

    Returns the raw head output [N, 7, 7, 18] (3 anchors x [tx ty tw th
    conf cls]); decoding lives in :mod:`yoloface_tpu.pipeline.head`.
    """

    anchors: Tuple[Tuple[float, float], ...] = ((9, 14), (12, 17), (22, 21))

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv1 = ConvBNLeaky(8, kernel=3, stride=2, darknet_pad=True,
                            name="conv1")(x, train)
        conv2 = DepthwiseSeparable(8, 4, name="conv2")(conv1, train)
        conv3 = ConvBNLeaky(18, kernel=1, name="conv3")(conv2, train)

        conv4 = DepthwiseSeparable(18, 6, stride1=2, name="conv4")(conv3, train)
        conv5 = ConvBNLeaky(36, kernel=1, name="conv5")(conv4, train)
        conv6 = DepthwiseSeparable(36, 6, name="conv6")(conv5, train)
        conv6 = conv4 + conv6                       # residual add
        conv7 = ConvBNLeaky(18, kernel=1, name="conv7")(conv6, train)

        maxpool1 = nn.max_pool(conv3, (8, 8), strides=(2, 2), padding="SAME")
        route1 = jnp.concatenate([maxpool1, conv7], axis=-1)
        conv8 = ConvBNLeaky(24, kernel=1, name="conv8")(route1, train)

        conv9 = DepthwiseSeparable(24, 8, stride1=2, name="conv9")(conv8, train)
        conv10 = ConvBNLeaky(40, kernel=1, name="conv10")(conv9, train)
        conv11 = DepthwiseSeparable(40, 8, name="conv11")(conv10, train)
        conv11 = conv9 + conv11                     # residual add

        conv12 = ConvBNLeaky(40, kernel=1, name="conv12")(conv11, train)
        conv13 = DepthwiseSeparable(40, 8, name="conv13")(conv12, train)
        conv13 = conv11 + conv13                    # residual add
        conv14 = ConvBNLeaky(24, kernel=1, name="conv14")(conv13, train)

        maxpool2 = nn.max_pool(conv8, (4, 4), strides=(2, 2), padding="SAME")
        route2 = jnp.concatenate([maxpool2, conv14], axis=-1)

        conv15 = ConvBNLeaky(40, kernel=1, name="conv15")(route2, train)
        conv16 = DepthwiseSeparable(40, 32, relu=True, name="conv16")(conv15, train)
        # Head conv: conv (no bias) + BN, no activation — matches the Keras
        # model the int8 graph was converted from (yolo_conv2d_23 = 648
        # params in `tensorflow/output.txt:64`; the PyTorch twin uses
        # bias+no-BN instead, yoloface.py:121 — the Keras layout is the one
        # that quantizes to the reference graph).
        head = ConvBNLeaky(18, kernel=1, relu=False, name="conv17")(conv16, train)
        return head


def count_params(params) -> int:
    import jax
    return sum(p.size for p in jax.tree.leaves(params))
