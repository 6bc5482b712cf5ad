"""Fused camera-frame preprocessing, bit-exact with the firmware.

TPU-native re-design of the reference's CPU preprocessing pair
(`stm32/X-CUBE-AI/App/yoloface.c`):

  * ``resize_rgb565_uint8_112_to_56_direct`` (yoloface.c:26-71): 2x2 box
    average of the R5/G6/B5 fields of a 112x112 RGB565 frame.
  * ``prepare_yolo_data`` (yoloface.c:73-93): unpack the averaged RGB565
    pixel to 8-bit R,G,B (R = (c & 0xF800) >> 8 etc.) and subtract 128 into
    int8 NHWC.

Here both steps fuse into one elementwise XLA computation over a whole batch
of frames — integer-only, so the int8 tensor fed to the network is
bit-identical to the MCU's ``in_data``.  Field extraction happens *before*
averaging and repacking, which is arithmetically identical to the firmware's
repack-then-unpack (the firmware shifts the averaged 5/6-bit fields left by
3/2; so do we).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["rgb565_to_int8_input", "encode_rgb565", "quantize_float_images"]


def rgb565_to_int8_input(frames):
    """uint16 RGB565 frames [N,112,112] -> int8 network input [N,56,56,3].

    Bit-exact fusion of the firmware's 2x2 box downsample + int8 unpack.
    """
    frames = jnp.asarray(frames)
    assert frames.dtype == jnp.uint16, "RGB565 frames must be uint16"
    p = frames.astype(jnp.int32)
    r5 = (p >> 11) & 0x1F
    g6 = (p >> 5) & 0x3F
    b5 = p & 0x1F
    # 2x2 box sum then >>2 (floor), per field — yoloface.c:40-56
    def avg(f):
        s = (f[:, 0::2, 0::2] + f[:, 0::2, 1::2]
             + f[:, 1::2, 0::2] + f[:, 1::2, 1::2])
        return s >> 2
    # prepare_yolo_data expands: r8 = avg_r<<3, g8 = avg_g<<2, b8 = avg_b<<3,
    # then int8 = value - 128 (yoloface.c:84-90)
    r = (avg(r5) << 3) - 128
    g = (avg(g6) << 2) - 128
    b = (avg(b5) << 3) - 128
    return jnp.stack([r, g, b], axis=-1).astype(jnp.int8)


def encode_rgb565(rgb_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB images [..., H, W, 3] -> uint16 RGB565 [..., H, W].

    Camera-emulation helper (the inverse of what the OV2640 sensor produces
    over DCMI); truncates to 5/6/5 bits like the sensor output format.
    """
    r = (rgb_u8[..., 0].astype(np.uint16) >> 3) & 0x1F
    g = (rgb_u8[..., 1].astype(np.uint16) >> 2) & 0x3F
    b = (rgb_u8[..., 2].astype(np.uint16) >> 3) & 0x1F
    return ((r << 11) | (g << 5) | b).astype(np.uint16)


def quantize_float_images(images, scale: float = 1.0 / 255.0,
                          zero_point: int = -128):
    """float images in [0,1] [N,56,56,3] -> int8 network input.

    The converter-calibrated input quantization (scale 0.00392…, zp -128 —
    `network_generate_report.txt:15`): q = round(f/scale) + zp.  For
    f = pixel/255 this reduces to pixel - 128, matching the reference
    predictor (`tflite_prediction.py:36`)."""
    q = jnp.round(jnp.asarray(images, jnp.float32) / scale) + zero_point
    return jnp.clip(q, -128, 127).astype(jnp.int8)
