"""Generic darknet ``.cfg`` parser + JAX graph builder + weights streamer.

The reference converter (`yoloface/tensorflow/yolo_to_h5.py:60-353`) can
convert *any* small darknet network: it parses cfg sections
(convolutional / route / shortcut / maxpool / upsample / yolo), builds the
matching Keras graph and streams the ``.weights`` file into it.  The
fixed-order importer in :mod:`yoloface_tpu.io.darknet` covers only the
yoloface architecture; this module restores the general capability,
TPU-first: the built network is a pure functional JAX forward over a params
pytree (jit/vmap/grad-compatible), not a Keras object graph.

Semantics mirrored from the reference converter:
  * section uniquification (`unique_config_sections`, :60-88);
  * stride-2 convs get darknet top-left ZeroPadding ((1,0),(1,0)) + VALID,
    stride-1 convs use SAME (:223-231);
  * depthwise convolutions are sections with groups == filters ==
    in_channels; their weights transpose [2,3,0,1] vs [2,3,1,0] for
    standard convs (:194-209);
  * weight stream order per conv block: [bias | bn_bias, bn_gamma,
    bn_mean, bn_var], then conv weights OIHW (:161-192);
  * route concatenates along channels, shortcut adds, upsample is nearest
    ×stride, maxpool is SAME-padded, yolo marks an output head.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["parse_cfg", "DarknetNet", "load_cfg_weights"]


def parse_cfg(text: str) -> List[Tuple[str, Dict[str, str]]]:
    """cfg text -> ordered [(section_type, options)] (comments stripped,
    duplicate section names kept in order — the uniquification role of
    yolo_to_h5.py:60-88)."""
    sections: List[Tuple[str, Dict[str, str]]] = []
    current: Optional[Dict[str, str]] = None
    for raw in io.StringIO(text):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            current = {}
            sections.append((line[1:-1].strip().lower(), current))
        elif "=" in line and current is not None:
            k, v = line.split("=", 1)
            current[k.strip()] = v.strip()
        else:
            raise ValueError(f"cfg syntax error: {line!r}")
    return sections


class _Layer:
    def __init__(self, kind: str, **kw):
        self.kind = kind
        self.__dict__.update(kw)


class DarknetNet:
    """A darknet graph compiled from cfg sections into a functional JAX
    forward.  ``net.init_shapes()`` gives per-layer (in_c, out_c);
    ``net.apply(params, x)`` runs NHWC float32 inputs and returns the list
    of yolo-head outputs (or the last layer if the cfg has no yolo
    sections)."""

    def __init__(self, cfg_text: str):
        sections = parse_cfg(cfg_text)
        if not sections or sections[0][0] not in ("net", "network"):
            raise ValueError("cfg must start with a [net] section")
        self.net_options = sections[0][1]
        self.layers: List[_Layer] = []
        self.outputs: List[int] = []
        in_c = int(self.net_options.get("channels", 3))
        channels: List[int] = []      # out channels per layer

        def prev_c(i_layer: int) -> int:
            return channels[i_layer] if i_layer >= 0 else in_c

        for kind, opt in sections[1:]:
            i = len(self.layers)
            if kind == "convolutional":
                filters = int(opt["filters"])
                size = int(opt.get("size", 1))
                stride = int(opt.get("stride", 1))
                bn = opt.get("batch_normalize", "0") == "1"
                groups = int(opt.get("groups", 1))
                act = opt.get("activation", "linear")
                if act not in ("leaky", "linear", "relu"):
                    raise NotImplementedError(f"activation {act}")
                cin = prev_c(i - 1)
                depthwise = groups > 1
                if depthwise and not (groups == filters == cin):
                    raise NotImplementedError(
                        "grouped conv only as full depthwise "
                        f"(groups={groups}, filters={filters}, cin={cin})")
                self.layers.append(_Layer(
                    "conv", filters=filters, size=size, stride=stride,
                    bn=bn, act=act, cin=cin, depthwise=depthwise))
                channels.append(filters)
            elif kind == "maxpool":
                size = int(opt.get("size", 2))
                stride = int(opt.get("stride", size))
                self.layers.append(_Layer("maxpool", size=size,
                                          stride=stride))
                channels.append(prev_c(i - 1))
            elif kind == "route":
                idxs = [int(v) for v in opt["layers"].split(",")]
                idxs = [j if j >= 0 else i + j for j in idxs]
                self.layers.append(_Layer("route", idxs=idxs))
                channels.append(sum(channels[j] for j in idxs))
            elif kind == "shortcut":
                j = int(opt["from"])
                j = j if j >= 0 else i + j
                self.layers.append(_Layer(
                    "shortcut", frm=j,
                    act=opt.get("activation", "linear")))
                channels.append(prev_c(i - 1))
            elif kind == "upsample":
                self.layers.append(_Layer(
                    "upsample", stride=int(opt.get("stride", 2))))
                channels.append(prev_c(i - 1))
            elif kind == "yolo":
                self.layers.append(_Layer("yolo"))
                channels.append(prev_c(i - 1))
                self.outputs.append(i)
            else:
                raise NotImplementedError(f"cfg section [{kind}]")
        self.channels = channels

    # ------------------------------------------------------------ weights
    def load_weights(self, path_or_bytes) -> Dict:
        """Stream a darknet .weights file into a params pytree, exactly in
        the reference's per-block order (yolo_to_h5.py:161-209)."""
        if isinstance(path_or_bytes, (bytes, bytearray)):
            raw = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                raw = f.read()
        header = np.frombuffer(raw[:20], np.int32)
        stream = np.frombuffer(raw[20:], np.float32)
        ptr = 0

        def take(n):
            nonlocal ptr
            out = stream[ptr:ptr + n]
            if out.size != n:
                raise ValueError(
                    f"weights truncated at float {ptr} (+{n})")
            ptr += n
            return np.asarray(out, np.float32)

        params: Dict[str, Dict] = {}
        for i, layer in enumerate(self.layers):
            if layer.kind != "conv":
                continue
            co, k = layer.filters, layer.size
            ci = 1 if layer.depthwise else layer.cin
            p: Dict[str, np.ndarray] = {}
            if layer.bn:
                p["bn_bias"] = take(co)
                p["bn_scale"] = take(co)
                p["bn_mean"] = take(co)
                p["bn_var"] = take(co)
            else:
                p["bias"] = take(co)
            w = take(co * ci * k * k).reshape(co, ci, k, k)
            if layer.depthwise:
                # OIHW (I=1) -> HWIO with channels last: [k,k,1,C]
                p["kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
            else:
                p["kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
            params[f"layer{i}"] = p
        if ptr != stream.size:
            raise ValueError(
                f"weights size mismatch: consumed {ptr} of {stream.size}")
        self.header = header.copy()
        return params

    def num_weight_floats(self) -> int:
        n = 0
        for layer in self.layers:
            if layer.kind != "conv":
                continue
            ci = 1 if layer.depthwise else layer.cin
            n += layer.filters * (4 if layer.bn else 1)
            n += layer.filters * ci * layer.size * layer.size
        return n

    # ------------------------------------------------------------ forward
    def apply(self, params: Dict, x, eps: float = 1e-5):
        """NHWC float32 forward; returns [yolo outputs] or the last
        activation when the cfg has no yolo sections."""
        acts: List = []
        outs: List = []
        for i, layer in enumerate(self.layers):
            inp = acts[i - 1] if i > 0 else x
            if layer.kind == "conv":
                p = params[f"layer{i}"]
                stride = layer.stride
                if layer.size > 1:
                    if stride == 2:   # darknet top-left pad (:223-225)
                        inp = jnp.pad(inp, [(0, 0), (1, 0), (1, 0), (0, 0)])
                        padding = "VALID"
                    else:
                        padding = "SAME"
                else:
                    padding = "SAME"
                from jax import lax
                kern = jnp.asarray(p["kernel"])
                if layer.depthwise:
                    y = lax.conv_general_dilated(
                        inp, kern, (stride, stride), padding,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        feature_group_count=layer.cin)
                else:
                    y = lax.conv_general_dilated(
                        inp, kern, (stride, stride), padding,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if layer.bn:
                    inv = jnp.asarray(p["bn_scale"]) / jnp.sqrt(
                        jnp.asarray(p["bn_var"]) + eps)
                    y = (y - jnp.asarray(p["bn_mean"])) * inv \
                        + jnp.asarray(p["bn_bias"])
                else:
                    y = y + jnp.asarray(p["bias"])
                if layer.act == "leaky":
                    y = jnp.where(y > 0, y, 0.1 * y)
                elif layer.act == "relu":
                    y = jnp.maximum(y, 0)
            elif layer.kind == "maxpool":
                from flax import linen as nn
                y = nn.max_pool(inp, (layer.size, layer.size),
                                (layer.stride, layer.stride), "SAME")
            elif layer.kind == "route":
                y = jnp.concatenate([acts[j] for j in layer.idxs], axis=-1)
            elif layer.kind == "shortcut":
                y = inp + acts[layer.frm]
                if layer.act == "leaky":
                    y = jnp.where(y > 0, y, 0.1 * y)
            elif layer.kind == "upsample":
                s = layer.stride
                y = jnp.repeat(jnp.repeat(inp, s, axis=1), s, axis=2)
            elif layer.kind == "yolo":
                y = inp
                outs.append(y)
            acts.append(y)
        return outs if outs else acts[-1]


def load_cfg_weights(cfg_path: str, weights_path: str):
    """Convenience: (cfg, weights) -> (DarknetNet, params) — the CLI role
    of `yolo_to_h5.py cfg weights out.h5`."""
    with open(cfg_path) as f:
        net = DarknetNet(f.read())
    return net, net.load_weights(weights_path)
