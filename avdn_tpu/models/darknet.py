"""Darknet/YOLOv3 vision tower — cfg-driven flax conv stack.

The reference parses a darknet ``.cfg`` at runtime into torch modules and
uses the network purely as a feature extractor: its forward returns the LAST
layer's activation, which for the released xView config at 224 input is a
(B, 512, 7, 7) conv feature map (src/models/dark_net.py:201-240; callers
flatten to (B, 512, 49), src/xview_et/agent.py:593-594). The YOLO detection
loss branch is dead code (undefined ``build_targets``,
src/models/dark_net.py:153) and is intentionally not rebuilt.

This implementation:
* parses the same cfg format (``parse_darknet_cfg``),
* builds an NHWC flax network (TPU conv layout; imports NCHW torch weights
  through ``avdn_tpu.compat.torch_import``),
* ships a generated default config (``default_xview_cfg``) — a darknet-53
  backbone plus the stride-32 head ending at 512 channels — since the
  released ``yolo_v3.cfg`` asset is distributed with the dataset, not the
  repo. Users with the real cfg/weights get an exact reconstruction.
"""

from __future__ import annotations

import dataclasses
from typing import List, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn


def parse_darknet_cfg(text: str) -> List[Dict[str, str]]:
    """Parse darknet cfg text into a list of block dicts (same grammar as the
    reference parser, src/models/dark_net.py:243-261)."""
    blocks: List[Dict[str, str]] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("["):
            blocks.append({"type": line[1:-1].strip()})
            if blocks[-1]["type"] == "convolutional":
                blocks[-1]["batch_normalize"] = "0"
        else:
            k, v = line.split("=", 1)
            blocks[-1][k.strip()] = v.strip()
    return blocks


def _res_block(ch: int) -> str:
    half = ch // 2
    return f"""
[convolutional]
batch_normalize=1
filters={half}
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters={ch}
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear
"""


def default_xview_cfg() -> str:
    """Generated darknet-53 feature-extractor config: backbone to 1024@/32
    plus the YOLOv3 stride-32 conv head ending at 512 channels — i.e. a
    (B, 512, 7, 7) output at 224 input, matching the shape contract of the
    released xView config (SURVEY.md §2.1 #8)."""
    parts = [
        """
[net]
channels=3
height=224
width=224
""",
        """
[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky
""",
    ]
    stages = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]
    for ch, nres in stages:
        parts.append(
            f"""
[convolutional]
batch_normalize=1
filters={ch}
size=3
stride=2
pad=1
activation=leaky
"""
        )
        parts.extend(_res_block(ch) for _ in range(nres))
    # stride-32 YOLO head conv set, cut at the final 512 feature map
    for f, s in [(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1)]:
        parts.append(
            f"""
[convolutional]
batch_normalize=1
filters={f}
size={s}
stride=1
pad=1
activation=leaky
"""
        )
    return "".join(parts)


def full_yolov3_cfg(classes: int = 60, img_size: int = 224) -> str:
    """Faithful reconstruction of the public YOLOv3 topology (darknet-53
    backbone + 3 detection heads with routes, upsamples, negative/absolute
    route indices, and yolo blocks), parameterised by class count — 60 for
    xView, matching the reference's dead YOLO loss path
    (src/models/dark_net.py:85 ``nC  # number of classes (60)``).

    The released ``yolo_v3.cfg`` asset ships with the dataset, not the repo;
    this is the standard public topology it derives from, used to prove the
    cfg parser/shape contract against the reference parser before the asset
    is available.
    """
    det = 3 * (5 + classes)
    anchors = "10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326"

    def conv(filters, size, stride=1, bn=1, act="leaky"):
        return (
            "\n[convolutional]\n"
            + ("batch_normalize=1\n" if bn else "")
            + f"filters={filters}\nsize={size}\nstride={stride}\npad=1\n"
            + f"activation={act}\n"
        )

    def yolo(mask):
        return (
            f"\n[yolo]\nmask={mask}\nanchors={anchors}\n"
            f"classes={classes}\nnum=9\njitter=.3\nignore_thresh=.7\n"
            "truth_thresh=1\nrandom=1\n"
        )

    parts = [f"[net]\nchannels=3\nheight={img_size}\nwidth={img_size}\n"]
    # darknet-53 backbone
    parts.append(conv(32, 3))
    for ch, nres in [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]:
        parts.append(conv(ch, 3, stride=2))
        parts.extend(_res_block(ch) for _ in range(nres))
    # head 1 (stride 32)
    for f, s in [(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1), (1024, 3)]:
        parts.append(conv(f, s))
    parts.append(conv(det, 1, bn=0, act="linear"))
    parts.append(yolo("6,7,8"))
    # head 2 (stride 16)
    parts.append("\n[route]\nlayers=-4\n")
    parts.append(conv(256, 1))
    parts.append("\n[upsample]\nstride=2\n")
    parts.append("\n[route]\nlayers=-1, 61\n")
    for f, s in [(256, 1), (512, 3), (256, 1), (512, 3), (256, 1), (512, 3)]:
        parts.append(conv(f, s))
    parts.append(conv(det, 1, bn=0, act="linear"))
    parts.append(yolo("3,4,5"))
    # head 3 (stride 8)
    parts.append("\n[route]\nlayers=-4\n")
    parts.append(conv(128, 1))
    parts.append("\n[upsample]\nstride=2\n")
    parts.append("\n[route]\nlayers=-1, 36\n")
    for f, s in [(128, 1), (256, 3), (128, 1), (256, 3), (128, 1), (256, 3)]:
        parts.append(conv(f, s))
    parts.append(conv(det, 1, bn=0, act="linear"))
    parts.append(yolo("0,1,2"))
    return "".join(parts)


@dataclasses.dataclass(frozen=True)
class DarknetConfig:
    blocks: tuple  # tuple of frozen block dicts (hashable for flax)
    img_size: int = 224

    @staticmethod
    def from_text(text: str, img_size: int = 224) -> "DarknetConfig":
        blocks = parse_darknet_cfg(text)
        return DarknetConfig(
            blocks=tuple(tuple(sorted(b.items())) for b in blocks), img_size=img_size
        )

    @staticmethod
    def default(img_size: int = 224) -> "DarknetConfig":
        return DarknetConfig.from_text(default_xview_cfg(), img_size)

    @staticmethod
    def tiny(img_size: int = 224) -> "DarknetConfig":
        """Small tower for tests: 4 convs + shortcut + route → (B, 64, 7, 7)."""
        txt = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=1
filters=16
size=3
stride=4
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=4
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky
"""
        return DarknetConfig.from_text(txt, img_size)

    def block_dicts(self) -> List[Dict[str, str]]:
        return [dict(b) for b in self.blocks]


class Darknet(nn.Module):
    """NHWC darknet network. ``__call__(x (B, H, W, 3))`` returns the last
    layer's activation as (B, C, S) with spatial flattened channel-major —
    the layout downstream attention expects (the reference flattens
    (B, 512, 7, 7) → (B, 512, 49), src/xview_et/agent.py:593-594).

    ``folded=True`` builds the eval-inference variant: every conv carries a
    bias and no BatchNorm modules exist — apply it with parameters produced
    by ``fold_darknet_params`` (running stats algebraically folded into the
    conv weights). Same math as eval-mode BN up to float reassociation.
    """

    cfg: DarknetConfig
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.9  # torch BatchNorm2d default (momentum=0.1)
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, return_layers: bool = False):
        blocks = self.cfg.block_dicts()
        assert blocks[0]["type"] == "net"
        outputs = []
        for i, b in enumerate(blocks[1:]):
            t = b["type"]
            if t == "convolutional":
                bn = int(b.get("batch_normalize", "0")) and not self.folded
                k = int(b["size"])
                stride = int(b["stride"])
                pad = (k - 1) // 2 if int(b["pad"]) else 0
                x = nn.Conv(
                    int(b["filters"]),
                    (k, k),
                    strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=not bn,
                    name=f"conv_{i}",
                    dtype=self.dtype,
                )(x)
                if bn:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=self.bn_momentum,
                        epsilon=1e-5,
                        name=f"bn_{i}",
                        dtype=self.dtype,
                    )(x)
                if b.get("activation") == "leaky":
                    # torch nn.LeakyReLU() default slope 0.01
                    # (src/models/dark_net.py:33)
                    x = nn.leaky_relu(x, negative_slope=0.01)
            elif t == "upsample":
                s = int(b["stride"])
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * s, W * s, C), method="nearest")
            elif t == "route":
                layers = [int(v) for v in b["layers"].split(",")]
                x = jnp.concatenate([outputs[li] for li in layers], axis=-1)
            elif t == "shortcut":
                x = outputs[-1] + outputs[int(b["from"])]
            elif t == "maxpool":
                k = int(b["size"])
                s = int(b["stride"])
                x = nn.max_pool(x, (k, k), strides=(s, s), padding="SAME")
            elif t == "yolo":
                # feature-extraction mode: detection decode is out of scope
                pass
            else:
                raise ValueError(f"unsupported block type: {t}")
            outputs.append(x)
        if return_layers:
            # per-layer activations (NHWC), for shape-contract tests against
            # the reference walk (src/models/dark_net.py:212-240)
            return outputs
        B, H, W, C = x.shape
        # NHWC → channel-major flattened (B, C, H*W)
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)


def fold_darknet_params(cfg: DarknetConfig, params, batch_stats,
                        input_mean=None, input_std=None, eps: float = 1e-5):
    """Fold eval-mode BatchNorm (and optionally the input normalisation)
    into the conv weights — the classic inference transform:

        BN(conv(x)) = conv(x)·γ/√(σ²+ε) + (β − μ·γ/√(σ²+ε))
                    = conv'(x) + b'   with   W' = W·γ/√(σ²+ε)

    With ``input_std`` the first conv additionally absorbs the ``/s`` of the
    input normalisation ``(x − m)/s`` (kernel divided by ``s`` per input
    channel): the rollout then feeds mean-subtracted views and skips the
    division pass. The mean subtraction itself must STAY outside — the first
    conv zero-pads its input, and in the unfolded path that zero is the
    *normalised* zero; folding the mean into a bias would mis-handle every
    border tap. Scaling commutes with zero padding, so the ``/s`` fold is
    exact. Equivalent to the reference's eval path
    (src/models/dark_net.py:201-240 + agent.py:115-116) up to float
    reassociation.

    Returns parameters for ``Darknet(cfg, folded=True)``; O(|params|)
    elementwise work, cheap enough to run inside the jitted eval step."""
    if input_mean is not None:
        raise ValueError(
            "input_mean cannot be folded into a zero-padded conv "
            "(border taps would shift); subtract the mean in the caller "
            "and pass input_std only"
        )
    out = {}
    first_conv = None
    for i, b in enumerate(cfg.block_dicts()[1:]):
        if b["type"] != "convolutional":
            continue
        name = f"conv_{i}"
        if first_conv is None:
            first_conv = name
        kernel = params[name]["kernel"]
        if int(b.get("batch_normalize", "0")) and f"bn_{i}" in params:
            bn_p = params[f"bn_{i}"]
            bn_s = batch_stats[f"bn_{i}"]
            scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)   # (Cout,)
            kernel = kernel * scale  # (k, k, Cin, Cout) · (Cout,)
            bias = bn_p["bias"] - bn_s["mean"] * scale
        else:
            bias = params[name].get("bias", jnp.zeros(kernel.shape[-1],
                                                      kernel.dtype))
        out[name] = {"kernel": kernel, "bias": bias}
    if input_std is not None and first_conv is not None:
        s = jnp.asarray(input_std, jnp.float32)
        kernel = out[first_conv]["kernel"] / s[None, None, :, None]
        out[first_conv] = {"kernel": kernel, "bias": out[first_conv]["bias"]}
    return out
