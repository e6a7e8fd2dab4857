"""int8 quantized Darknet inference tower (eval/serving opt-in).

The v5e MXU executes s8×s8→s32 convolutions at 2× the bf16 peak
(394 vs 197 TOP/s), and the eval tower is conv-bound once the two-pass
render is on (PERF.md "Episode rollout profile"). This module runs the
BN-folded inference tower (models/darknet.py:fold_darknet_params — the
transform already produces the bias-carrying conv form quantization wants)
with:

* **weights**: per-output-channel symmetric int8
  (``scale = amax(|W|)/127`` over the (k, k, Cin) receptive field);
* **activations**: per-EXAMPLE dynamic symmetric int8, the scale computed
  from each layer input's abs-max over its own (H, W, C) at call time (no
  calibration dataset needed — and batch-invariant: a request's result
  never depends on what it was co-batched with);
* **accumulation**: int32 via ``preferred_element_type``, dequantized to
  float once per conv, bias added in float, leaky-ReLU in float.

Same network walk as ``Darknet.__call__`` (upsample / route / shortcut /
maxpool follow models/darknet.py:281-338; the reference walk is
src/models/dark_net.py:212-240). Quantization error is bounded by the
golden gate alongside the other fast eval modes
(tests/test_render_mode_goldens.py) and by direct tower-parity tests
(tests/test_quant.py). Opt-in: ``--quant int8``.

Backends without an s8 conv path (CPU) run the SAME integer tensors
through a float32 conv — identical quantization decisions, only the
accumulator (f32 vs s32) differs, so cross-backend drift is bounded by
f32 rounding on ≤2^14-magnitude partial sums.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from avdn_tpu.models.darknet import DarknetConfig

_QMAX = 127.0


def quantize_darknet_params(cfg: DarknetConfig, folded_params) -> Dict[str, Any]:
    """Folded (bias-carrying) conv params → int8 tree
    ``{conv_i: {kernel_q int8, scale (Cout,) f32, bias (Cout,) f32}}``.
    Pure elementwise; cheap enough to run in-jit each eval call like the
    BN fold itself."""
    out = {}
    for name, p in folded_params.items():
        kernel = p["kernel"].astype(jnp.float32)
        amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))          # (Cout,)
        scale = jnp.maximum(amax, 1e-12) / _QMAX
        q = jnp.clip(jnp.round(kernel / scale), -_QMAX, _QMAX)
        out[name] = {
            "kernel_q": q.astype(jnp.int8),
            "scale": scale,
            "bias": p["bias"].astype(jnp.float32),
        }
    return out


def _quant_act(x):
    """Per-example dynamic symmetric int8 of an activation tensor: the
    abs-max is taken over everything BUT the batch axis, so one episode's
    quantization (and therefore its serving result) never depends on which
    other episodes it was co-batched with."""
    amax = jnp.max(jnp.abs(x), axis=tuple(range(1, x.ndim)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(x / scale), -_QMAX, _QMAX)
    return q, scale


def _conv_s8(xq, wq, stride: int, pad: int, int8_dot: bool):
    dn = jax.lax.conv_dimension_numbers(xq.shape, wq.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    if int8_dot:
        acc = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8), wq, (stride, stride),
            [(pad, pad), (pad, pad)], dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32)
    # fallback path (CPU tests): same integer values, f32 accumulation
    return jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), (stride, stride),
        [(pad, pad), (pad, pad)], dimension_numbers=dn,
    )


def quant_forward(cfg: DarknetConfig, qparams, x, return_layers: bool = False):
    """Quantized eval forward; mirrors ``Darknet.__call__`` (folded mode).
    ``x`` is the mean-subtracted view batch (the /std is folded into
    conv_0's weights before quantization, engine.py fused_input_norm)."""
    int8_dot = jax.default_backend() == "tpu"
    blocks = cfg.block_dicts()
    assert blocks[0]["type"] == "net"
    outputs = []
    x = x.astype(jnp.float32)
    for i, b in enumerate(blocks[1:]):
        t = b["type"]
        if t == "convolutional":
            k = int(b["size"])
            stride = int(b["stride"])
            pad = (k - 1) // 2 if int(b["pad"]) else 0
            p = qparams[f"conv_{i}"]
            xq, act_scale = _quant_act(x)
            acc = _conv_s8(xq, p["kernel_q"], stride, pad, int8_dot)
            x = acc * (act_scale * p["scale"]) + p["bias"]
            if b.get("activation") == "leaky":
                x = jax.nn.leaky_relu(x, negative_slope=0.01)
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
            kk = int(b["size"])
            s = int(b["stride"])
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, kk, kk, 1), (1, s, s, 1),
                "SAME",
            )
        elif t == "yolo":
            pass  # feature-extraction mode (dead detection branch upstream)
        else:
            raise ValueError(f"unsupported block type: {t}")
        outputs.append(x)
    if return_layers:
        return outputs
    B, H, W, C = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)


class QuantDarknet:
    """Duck-typed stand-in for ``Darknet(folded=True)`` in the eval
    rollout: same ``.apply({"params": qtree}, x, train=False)`` surface,
    quantized execution. Parameters come from
    ``quantize_darknet_params(fold_darknet_params(...))``."""

    def __init__(self, cfg: DarknetConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.folded = True

    def apply(self, variables, x, train: bool = False,
              return_layers: bool = False, **kw):
        assert not train, "the quantized tower is inference-only"
        del kw
        return quant_forward(self.cfg, variables["params"], x,
                             return_layers=return_layers)
