"""Cfg-parser + shape contract vs the reference Darknet on a FULL YOLOv3.

The released xView ``yolo_v3.cfg`` asset isn't distributed with the repo, so
this retires the import risk ahead of it: a faithful public YOLOv3 topology
(darknet-53 + 3 heads, routes with negative AND absolute indices, upsamples,
yolo blocks, 60 xView classes) is pushed through the reference parser/model
(src/models/dark_net.py:7-261) and ours, asserting:

* identical parsed block structure,
* identical per-layer output shapes on the feature path,
* identical per-layer VALUES (≤1e-3) once the reference's random-init
  weights are imported through ``darknet_params_from_torch``.

Yolo layers are excluded from value/shape comparison: the reference emits
decoded detections there while we pass features through — by design, since
the agents never consume them (the cfg's routes skip past yolo outputs, and
the feature contract is ``layer_outputs[-1]`` of the live path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from avdn_tpu.compat.torch_import import darknet_params_from_torch
from avdn_tpu.models import Darknet, DarknetConfig
from avdn_tpu.models.darknet import full_yolov3_cfg, parse_darknet_cfg

from reference_loader import load_reference_models, torch_state_dict_to_numpy


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "yolo_v3.cfg"
    p.write_text(full_yolov3_cfg(classes=60, img_size=224))
    return str(p)


class TestParserContract:
    def test_block_structure_matches_reference_parser(self, ref, cfg_path):
        ref_defs = ref.darknet.parse_model_config(cfg_path)
        ours = parse_darknet_cfg(full_yolov3_cfg(classes=60, img_size=224))
        assert len(ref_defs) == len(ours)
        for rb, ob in zip(ref_defs, ours):
            assert {k: str(v) for k, v in rb.items()} == ob

    def test_topology_census(self):
        blocks = parse_darknet_cfg(full_yolov3_cfg())
        kinds = [b["type"] for b in blocks[1:]]
        assert kinds.count("yolo") == 3
        assert kinds.count("upsample") == 2
        assert kinds.count("route") == 4
        assert kinds.count("shortcut") == 23  # darknet-53 residuals
        assert kinds.count("convolutional") == 75
        # absolute route indices land on the canonical backbone taps
        routes = [b["layers"] for b in blocks[1:] if b["type"] == "route"]
        assert routes == ["-4", "-1, 61", "-4", "-1, 36"]


class TestShapeAndValueContract:
    def test_per_layer_parity(self, ref, cfg_path):
        torch.manual_seed(11)
        ref_model = ref.darknet.Darknet(cfg_path, img_size=224)
        ref_model.eval()

        rng = np.random.default_rng(12)
        img = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)

        # replicate the reference walk to capture every layer output
        # (Darknet.forward only returns layer_outputs[-1],
        # src/models/dark_net.py:212-240)
        ref_outputs = []
        with torch.no_grad():
            x = torch.from_numpy(img)
            for module_def, module in zip(ref_model.module_defs,
                                          ref_model.module_list):
                t = module_def["type"]
                if t in ("convolutional", "upsample"):
                    x = module(x)
                elif t == "route":
                    idx = [int(v) for v in module_def["layers"].split(",")]
                    x = torch.cat([ref_outputs[i] for i in idx], 1)
                elif t == "shortcut":
                    x = ref_outputs[-1] + ref_outputs[int(module_def["from"])]
                elif t == "yolo":
                    x = module(x)
                ref_outputs.append(x)

        cfg = DarknetConfig.from_text(full_yolov3_cfg(classes=60), img_size=224)
        variables = darknet_params_from_torch(
            torch_state_dict_to_numpy(ref_model), cfg.block_dicts()
        )
        ours = Darknet(cfg)
        our_outputs = ours.apply(
            variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
            train=False, return_layers=True,
        )

        kinds = [b["type"] for b in cfg.block_dicts()[1:]]
        assert len(ref_outputs) == len(our_outputs) == len(kinds)
        for i, (kind, rt, oj) in enumerate(zip(kinds, ref_outputs, our_outputs)):
            if kind == "yolo":
                continue  # detections vs feature passthrough, by design
            r = rt.numpy()  # NCHW
            o = np.transpose(np.asarray(oj), (0, 3, 1, 2))  # NHWC → NCHW
            assert r.shape == o.shape, f"layer {i} ({kind}): {r.shape} vs {o.shape}"
            np.testing.assert_allclose(
                o, r, atol=1e-3, rtol=1e-3,
                err_msg=f"layer {i} ({kind}) value mismatch",
            )

        # the stride-32 head tap the agent contract depends on: 512ch @ 7x7
        head1_tap = ref_outputs[79]
        assert tuple(head1_tap.shape) == (1, 512, 7, 7)

    def test_feature_extractor_trim_flattened_output(self, ref, cfg_path):
        """The agents consume layer_outputs[-1] flattened to (B, C, 49)
        (src/xview_et/agent.py:593-594); verify end-to-end on the default
        generated tower (which ends at the 512-channel stride-32 conv)."""
        torch.manual_seed(13)
        cfg = DarknetConfig.default()
        import tempfile, os
        blocks = cfg.block_dicts()
        text_lines = []
        for b in blocks:
            b = dict(b)
            text_lines.append(f"[{b.pop('type')}]")
            text_lines.extend(f"{k}={v}" for k, v in b.items())
            text_lines.append("")
        with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
            f.write("\n".join(text_lines))
            path = f.name
        try:
            ref_model = ref.darknet.Darknet(path, img_size=224)
        finally:
            os.unlink(path)
        ref_model.eval()
        rng = np.random.default_rng(14)
        img = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            feat_t = ref_model(torch.from_numpy(img))
        assert tuple(feat_t.shape) == (2, 512, 7, 7)

        variables = darknet_params_from_torch(
            torch_state_dict_to_numpy(ref_model), cfg.block_dicts()
        )
        feat_j = Darknet(cfg).apply(
            variables, jnp.asarray(img.transpose(0, 2, 3, 1)), train=False
        )
        np.testing.assert_allclose(
            np.asarray(feat_j), feat_t.numpy().reshape(2, 512, 49),
            atol=1e-3, rtol=1e-3,
        )
