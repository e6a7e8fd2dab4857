"""Import helpers for the UNTRUSTED read-only reference at /root/reference.

Used only by parity tests: we instantiate the reference's real torch modules
(random-init, no asset downloads) and assert our flax models + checkpoint
importers reproduce their forward passes bit-for-bit (≤1e-4).

The reference environment differs from ours in two ways we must patch around:

* ``torchvision`` is not installed here, but ``models.enc_visual`` imports it
  at module scope (enc_visual.py:9) — we inject a stub module; the imported
  symbol is never used by the live code paths we exercise.
* ``ET.forward`` hardcodes ``.cuda()`` (src/models/ET_haa.py:139) — we patch
  ``torch.Tensor.cuda`` to a no-op on this CPU-only torch build.
"""

from __future__ import annotations

import sys
import types

_REF_SRC = "/root/reference/src"


def load_reference_models():
    """Import and return the reference ``models`` package (torch)."""
    import torch

    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    if "torchvision" not in sys.modules:
        import importlib.machinery

        def _stub(name):
            mod = types.ModuleType(name)
            # a real ModuleSpec so importlib.util.find_spec (used by
            # transformers' dependency probing) doesn't choke on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
            return mod

        tv = _stub("torchvision")
        tv_tr = _stub("torchvision.transforms")
        tv_fn = _stub("torchvision.transforms.functional")
        tv.transforms = tv_tr
        tv_tr.functional = tv_fn
    # CPU-only torch: make the reference's hardcoded .cuda() calls no-ops.
    if not getattr(torch.Tensor.cuda, "_avdn_noop", False):
        def _cuda_noop(self, *a, **k):
            return self
        _cuda_noop._avdn_noop = True
        torch.Tensor.cuda = _cuda_noop
        torch.nn.Module.cuda = lambda self, *a, **k: self

    import models.ET_haa as ref_et
    import models.vln_model as ref_vln
    import models.dark_net as ref_darknet
    import models.model_util as ref_model_util
    return types.SimpleNamespace(
        et=ref_et, vln=ref_vln, darknet=ref_darknet, model_util=ref_model_util
    )


def torch_state_dict_to_numpy(module, strip_prefix: str = ""):
    """state_dict() → plain {name: np.ndarray}, optionally stripping a key
    prefix (e.g. ``vision_model.`` for the Darknet embedded in ViT_LSTM)."""
    out = {}
    for k, v in module.state_dict().items():
        if strip_prefix:
            if not k.startswith(strip_prefix):
                continue
            k = k[len(strip_prefix):]
        out[k] = v.detach().cpu().numpy()
    return out
