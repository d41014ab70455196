"""Bridge for importing the ACTUAL reference code (/root/reference/code)
under CPU torch, so parity tests compare against the real thing instead of
builder-authored stand-ins.

The reference imports torchvision (absent in this image) but only ever
calls ``transforms.functional.resized_crop/resize`` (code/train.py:169,178)
and ``utils.save_image`` (main.py:288-294) — a ~30-line stub covers it.
CUDA entry points (.cuda()) are patched to identities; ``.half()`` is
patched (scoped) to an f16 ROUND-TRIP so ``F.grid_sample(f32, grid.half())``
— legal under CUDA autocast, a dtype error on CPU — computes in f32 with
the same f16 grid rounding our ``bug_parity`` path applies
(tecogan_tpu/engine/losses.py flows_to_grids / assemble_triplets).
"""

from __future__ import annotations

import contextlib
import sys
import types

import torch
import torch.nn.functional as F

REF_CODE = "/root/reference/code"

_cache: dict = {}


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    utils = types.ModuleType("torchvision.utils")

    def resized_crop(img, top, left, height, width, size, **kw):
        crop = img[..., top : top + height, left : left + width]
        if list(size) == [height, width]:
            return crop
        return F.interpolate(
            crop, size=list(size), mode="bilinear", align_corners=False
        )

    def resize(img, size, **kw):
        return F.interpolate(
            img, size=list(size), mode="bilinear", align_corners=False
        )

    functional.resized_crop = resized_crop
    functional.resize = resize
    transforms.functional = functional
    utils.save_image = lambda *a, **k: None
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional
    sys.modules["torchvision.utils"] = utils


def _patch_cuda_to_identity() -> None:
    if _cache.get("cuda_patched"):
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _cache["cuda_patched"] = True


@contextlib.contextmanager
def half_as_f32_roundtrip():
    """Within the context, ``x.half()`` returns f32 values rounded through
    f16 (CUDA-autocast-equivalent grid rounding that CPU grid_sample can
    consume)."""
    orig = torch.Tensor.half

    def roundtrip(self, *a, **k):
        return orig(self).float()

    torch.Tensor.half = roundtrip
    try:
        yield
    finally:
        torch.Tensor.half = orig


def load_reference():
    """Import and return (models, train, ops) modules of the actual
    reference, CPU-runnable.  Idempotent."""
    if "modules" in _cache:
        return _cache["modules"]
    _install_torchvision_stub()
    _patch_cuda_to_identity()
    sys.path.insert(0, REF_CODE)
    try:
        import ops as ref_ops  # noqa: F401
        import models as ref_models
        import train as ref_train
    finally:
        sys.path.remove(REF_CODE)
    _cache["modules"] = (ref_models, ref_train, ref_ops)
    return _cache["modules"]
