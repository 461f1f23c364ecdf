"""Pretrained ViT weight ingestion: timm / torchvision → Flax param pytrees.

The reference pulls pretrained ViTs from the timm/torchvision hubs at model
construction (``src/models/vit.py:22-33,57``). This build environment has no
network egress, so ingestion is gated on a **local weight cache**:

    $POINTVIT_WEIGHTS (default ~/.cache/pointvit_tpu/weights)/<model_name>.<ext>

with ``<ext>`` one of ``.safetensors``, ``.npz``, ``.pth``, ``.bin``
(torch pickles are loaded CPU-side via the bundled torch). When the cache
file is absent the loaders return ``None`` and models keep their random
initialization — training still runs, just without transfer.

Name-mapping fidelity notes (SURVEY.md §7):
- APF: the reference's ``load_state_dict(strict=False)`` never matches its
  attention weights (it names them ``attention.qkv`` vs timm's ``attn.qkv``)
  or its final norm (``encoder_norm`` vs timm's ``norm``) — apf.py:323-331 —
  so the reference trains with *random frozen* attention. The default here
  loads everything (the intended behaviour);
  ``reference_quirks=True`` reproduces the reference's partial load exactly.
"""

from pointvit_tpu.pretrained.reference_ckpt import (
    load_reference_apf_checkpoint,
    load_reference_pix4point_checkpoint,
    load_reference_renderer_checkpoint,
    load_reference_state_dict,
)
from pointvit_tpu.pretrained.convert import (
    cache_dir,
    load_apf_vit_weights,
    load_pix4point_vit_weights,
    load_state_dict,
    load_torchvision_vit_weights,
    torch_linear_to_flax,
)
from pointvit_tpu.pretrained.hf import (
    hf_vit_to_timm,
    hf_vit_to_torchvision,
    is_hf_vit_state_dict,
)

__all__ = [
    "cache_dir",
    "load_reference_apf_checkpoint",
    "load_reference_pix4point_checkpoint",
    "load_reference_renderer_checkpoint",
    "load_reference_state_dict",
    "load_state_dict",
    "load_apf_vit_weights",
    "load_pix4point_vit_weights",
    "load_torchvision_vit_weights",
    "torch_linear_to_flax",
    "hf_vit_to_timm",
    "hf_vit_to_torchvision",
    "is_hf_vit_state_dict",
]
