"""2-D -> 3-D ResNet50 weight inflation (reference: mmvit4.py:83-111
``inflate_conv`` + Encoder.__init__).

The reference inflates torchvision's ImageNet ResNet50 into the 3-D
encoder: the stem conv becomes kernel (3,7,7) with the RGB input channels
averaged to 1 and repeated over the depth axis (mmvit4.py:100-102); every
bottleneck conv gets time_dim=1 (``w2d.unsqueeze(2) / time_dim``,
mmvit4.py:105); BatchNorms are built FRESH (inflation copies conv weights
only, mmvit4.py:121,132). Note that MMVit4's constructor then re-inits all
Conv3d weights anyway (mmvit4.py:437-439), so the committed run never used
these weights — this converter exists for the capability (warm-starting an
encoder from a local torchvision checkpoint).

Input: a torch-style state_dict mapping (e.g. ``resnet50().state_dict()``
converted to numpy). Output: a params pytree fragment matching
:class:`corrifnet_tpu.models.resnet3d.ResNet3DEncoder` (conv kernels only —
merge over a freshly initialized tree with :func:`merge_params`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["inflate_resnet50", "merge_params"]

_LAYER_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _inflate(w2d: np.ndarray, time_dim: int) -> np.ndarray:
    """mmvit4.py:83-111: (O, I, Kh, Kw) torch conv -> (Kd, Kh, Kw, I', O)."""
    o, i, kh, kw = w2d.shape
    if i == 3 and time_dim > 1:
        # stem: average RGB -> 1 input channel, repeat over depth
        w = w2d.mean(axis=1, keepdims=True)  # (O,1,Kh,Kw)
        w3d = np.repeat(w[:, :, None], time_dim, axis=2)  # (O,1,T,Kh,Kw)
    else:
        w3d = np.repeat(w2d[:, :, None], time_dim, axis=2) / time_dim
    # (O, I, Kd, Kh, Kw) -> (Kd, Kh, Kw, I, O)
    return np.transpose(w3d, (2, 3, 4, 1, 0))


def inflate_resnet50(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Returns {param_path: kernel} for ResNet3DEncoder conv weights."""
    sd = {k: _to_np(v) for k, v in state_dict.items() if k.endswith("weight")}
    out: Dict = {"stem_conv": {"kernel": _inflate(sd["conv1.weight"], 3)}}

    for li, blocks in _LAYER_BLOCKS.items():
        # block 0 (strided, with downsample projection)
        b0 = {}
        for ci in (1, 2, 3):
            b0[f"conv{ci}"] = {
                "kernel": _inflate(sd[f"layer{li}.0.conv{ci}.weight"], 1)
            }
        b0["down_conv"] = {
            "kernel": _inflate(sd[f"layer{li}.0.downsample.0.weight"], 1)
        }
        out[f"layer{li}_block0"] = b0

        # tail blocks 1..n-1: stacked along axis 0 for the nn.scan rollup
        if blocks > 1:
            tail = {}
            for ci in (1, 2, 3):
                stack = np.stack(
                    [
                        _inflate(sd[f"layer{li}.{bi}.conv{ci}.weight"], 1)
                        for bi in range(1, blocks)
                    ]
                )
                tail[f"conv{ci}"] = {"kernel": stack}
            out[f"layer{li}_tail"] = {"blocks": {"block": tail}}
    return out


def merge_params(init_params: Dict, inflated: Dict) -> Dict:
    """Overlay inflated conv kernels onto a freshly initialized encoder
    params tree (BNs/adapt convs keep their fresh init, matching the
    reference's fresh-BatchNorm3d semantics).

    Targets the per-modality (pack_stage1=False) encoder tree. For the
    default packed model, merge into a pack-off init first and convert the
    result with :func:`~corrifnet_tpu.models.resnet3d.pack_stage1_variables`.
    """
    import jax

    merged = jax.tree_util.tree_map(lambda x: x, init_params)  # copy

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v

    overlay(merged, inflated)
    return merged
