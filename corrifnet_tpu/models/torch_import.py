"""Import reference PyTorch MMVit4 checkpoints into the TPU framework.

Converts a torch ``state_dict`` of the reference CorrIFNet model
(mmvit4.py:391-439 — e.g. a loaded ``Finaliremmodel{i}.pt``) into the
``{"params": ..., "batch_stats": ...}`` variables pytree of
:class:`corrifnet_tpu.models.mmvit4.MMVit4`. This is both a migration path
(reference users bring their trained checkpoints) and the basis of the
full-model numerical parity test (tests/test_full_model_parity.py).

Layout conversions:
  * Conv3d weights (O, I, KD, KH, KW) -> channels-last (KD, KH, KW, I, O);
  * 1x1x1 convs that this framework expresses as per-token Dense layers
    (encode/qkv/decode convs on the 8^3 token grid) -> (I, O) matrices;
  * Linear weights (O, I) -> (I, O);
  * BatchNorm3d -> params {scale, bias} + batch_stats {mean, var};
  * the three per-modality encoders / token streams stack along a leading
    modality axis (RGB, NIR, SWIR) matching the ``nn.vmap`` parameter axes;
  * identical tail bottlenecks stack along axis 0 for the ``nn.scan`` rollup
    (layer{l}_tail/blocks/block).

Dead reference parameters (never used by its forward) are skipped:
{RGB,NIR,SWIR}_decode_conv, decoder seg_d1..4/seg_layer and up4/8/16
(mmvit4.py:237-246,497-499 — defined but unused).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "mmvit4_variables_from_state_dict",
    "mmvit2_variables_from_state_dict",
    "unetv2_variables_from_state_dict",
]

_MODALITIES = ("RGB", "NIR", "SWIR")
_LAYER_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}  # torchvision resnet50


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_kernel(w) -> np.ndarray:
    """(O, I, KD, KH, KW) -> (KD, KH, KW, I, O)."""
    return np.transpose(_np(w), (2, 3, 4, 1, 0))


def _dense_from_conv(w) -> np.ndarray:
    """1x1x1 Conv3d weight -> (I, O) Dense kernel."""
    w = _np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def _linear(w) -> np.ndarray:
    return _np(w).T


def _conv(sd, key) -> Dict:
    out = {"kernel": _conv_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _dense(sd, key) -> Dict:
    out = {"kernel": _dense_from_conv(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd, key) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def _bottleneck(sd, key, has_down) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    for ci in (1, 2, 3):
        params[f"conv{ci}"] = {"kernel": _conv_kernel(sd[f"{key}.conv{ci}.weight"])}
        p, s = _bn(sd, f"{key}.bn{ci}")
        params[f"bn{ci}"], stats[f"bn{ci}"] = p, s
    if has_down:
        params["down_conv"] = {
            "kernel": _conv_kernel(sd[f"{key}.downsample.0.weight"])
        }
        p, s = _bn(sd, f"{key}.downsample.1")
        params["down_bn"], stats["down_bn"] = p, s
    return params, stats


def _encoder(sd, prefix) -> Tuple[Dict, Dict]:
    """One reference Encoder (mmvit4.py:113-194) -> ResNet3DEncoder trees."""
    params: Dict = {"stem_conv": {"kernel": _conv_kernel(sd[f"{prefix}.e1_c1.weight"])}}
    stats: Dict = {}
    p, s = _bn(sd, f"{prefix}.e1_bn")
    params["stem_bn"], stats["stem_bn"] = p, s

    for li, blocks in _LAYER_BLOCKS.items():
        tkey = f"{prefix}.e{li + 1}"  # reference e2..e5 = resnet layer1..4
        p, s = _bottleneck(sd, f"{tkey}.0", has_down=True)
        params[f"layer{li}_block0"], stats[f"layer{li}_block0"] = p, s
        if blocks > 1:
            tail_p, tail_s = [], []
            for bi in range(1, blocks):
                p, s = _bottleneck(sd, f"{tkey}.{bi}", has_down=False)
                tail_p.append(p)
                tail_s.append(s)
            params[f"layer{li}_tail"] = {"blocks": {"block": _stack_trees(tail_p)}}
            stats[f"layer{li}_tail"] = {"blocks": {"block": _stack_trees(tail_s)}}

    for i in range(1, 6):
        params[f"adapt{i}"] = _conv(sd, f"{prefix}.adapt{i}")
    params["conv6"] = _conv(sd, f"{prefix}.conv6")
    return params, stats


def _transformer(sd, prefix, depth=1) -> Dict:
    """Reference Transformer (mmvit4.py:360-388) -> nn.Transformer params."""
    out: Dict = {}
    for j in range(depth):
        attn = f"{prefix}.cross_attention_list.{j}.fn"
        out[f"attn_norm_{j}"] = {
            "scale": _np(sd[f"{attn}.norm.weight"]),
            "bias": _np(sd[f"{attn}.norm.bias"]),
        }
        out[f"attn_{j}"] = {
            "qkv": {"kernel": _linear(sd[f"{attn}.fn.qkv.weight"])},
            "proj": {
                "kernel": _linear(sd[f"{attn}.fn.proj.weight"]),
                "bias": _np(sd[f"{attn}.fn.proj.bias"]),
            },
        }
        ffn = f"{prefix}.cross_ffn_list.{j}.fn"
        out[f"ffn_norm_{j}"] = {
            "scale": _np(sd[f"{ffn}.norm.weight"]),
            "bias": _np(sd[f"{ffn}.norm.bias"]),
        }
        out[f"ffn_{j}"] = {
            "fc1": {
                "kernel": _linear(sd[f"{ffn}.fn.net.0.weight"]),
                "bias": _np(sd[f"{ffn}.fn.net.0.bias"]),
            },
            "fc2": {
                "kernel": _linear(sd[f"{ffn}.fn.net.3.weight"]),
                "bias": _np(sd[f"{ffn}.fn.net.3.bias"]),
            },
        }
    return out


def _stack_trees(trees):
    """Stack a list of identically-structured {str: ...} trees along axis 0."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees)


def _general_conv(sd, key) -> Dict:
    """general_conv3d_prenorm -> GeneralConv3d {conv: {kernel, bias}}
    (InstanceNorm has no parameters)."""
    return {"conv": _conv(sd, f"{key}.conv")}


def _fusion_prenorm(sd, key) -> Dict:
    return {
        f"l{i}": _general_conv(sd, f"{key}.fusion_layer.{i}") for i in range(3)
    }


def _decoder(sd, use_reduce: bool = True) -> Dict:
    d = "decoder_fuse"
    out: Dict = {"final_conv": _conv(sd, f"{d}.final_conv")}
    if use_reduce:
        out["RFM5_reduce"] = _conv(sd, f"{d}.RFM5_reduce")
    for i in range(1, 6):
        out[f"RFM{i}"] = _fusion_prenorm(sd, f"{d}.RFM{i}")
    for name in (
        "d4_c1", "d4_c2", "d4_out", "d3_c1", "d3_c2", "d3_out",
        "d2_c1", "d2_c2", "d2_out", "d1_c1", "d1_c2", "d1_out",
    ):
        out[name] = _general_conv(sd, f"{d}.{name}")
    return out


def _mm2_encoder(sd, prefix) -> Dict:
    """One reference conv Encoder (mmmvit2.py:57-104) -> ConvEncoder params.

    ``e1_c1`` is a bare biased Conv3d; every other stage conv is a
    general_conv3d_prenorm (InstanceNorm carries no parameters). The
    reference's bottleneck 1x1 is attribute ``conv``; ours is ``conv6``."""
    params: Dict = {"e1_c1": _conv(sd, f"{prefix}.e1_c1")}
    for si in range(1, 6):
        for ci in (1, 2, 3):
            if si == 1 and ci == 1:
                continue
            params[f"e{si}_c{ci}"] = _general_conv(sd, f"{prefix}.e{si}_c{ci}")
    params["conv6"] = _conv(sd, f"{prefix}.conv")
    return params


def mmvit2_variables_from_state_dict(
    state_dict: Mapping, mmformer: bool = False
) -> Dict:
    """Reference MMVit2 (mmmvit2.py:345-477) or mmformer (mmformer.py:349-
    435) ``state_dict`` -> :class:`corrifnet_tpu.models.mmvit2.MMVit2` /
    ``MMFormer`` ``variables`` pytree.

    The two reference files are byte-identical apart from the correlation
    stage; mmformer's state_dict simply lacks the ``qkv_{RGB,NIR,SWIR}``
    convs. With ``mmformer=True`` those leaves are filled with zeros — the
    rebuild's ``_IntraStream`` always declares them, but with
    ``use_correlation=False`` their outputs are dead (DCE'd under jit).

    No batch_stats collection: every norm in this model family is a
    parameter-free InstanceNorm."""
    sd = dict(state_dict)
    tdim = int(_np(sd["RGB_pos"]).shape[-1])

    enc_p, stream_p = [], []
    for m in _MODALITIES:
        enc_p.append(_mm2_encoder(sd, f"{m}_encoder"))
        if mmformer:
            qkv = {
                "kernel": np.zeros((tdim, tdim * 3), np.float32),
                "bias": np.zeros((tdim * 3,), np.float32),
            }
        else:
            qkv = _dense(sd, f"qkv_{m}")
        stream_p.append(
            {
                "encode_conv": _dense(sd, f"{m}_encode_conv"),
                "transformer": _transformer(sd, f"{m}_transformer"),
                "qkv": qkv,
            }
        )

    params: Dict = {
        "encoders": _stack_trees(enc_p),
        "modality_stream": _stack_trees(stream_p),
        "modality_pos": np.stack([_np(sd[f"{m}_pos"]) for m in _MODALITIES]),
        "multimodal_transformer": _transformer(sd, "multimodal_transformer"),
        "multimodal_decode_conv": _dense(sd, "multimodal_decode_conv"),
        "decoder": _decoder(sd, use_reduce=False),
    }
    return {"params": params}


def mmvit4_variables_from_state_dict(
    state_dict: Mapping, pack_stage1: bool = False
) -> Dict:
    """Reference MMVit4 ``state_dict`` -> MMVit4 ``variables`` pytree.

    ``pack_stage1=True`` emits the tree for ``MMVit4(pack_stage1=True)``
    (the default fast config): stage-1 params move under ``packed_stage1``
    via :func:`~corrifnet_tpu.models.resnet3d.pack_stage1_variables` —
    pure moves/reshapes, no numeric change."""
    sd = dict(state_dict)

    enc_p, enc_s = [], []
    stream_p = []
    for m in _MODALITIES:
        p, s = _encoder(sd, f"{m}_encoder")
        enc_p.append(p)
        enc_s.append(s)
        stream_p.append(
            {
                "encode_conv": _dense(sd, f"{m}_encode_conv"),
                "transformer": _transformer(sd, f"{m}_transformer"),
                "qkv": _dense(sd, f"qkv_{m}"),
            }
        )

    params: Dict = {
        "encoders": _stack_trees(enc_p),
        "modality_stream": _stack_trees(stream_p),
        "modality_pos": np.stack([_np(sd[f"{m}_pos"]) for m in _MODALITIES]),
        "fused6_pos": _np(sd["fused6_pos"]),
        "fused6_encode_conv": _dense(sd, "fused6_encode_conv"),
        "multimodal_transformer": _transformer(sd, "multimodal_transformer"),
        "multimodal_decode_conv": _dense(sd, "multimodal_decode_conv"),
        "decoder": _decoder(sd),
    }
    for i in range(1, 7):
        params[f"fusion{i}"] = {"conv": _conv(sd, f"fusion{i}.conv")}

    batch_stats = {"encoders": _stack_trees(enc_s)}
    variables = {"params": params, "batch_stats": batch_stats}
    if pack_stage1:
        from corrifnet_tpu.models.resnet3d import pack_stage1_variables

        variables = pack_stage1_variables(variables)
    return variables


# ---------------------------------------------------------------------------
# Single-modality (4-D) zoo converters
# ---------------------------------------------------------------------------


def _conv2d(sd, key) -> Dict:
    """Conv2d weight (O, I, KH, KW) -> channels-last (KH, KW, I, O)."""
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _double_conv2(sd, key) -> Tuple[Dict, Dict]:
    """Reference double_conv (F9_UNET_V2_3.py:19-37): Sequential indices
    0/3 are the convs, 1/4 the BNs -> DoubleConv {conv0,bn0,conv1,bn1}."""
    params, stats = {}, {}
    for i, idx in enumerate((0, 3)):
        params[f"conv{i}"] = _conv2d(sd, f"{key}.{idx}")
        p, s = _bn(sd, f"{key}.{idx + 1}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    return params, stats


def unetv2_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference UNetV2 (F9_UNET_V2_3.py:113-141) ``state_dict`` ->
    :class:`corrifnet_tpu.models.unet.UNetV2` ``variables`` pytree.

    The reference ``up`` module's ConvTranspose2d parameters
    (``up{i}.up.weight/bias``) are dead with the default ``bilinear=True``
    (F9:74-78) and are skipped, matching the rebuild's documented omission.
    """
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def put(name, key):
        params[name], stats[name] = _double_conv2(sd, key)

    put("inc", "inc.conv.conv")
    for i in range(1, 5):
        # down = Sequential(MaxPool2d, Dropout, double_conv) (F9:49-56)
        put(f"down{i}", f"down{i}.mpconv.2.conv")
    for i in range(1, 5):
        put(f"up{i}", f"up{i}.conv.conv")
    params["outc"] = _conv2d(sd, "outc.conv")
    return {"params": params, "batch_stats": stats}


def _convtranspose2d(sd, key) -> Dict:
    """ConvTranspose2d weight (I, O, KH, KW) -> (KH, KW, O, I), the layout
    of :class:`corrifnet_tpu.nn.ConvTranspose`."""
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _prelu(sd, key) -> Dict:
    return {"prelu": {"alpha": _np(sd[f"{key}.weight"])}}


# my regular-bottleneck name -> reference attribute (F29_ENet.py:286-377);
# the rebuild names stage-2/3 blocks a..h, the reference numbers them
_ENET_REGULARS = [
    *[(f"regular1_{i}", f"regular1_{i}") for i in range(1, 5)],
    ("regular2_a", "regular2_1"), ("dilated2_b", "dilated2_2"),
    ("asym2_c", "asymmetric2_3"), ("dilated2_d", "dilated2_4"),
    ("regular2_e", "regular2_5"), ("dilated2_f", "dilated2_6"),
    ("asym2_g", "asymmetric2_7"), ("dilated2_h", "dilated2_8"),
    ("regular3_a", "regular3_0"), ("dilated3_b", "dilated3_1"),
    ("asym3_c", "asymmetric3_2"), ("dilated3_d", "dilated3_3"),
    ("regular3_e", "regular3_4"), ("dilated3_f", "dilated3_5"),
    ("asym3_g", "asymmetric3_6"), ("dilated3_h", "dilated3_7"),
    ("regular4_1", "regular4_1"), ("regular4_2", "regular4_2"),
    ("regular5_1", "regular5_1"),
]


def enet_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference ENet (F29_ENet.py:278-437) ``state_dict`` ->
    :class:`corrifnet_tpu.models.enet.ENet` ``variables`` pytree.

    The reference shares ONE activation module instance across each
    bottleneck's Sequentials and ``out_prelu`` — the same PReLU tensor
    appears under several state_dict keys; ``out_prelu.weight`` is read as
    the canonical one. Encoder bottlenecks (``encoder_relu=False``) carry
    the PReLU parameter; decoder ones (ReLU) carry none. The dead
    ``project_layer`` (commented out of the forward, F29:414-415) is
    skipped.
    """
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def seq(dst_p, dst_s, ref_key, names):
        """Conv/BN pairs from a Sequential: names = [(conv_name, bn_name,
        seq_conv_idx), ...] (BN always follows its conv)."""
        for cname, bname, idx in names:
            dst_p[cname] = _conv2d(sd, f"{ref_key}.{idx}")
            p, s = _bn(sd, f"{ref_key}.{idx + 1}")
            dst_p[bname], dst_s[bname] = p, s

    params["init_conv"] = _conv2d(sd, "initial_block.main_branch")
    p, s = _bn(sd, "initial_block.batch_norm")
    params["init_bn"], stats["init_bn"] = p, s
    params["init_act"] = _prelu(sd, "initial_block.out_prelu")

    for stage in (1, 2):
        ref = f"downsample{stage}_0"
        bp: Dict = {}
        bs: Dict = {}
        seq(bp, bs, f"{ref}.ext_conv1", [("c1", "bn1", 0)])
        seq(bp, bs, f"{ref}.ext_conv2", [("c2", "bn2", 0)])
        seq(bp, bs, f"{ref}.ext_conv3", [("c3", "bn3", 0)])
        bp["act"] = _prelu(sd, f"{ref}.out_prelu")
        params[f"down{stage}_0"], stats[f"down{stage}_0"] = bp, bs

    for mine, ref in _ENET_REGULARS:
        bp, bs = {}, {}
        seq(bp, bs, f"{ref}.ext_conv1", [("c1", "bn1", 0)])
        if mine.startswith("asym"):
            seq(bp, bs, f"{ref}.ext_conv2",
                [("c2a", "bn2a", 0), ("c2b", "bn2b", 3)])
        else:
            seq(bp, bs, f"{ref}.ext_conv2", [("c2", "bn2", 0)])
        seq(bp, bs, f"{ref}.ext_conv3", [("c3", "bn3", 0)])
        if f"{ref}.out_prelu.weight" in sd:  # encoder PReLU; decoder ReLU
            bp["act"] = _prelu(sd, f"{ref}.out_prelu")
        params[mine], stats[mine] = bp, bs

    for stage, mine in ((4, "up4_0"), (5, "up5_0")):
        ref = f"upsample{stage}_0"
        bp, bs = {}, {}
        bp["main_c1"] = _conv2d(sd, f"{ref}.main_conv1.0")
        p, s = _bn(sd, f"{ref}.main_conv1.1")
        bp["main_bn"], bs["main_bn"] = p, s
        seq(bp, bs, f"{ref}.ext_conv1", [("c1", "bn1", 0)])
        bp["c2"] = _convtranspose2d(sd, f"{ref}.ext_conv2.0")
        p, s = _bn(sd, f"{ref}.ext_conv2.1")
        bp["bn2"], bs["bn2"] = p, s
        seq(bp, bs, f"{ref}.ext_conv3", [("c3", "bn3", 0)])
        if f"{ref}.out_prelu.weight" in sd:
            bp["act"] = _prelu(sd, f"{ref}.out_prelu")
        params[mine], stats[mine] = bp, bs

    params["transposed_conv"] = _convtranspose2d(sd, "transposed_conv")
    return {"params": params, "batch_stats": stats}
