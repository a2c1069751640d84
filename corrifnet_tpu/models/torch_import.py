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


def _channelnorm(sd, key) -> Dict:
    """Reference conv-LayerNorm params (1, C, 1, 1) -> (C,) g/b
    (segformer.py:30-40)."""
    return {
        "g": _np(sd[f"{key}.g"]).reshape(-1),
        "b": _np(sd[f"{key}.b"]).reshape(-1),
    }


def segformer_variables_from_state_dict(state_dict: Mapping,
                                        num_layers: int = 2) -> Dict:
    """Reference Segformer (segformer.py:171-216) ``state_dict`` ->
    :class:`corrifnet_tpu.models.segformer.Segformer` ``variables``.

    The Unfold + 1x1-conv overlap patch embed converts to the equivalent
    overlapping-patch conv: the 1x1 weight (O, I*k*k, 1, 1) reshapes to
    (O, I, k, k) — nn.Unfold orders the patch vector (c, kh, kw), exactly
    conv-kernel layout — then to channels-last (k, k, I, O).
    """
    sd = state_dict
    ksp = (7, 3, 3, 3)
    params: Dict = {}
    for si in range(4):
        k = ksp[si]
        w = _np(sd[f"mit.stages.{si}.1.weight"])  # (O, I*k*k, 1, 1)
        o = w.shape[0]
        params[f"s{si}_embed"] = {
            "kernel": w.reshape(o, -1, k, k).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"mit.stages.{si}.1.bias"]),
        }
        for li in range(num_layers):
            base = f"mit.stages.{si}.2.{li}"
            params[f"s{si}_l{li}_norm1"] = _channelnorm(sd, f"{base}.0.norm")
            params[f"s{si}_l{li}_attn"] = {
                name: _conv2d(sd, f"{base}.0.fn.{name}")
                for name in ("to_q", "to_kv", "to_out")
            }
            params[f"s{si}_l{li}_norm2"] = _channelnorm(sd, f"{base}.1.norm")
            ff = f"{base}.1.fn.net"
            params[f"s{si}_l{li}_ff"] = {
                "fc1": _conv2d(sd, f"{ff}.0"),
                "dw": _conv2d(sd, f"{ff}.1.net.0"),
                "pw": _conv2d(sd, f"{ff}.1.net.1"),
                "fc2": _conv2d(sd, f"{ff}.3"),
            }
        params[f"fuse{si}"] = _conv2d(sd, f"to_fused.{si}.0")
    if "to_segmentation1.weight" in sd:
        # orphan debug variant (F32_SEGFORMER.py:198-199): the head is two
        # separately-named convs instead of the Sequential
        params["seg1"] = _conv2d(sd, "to_segmentation1")
        params["seg2"] = _conv2d(sd, "to_segmentation2")
    else:
        params["seg1"] = _conv2d(sd, "to_segmentation.0")
        params["seg2"] = _conv2d(sd, "to_segmentation.1")
    return {"params": params}


# --- ELANet (F30_ELANet.py:252-342) ---------------------------------------


def _prelu_chan(sd, key) -> Dict:
    """nn.PReLU(nOut) -> PReLU {alpha (nOut,)}."""
    return {"alpha": _np(sd[f"{key}.weight"])}


def _ela_cbp(sd, key) -> Tuple[Dict, Dict]:
    """ConvBNPReLU (F30:9-23) -> {conv, bn, act}."""
    p: Dict = {"conv": _conv2d(sd, f"{key}.conv")}
    bn_p, bn_s = _bn(sd, f"{key}.bn")
    p["bn"] = bn_p
    p["act"] = _prelu_chan(sd, f"{key}.act")
    return p, {"bn": bn_s}


def _ela_bnp(sd, key) -> Tuple[Dict, Dict]:
    """BNPReLU (F30:26-37) -> {bn, act}."""
    bn_p, bn_s = _bn(sd, f"{key}.bn")
    return {"bn": bn_p, "act": _prelu_chan(sd, f"{key}.act")}, {"bn": bn_s}


def _ela_cca(sd, key) -> Dict:
    """CCA Conv1d weights (1, 1, k) -> (k, 1, 1) WIO (F30:165-181)."""
    return {
        "w1": _np(sd[f"{key}.conv.0.weight"]).transpose(2, 1, 0),
        "w2": _np(sd[f"{key}.conv.2.weight"]).transpose(2, 1, 0),
    }


def _ela_ecg_d(sd, key) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for name in ("conv1x1", "conv1"):
        params[name], stats[name] = _ela_cbp(sd, f"{key}.{name}")
    for name in ("F_loc", "F_sur"):
        params[name] = {"kernel": _conv2d(sd, f"{key}.{name}.conv")["kernel"]}
    bn_p, bn_s = _bn(sd, f"{key}.bn")
    params["bn"], stats["bn"] = bn_p, bn_s
    params["act"] = _prelu_chan(sd, f"{key}.act")
    params["reduce"] = {"kernel": _conv2d(sd, f"{key}.reduce.conv")["kernel"]}
    params["CA"] = _ela_cca(sd, f"{key}.CA")
    return params, stats


def _ela_ecg_r(sd, key) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for name in ("conv1x1", "conv1", "conv2"):
        params[name], stats[name] = _ela_cbp(sd, f"{key}.{name}")
    for name in ("F_loc1", "F_sur1", "F_loc2", "F_sur2"):
        params[name] = {"kernel": _conv2d(sd, f"{key}.{name}.conv")["kernel"]}
    for name in ("bn_prelu1", "bn_prelu2"):
        params[name], stats[name] = _ela_bnp(sd, f"{key}.{name}")
    params["CA"] = _ela_cca(sd, f"{key}.CA")
    return params, stats


def _ela_wdconv(sd, key) -> Tuple[Dict, Dict]:
    p: Dict = {"conv": {"kernel": _conv2d(sd, f"{key}.conv")["kernel"]}}
    bp, bs = _ela_bnp(sd, f"{key}.bnpre")
    p["bnpre"] = bp
    return p, {"bnpre": bs}


def elanet_variables_from_state_dict(state_dict: Mapping, M: int = 2,
                                     N: int = 5) -> Dict:
    """Reference ELANet (F30_ELANet.py:252-342) ``state_dict`` ->
    :class:`corrifnet_tpu.models.elanet.ELANet` ``variables``."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    def put(name, ref, fn):
        params[name], stats[name] = fn(sd, ref)

    for i in range(3):
        put(f"level1_{i}", f"level1_{i}", _ela_cbp)
    put("b1", "b1", _ela_bnp)
    put("level2_0", "level2_0", _ela_ecg_d)
    for i in range(M):
        put(f"level2_r{i}", f"level2.{i}", _ela_ecg_r)
    put("bn_prelu_2", "bn_prelu_2", _ela_bnp)
    put("level3_0", "level3_0", _ela_ecg_d)
    for i in range(2 * N - 1):
        put(f"level3_r{i}", f"level3.{i}", _ela_ecg_r)
    put("bn_prelu_3", "bn_prelu_3", _ela_bnp)

    dp: Dict = {}
    ds: Dict = {}
    dp["Xd1_wd"], ds["Xd1_wd"] = _ela_wdconv(sd, "decode.Xd1.0")
    dp["Xd1_pw"] = _conv2d(sd, "decode.Xd1.1")
    dp["Xd1_bnp"], ds["Xd1_bnp"] = _ela_bnp(sd, "decode.Xd1.2")
    dp["Xd2_wd"], ds["Xd2_wd"] = _ela_wdconv(sd, "decode.Xd2")
    dp["Xd2_1_wd"], ds["Xd2_1_wd"] = _ela_wdconv(sd, "decode.Xd2_1.0")
    dp["Xd2_1_pw"] = _conv2d(sd, "decode.Xd2_1.1")
    dp["Xd2_1_bnp"], ds["Xd2_1_bnp"] = _ela_bnp(sd, "decode.Xd2_1.2")
    dp["Xb_1"] = _conv2d(sd, "decode.Xb_1.0")
    dp["CA"] = _ela_cca(sd, "decode.CA")
    sap: Dict = {}
    sas: Dict = {}
    sap["c1"], sas["c1"] = _ela_cbp(sd, "decode.SA.conv.0")
    sap["dw"] = {"kernel": _conv2d(sd, "decode.SA.conv.1.conv")["kernel"]}
    sap["bnp"], sas["bnp"] = _ela_bnp(sd, "decode.SA.conv.2")
    sap["out"] = _conv2d(sd, "decode.SA.conv.3")
    dp["SA"], ds["SA"] = sap, sas
    dp["bnpre"], ds["bnpre"] = _ela_bnp(sd, "decode.bnpre")
    params["decode"], stats["decode"] = dp, ds

    params["classifier"] = {
        "kernel": _conv2d(sd, "classifier.0.conv")["kernel"]
    }
    return {"params": params, "batch_stats": stats}


# --- FASSDNet (F28_FASSDNet.py:272-377) ------------------------------------


def _fassd_convlayer(sd, key) -> Tuple[Dict, Dict]:
    """ConvLayer (F28:167-178) -> {conv, norm}."""
    p: Dict = {"conv": {"kernel": _conv2d(sd, f"{key}.conv")["kernel"]}}
    bp, bs = _bn(sd, f"{key}.norm")
    p["norm"] = bp
    return p, {"norm": bs}


def _fassd_hardblock(sd, key, n_layers) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for i in range(n_layers):
        params[f"layer{i}"], stats[f"layer{i}"] = _fassd_convlayer(
            sd, f"{key}.layers.{i}"
        )
    return params, stats


def _fassd_bnprelu(sd, key) -> Tuple[Dict, Dict]:
    """F28's BNPReLU names the PReLU ``acti`` (F28:99-108)."""
    bp, bs = _bn(sd, f"{key}.bn")
    return (
        {"bn": bp, "act": {"alpha": _np(sd[f"{key}.acti.weight"])}},
        {"bn": bs},
    )


def _fassd_mda(sd, key) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    params["bn_relu_1"], stats["bn_relu_1"] = _fassd_bnprelu(
        sd, f"{key}.bn_relu_1"
    )
    for mine, ref in (
        ("conv3x3", "conv3x3"),
        ("par_conv3x3", "parallel_conv3x3"),
        ("par_ddconv3x1", "parallel_ddconv3x1"),
        ("par_ddconv1x3", "parallel_ddconv1x3"),
    ):
        params[f"{mine}_conv"] = {
            "kernel": _conv2d(sd, f"{key}.{ref}.conv")["kernel"]
        }
        params[f"{mine}_bnp"], stats[f"{mine}_bnp"] = _fassd_bnprelu(
            sd, f"{key}.{ref}.bn_prelu"
        )
    params["bn_relu_2"], stats["bn_relu_2"] = _fassd_bnprelu(
        sd, f"{key}.bn_relu_2"
    )
    params["conv1x1"] = {"kernel": _conv2d(sd, f"{key}.conv1x1.conv")["kernel"]}
    return params, stats


def _fassd_dapf(sd, key="DAPF") -> Tuple[Dict, Dict]:
    params: Dict = {"conv1x1": {"kernel": _conv2d(sd, f"{key}.conv1x1")["kernel"]}}
    stats: Dict = {}
    params["bn1x1"], stats["bn1x1"] = _bn(sd, f"{key}.bn1x1")
    for i in (2, 3, 4):
        pp: Dict = {}
        ps: Dict = {}
        pp["conv3x1"] = {
            "kernel": _conv2d(sd, f"{key}.pyBranch{i}.atrous_conv3x1")["kernel"]
        }
        pp["bn3x1"], ps["bn3x1"] = _bn(sd, f"{key}.pyBranch{i}.bn3x1")
        pp["conv1x3"] = {
            "kernel": _conv2d(sd, f"{key}.pyBranch{i}.atrous_conv1x3")["kernel"]
        }
        pp["bn1x3"], ps["bn1x3"] = _bn(sd, f"{key}.pyBranch{i}.bn1x3")
        params[f"pyBranch{i}"], stats[f"pyBranch{i}"] = pp, ps
    params["conv1"] = {"kernel": _conv2d(sd, f"{key}.conv1")["kernel"]}
    params["bn1"], stats["bn1"] = _bn(sd, f"{key}.bn1")
    return params, stats


def fassdnet_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference FASSDNet (F28_FASSDNet.py:272-377) ``state_dict`` ->
    :class:`corrifnet_tpu.models.fassdnet.FASSDNet` ``variables``.

    The reference's ``base`` ModuleList interleaves stems / HarDBlocks /
    transition ConvLayers / (parameterless) AvgPools; indices are resolved
    by the same construction order (F28:286-302). TransitionUp carries no
    parameters (F28:246-260).
    """
    sd = state_dict
    n_layers = [4, 4, 8, 8]
    params: Dict = {}
    stats: Dict = {}
    for i in range(4):
        params[f"stem{i}"], stats[f"stem{i}"] = _fassd_convlayer(
            sd, f"base.{i}"
        )
    idx = 4
    for i in range(4):
        params[f"hard{i}"], stats[f"hard{i}"] = _fassd_hardblock(
            sd, f"base.{idx}", n_layers[i]
        )
        params[f"trans{i}"], stats[f"trans{i}"] = _fassd_convlayer(
            sd, f"base.{idx + 1}"
        )
        idx += 3  # hardblock + convlayer + avgpool (absent after the last)
    params["DAPF"], stats["DAPF"] = _fassd_dapf(sd)
    for di in range(3):
        params[f"up_conv{di}"], stats[f"up_conv{di}"] = _fassd_convlayer(
            sd, f"conv1x1_up.{di}"
        )
        params[f"mda{di}"], stats[f"mda{di}"] = _fassd_mda(sd, f"mda.{di}")
        params[f"hard_up{di}"], stats[f"hard_up{di}"] = _fassd_hardblock(
            sd, f"denseBlocksUp.{di}", n_layers[2 - di]
        )
    params["finalConv"] = _conv2d(sd, "finalConv")
    return {"params": params, "batch_stats": stats}


# --- DeepLabv3_plus (F14_DEEPLABV3PLUS_V4_xception.py:445-494) --------------


def _sepconv_same(sd, key) -> Dict:
    """SeparableConv2d_same (F14:38-51) -> {dw, pw}."""
    return {
        "dw": {"kernel": _conv2d(sd, f"{key}.conv1")["kernel"]},
        "pw": {"kernel": _conv2d(sd, f"{key}.pointwise")["kernel"]},
    }


def _xblock(sd, key, reps, stride=1, start_with_relu=True, grow_first=True,
            is_last=False) -> Tuple[Dict, Dict]:
    """Xception Block (F14:54-108): rebuild the ``rep`` Sequential's layout
    (parameterless ReLUs included in the indexing) to locate each
    SeparableConv / BN, then map to the rebuild's sep{j}/bn{j} names."""
    seq = []
    if grow_first:
        seq += ["relu", "sep", "bn"]
    for _ in range(reps - 1):
        seq += ["relu", "sep", "bn"]
    if not grow_first:
        seq += ["relu", "sep", "bn"]
    if not start_with_relu:
        seq = seq[1:]
    if stride != 1:
        seq.append("sep")
    if stride == 1 and is_last:
        seq.append("sep")

    params: Dict = {}
    stats: Dict = {}
    j = 0
    for pos, kind in enumerate(seq):
        if kind != "sep":
            continue
        params[f"sep{j}"] = _sepconv_same(sd, f"{key}.rep.{pos}")
        if pos + 1 < len(seq) and seq[pos + 1] == "bn":
            bp, bs = _bn(sd, f"{key}.rep.{pos + 1}")
            params[f"bn{j}"], stats[f"bn{j}"] = bp, bs
        j += 1
    if f"{key}.skip.weight" in sd:
        params["skip"] = {"kernel": _conv2d(sd, f"{key}.skip")["kernel"]}
        bp, bs = _bn(sd, f"{key}.skipbn")
        params["skipbn"], stats["skipbn"] = bp, bs
    return params, stats


def deeplab_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference DeepLabv3_plus (F14:445-494) ``state_dict`` ->
    :class:`corrifnet_tpu.models.deeplabv3p.DeepLabV3Plus` ``variables``."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}

    xp: Dict = {}
    xs: Dict = {}
    for name in ("conv1", "conv2"):
        xp[name] = {
            "kernel": _conv2d(sd, f"xception_features.{name}")["kernel"]
        }
    for name in ("bn1", "bn2"):
        xp[name], xs[name] = _bn(sd, f"xception_features.{name}")
    specs = {
        "block1": dict(reps=2, stride=2, start_with_relu=False),
        "block2": dict(reps=2, stride=2),
        "block3": dict(reps=2, stride=2, is_last=True),
        **{f"block{i}": dict(reps=3) for i in range(4, 20)},
        "block20": dict(reps=2, grow_first=False, is_last=True),
    }
    for name, kw in specs.items():
        xp[name], xs[name] = _xblock(sd, f"xception_features.{name}", **kw)
    for i in (3, 4, 5):
        xp[f"conv{i}"] = _sepconv_same(sd, f"xception_features.conv{i}")
        xp[f"bn{i}"], xs[f"bn{i}"] = _bn(sd, f"xception_features.bn{i}")
    params["xception"], stats["xception"] = xp, xs

    for i in range(1, 5):
        params[f"aspp{i}"] = _conv2d(sd, f"aspp{i}.atrous_convolution")
        params[f"aspp{i}_bn"], stats[f"aspp{i}_bn"] = _bn(
            sd, f"aspp{i}.batch_norm"
        )
    params["image_pool"] = _conv2d(sd, "image_pool.1")
    params["fc1"] = _conv2d(sd, "fc1.0")
    params["fc1_bn"], stats["fc1_bn"] = _bn(sd, "fc1.1")
    params["reduce_conv2"] = _conv2d(sd, "reduce_conv2.0")
    params["reduce_bn"], stats["reduce_bn"] = _bn(sd, "reduce_conv2.1")
    for j, (ci, bi) in enumerate(((0, 1), (4, 5))):
        params[f"last_conv{j}"] = _conv2d(sd, f"last_conv.{ci}")
        params[f"last_bn{j}"], stats[f"last_bn{j}"] = _bn(
            sd, f"last_conv.{bi}"
        )
    params["classifier"] = _conv2d(sd, "last_conv.8")
    return {"params": params, "batch_stats": stats}


# --- RFNet (RFNet.py:287-317) ----------------------------------------------


def _rf_gconv(sd, key) -> Dict:
    """RFNet general_conv3d (RFNet.py:18-33; InstanceNorm3d is
    parameter-free) -> GeneralConv3d {conv: {kernel, bias}}."""
    return {"conv": _conv(sd, f"{key}.conv")}


def _rf_encoder(sd, prefix) -> Dict:
    params: Dict = {}
    for s in range(1, 5):
        for c in range(1, 4):
            params[f"e{s}_c{c}"] = _rf_gconv(sd, f"{prefix}.e{s}_c{c}")
    return params


def _rf_prm(sd, key) -> Dict:
    p = {
        f"emb{i}": _rf_gconv(sd, f"{key}.embedding_layer.{i}")
        for i in range(3)
    }
    p["prm0"] = _rf_gconv(sd, f"{key}.prm_layer.0")
    p["prm1"] = _conv(sd, f"{key}.prm_layer.1")
    return p


def _rf_rfm(sd, key) -> Dict:
    p: Dict = {
        "mf_w0": _conv(sd, f"{key}.modal_fusion.weight_layer.0"),
        "mf_w1": _conv(sd, f"{key}.modal_fusion.weight_layer.2"),
    }
    for i in range(3):
        p[f"rf{i}"] = _rf_gconv(sd, f"{key}.region_fusion.fusion_layer.{i}")
        p[f"sc{i}"] = _rf_gconv(sd, f"{key}.short_cut.{i}")
    return p


def rfnet_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference RFNet (RFNet.py:287-317) ``state_dict`` ->
    :class:`corrifnet_tpu.models.rfnet.RFNet` ``variables``. The three
    per-modality encoders stack along the leading ``nn.vmap`` axis."""
    sd = state_dict
    params: Dict = {
        "encoders": _stack_trees(
            [_rf_encoder(sd, f"{m}_encoder") for m in _MODALITIES]
        )
    }
    d = "decoder_fuse"
    params["prm_generator4"] = _rf_prm(sd, f"{d}.prm_generator4")
    for i in (1, 2, 3):
        params[f"prm_generator{i}"] = _rf_prm(sd, f"{d}.prm_generator{i}")
    for i in (1, 2, 3, 4):
        params[f"RFM{i}"] = _rf_rfm(sd, f"{d}.RFM{i}")
    for name in (
        "d3_c1", "d3_c2", "d3_out", "d2_c1", "d2_c2", "d2_out",
        "d1_c1", "d1_c2", "d1_out",
    ):
        params[name] = _rf_gconv(sd, f"{d}.{name}")
    params["seg_layer"] = _conv(sd, f"{d}.seg_layer")
    return {"params": params}


# --- RobustMseg (RobustSeg.py:8-95) ----------------------------------------


def _rs_basic(sd, key) -> Dict:
    """BasicConv2d (RobustSeg.py:274-288; bias=False, InstanceNorm2d is
    parameter-free) -> {conv: {kernel}}."""
    return {"conv": {"kernel": _conv2d(sd, f"{key}.conv")["kernel"]}}


def _rs_style_enc(sd, prefix) -> Dict:
    p = {f"enc{i}": _rs_basic(sd, f"{prefix}.encoder.{i}") for i in range(5)}
    p["final"] = _rs_basic(sd, f"{prefix}.final")
    return p


def _rs_content_enc(sd, prefix) -> Dict:
    return {
        f"e{l}c{c}": _rs_basic(sd, f"{prefix}.e{l}c{c}")
        for l in range(1, 5)
        for c in range(1, 4)
    }


def _rs_mlp(sd, key) -> Dict:
    return {
        name: {
            "kernel": _linear(sd[f"{key}.{name}.weight"]),
            "bias": _np(sd[f"{key}.{name}.bias"]),
        }
        for name in ("l1", "l2", "l_mu", "l_sigma")
    }


def _rs_recon(sd, prefix) -> Dict:
    p: Dict = {"mlp": _rs_mlp(sd, f"{prefix}.mlp")}
    for i in range(4):
        p[f"res{i}_conv1"] = _rs_basic(sd, f"{prefix}.res_blocks.{i}.conv1")
        p[f"res{i}_conv2"] = _rs_basic(sd, f"{prefix}.res_blocks.{i}.conv2")
    for i in range(3):
        p[f"up{i}"] = _rs_basic(sd, f"{prefix}.up_blocks.{i}.1")
    p["final"] = _rs_basic(sd, f"{prefix}.final")
    return p


def robustseg_variables_from_state_dict(state_dict: Mapping) -> Dict:
    """Reference RobustMseg (RobustSeg.py:8-95) ``state_dict`` ->
    :class:`corrifnet_tpu.models.robustseg.RobustMseg` ``variables``. The
    per-modality style/content encoders stack along the ``nn.vmap`` axis."""
    sd = state_dict
    params: Dict = {
        "style_enc": _stack_trees(
            [_rs_style_enc(sd, f"style_enc_list.{m}") for m in range(3)]
        ),
        "content_enc": _stack_trees(
            [_rs_content_enc(sd, f"content_enc_list.{m}") for m in range(3)]
        ),
    }
    for lvl in range(4):
        params[f"content_attn{lvl}"] = _rs_basic(sd, f"content_attn.{lvl}")
        params[f"content_share{lvl}"] = _rs_basic(sd, f"content_share.{lvl}")
    for i in range(3):
        params[f"recon{i}"] = _rs_recon(sd, f"recon_decoders.{i}")
    segp: Dict = {
        f"{g}_{i}": _rs_basic(sd, f"seg_decoder.{g}_{i}")
        for g in ("c3", "c2", "c1")
        for i in (1, 2, 3)
    }
    segp["final"] = _rs_basic(sd, "seg_decoder.final")
    params["seg_decoder"] = segp
    return {"params": params}


# --- MultiSenseSeg (MultiSenseSeg.py:1137-1297) -----------------------------


def _ln_params(sd, key) -> Dict:
    """torch LayerNorm -> {scale, bias}."""
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _mss_cba(sd, conv_key, bn_key=None) -> Tuple[Dict, Dict]:
    """_ConvBNAct {conv[, bn]} from a torch conv (+BN) pair."""
    p: Dict = {"conv": _conv2d(sd, conv_key)}
    s: Dict = {}
    if bn_key is not None:
        p["bn"], s["bn"] = _bn(sd, bn_key)
    return p, s


def _mss_se(sd, key) -> Dict:
    """SE_channel_attention (MultiSenseSeg.py:79-91) -> SEAttention: a
    Sequential(avg_pool, conv, act, conv, sigmoid) — convs at 1 and 3."""
    return {
        "fc1": {"conv": _conv2d(sd, f"{key}.attn.1")},
        "fc2": {"conv": _conv2d(sd, f"{key}.attn.3")},
    }


def _mss_mse(sd, key) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    p["conv1"], s["conv1"] = _mss_cba(sd, f"{key}.conv1.0", f"{key}.conv1.1")
    p["conv2"] = {"conv": _conv2d(sd, f"{key}.conv2")}
    p["conv3_dw"], s["conv3_dw"] = _mss_cba(
        sd, f"{key}.conv3.0", f"{key}.conv3.1"
    )
    p["conv3_pw"] = {"conv": _conv2d(sd, f"{key}.conv3.2")}
    p["attn"] = _mss_se(sd, f"{key}.attn")
    return p, s


def _mss_amm(sd, key) -> Dict:
    return {
        "short_cut_conv": _conv2d(sd, f"{key}.short_cut_conv.0"),
        "short_cut_ln": _ln_params(sd, f"{key}.short_cut_conv.1.1"),
        "q": _conv2d(sd, f"{key}.q"),
        "k": _conv2d(sd, f"{key}.k"),
        "v": _conv2d(sd, f"{key}.v"),
        "q_proj": _conv2d(sd, f"{key}.q_proj.1"),
        "k_proj": _conv2d(sd, f"{key}.k_proj.1"),
        "v_proj": _conv2d(sd, f"{key}.v_proj"),
        "logit_scale": _np(sd[f"{key}.logit_scale"]),
        "cpb_fc1": {
            "kernel": _linear(sd[f"{key}.cpb_mlp.0.weight"]),
            "bias": _np(sd[f"{key}.cpb_mlp.0.bias"]),
        },
        "cpb_fc2": {"kernel": _linear(sd[f"{key}.cpb_mlp.2.weight"])},
        "proj1": {"conv": _conv2d(sd, f"{key}.proj.0")},
        "proj2": {"conv": _conv2d(sd, f"{key}.proj.2")},
        "norm": _ln_params(sd, f"{key}.norm.1"),
    }


def _mss_block(sd, key) -> Tuple[Dict, Dict]:
    p: Dict = {"norm1": _ln_params(sd, f"{key}.norm1")}
    s: Dict = {}
    p["attn"] = {
        "qkv": {
            "kernel": _linear(sd[f"{key}.attn.qkv.weight"]),
            "bias": _np(sd[f"{key}.attn.qkv.bias"]),
        },
        "proj": {
            "kernel": _linear(sd[f"{key}.attn.proj.weight"]),
            "bias": _np(sd[f"{key}.attn.proj.bias"]),
        },
        "relative_position_bias_table": _np(
            sd[f"{key}.attn.relative_position_bias_table"]
        ),
    }
    # norm2 = Sequential(Rearrange, BatchNorm1d) (creat_norm_layer 'BN' token)
    p["norm2"], s["norm2"] = _bn(sd, f"{key}.norm2.1")
    mp: Dict = {"convup": {"conv": _conv2d(sd, f"{key}.mlp.convup.0")}}
    ms: Dict = {}
    mp["dw"], ms["dw"] = _mss_cba(
        sd, f"{key}.mlp.dw_conv.0", f"{key}.mlp.dw_conv.1"
    )
    mp["convdown"] = {"conv": _conv2d(sd, f"{key}.mlp.convdown")}
    p["mlp"], s["mlp"] = mp, ms
    return p, s


def _mss_backbone(sd, prefix, depths) -> Tuple[Dict, Dict]:
    p: Dict = {}
    s: Dict = {}
    for li, depth in enumerate(depths):
        for i in range(depth):
            bp, bs = _mss_block(sd, f"{prefix}.layers.{li}.long_blocks.{i}")
            p[f"stage{li}_block{i}"], s[f"stage{li}_block{i}"] = bp, bs
        p[f"out_norm{li}"] = _ln_params(sd, f"{prefix}.norm{li}")
        if li < len(depths) - 1:
            p[f"merge{li}"] = {
                "ln": _ln_params(sd, f"{prefix}.layers.{li}.downsample.ln"),
                "reduction": {
                    "kernel": _linear(
                        sd[f"{prefix}.layers.{li}.downsample.reduction.weight"]
                    )
                },
            }
    return p, s


def multisenseseg_variables_from_state_dict(state_dict: Mapping,
                                            depths=(2, 2, 8, 2)) -> Dict:
    """Reference MultiSenseSeg (MultiSenseSeg.py:1137-1297) ``state_dict``
    -> :class:`corrifnet_tpu.models.multisenseseg.MultiSenseSeg`
    ``variables``. The angular positional scalars are plain-list
    nn.Parameters in the reference (never registered, MultiSenseSeg.py:
    1100-1101) so they are absent from the state_dict on both sides; the
    AMM relative_position_bias buffer is reproduced statically."""
    sd = state_dict
    params: Dict = {}
    stats: Dict = {}
    for i in range(3):
        params[f"MSE{i}"], stats[f"MSE{i}"] = _mss_mse(
            sd, f"build_MSEs_AMM.MSEs.{i}"
        )
    params["smooth"], stats["smooth"] = _mss_cba(
        sd, "build_MSEs_AMM.smooth.0", "build_MSEs_AMM.smooth.1"
    )
    params["AMM"] = _mss_amm(sd, "build_MSEs_AMM.fuse_proj")
    params["backbone"], stats["backbone"] = _mss_backbone(
        sd, "build_pipeline", depths
    )

    ppm_p: Dict = {
        f"pool_proj{i}": _conv2d(sd, f"build_neck.ppm_head.pool_projs.{i}.1")
        for i in range(4)
    }
    ppm_s: Dict = {}
    ppm_p["bottom"], ppm_s["bottom"] = _mss_cba(
        sd, "build_neck.ppm_head.bottom.0", "build_neck.ppm_head.bottom.1"
    )
    params["ppm"], stats["ppm"] = ppm_p, ppm_s

    fpn_p: Dict = {}
    fpn_s: Dict = {}
    for i in range(len(depths) - 1):
        fpn_p[f"conv_{i}"], fpn_s[f"conv_{i}"] = _mss_cba(
            sd, f"build_neck.fpn_neck.conv_.{i}.0",
            f"build_neck.fpn_neck.conv_.{i}.1",
        )
        fpn_p[f"fpn_conv{i}"], fpn_s[f"fpn_conv{i}"] = _mss_cba(
            sd, f"build_neck.fpn_neck.fpn_conv.{i}.0",
            f"build_neck.fpn_neck.fpn_conv.{i}.1",
        )
    fpn_p["out"], fpn_s["out"] = _mss_cba(
        sd, "build_neck.fpn_neck.out.0", "build_neck.fpn_neck.out.1"
    )
    params["fpn"], stats["fpn"] = fpn_p, fpn_s

    d = "build_decode_head"
    dp: Dict = {}
    ds: Dict = {}
    dp["conv"], ds["conv"] = _mss_cba(sd, f"{d}.conv.0", f"{d}.conv.1")
    dp["sa_conv1"] = _conv2d(sd, f"{d}.spat_attn.conv1.1")
    dp["sa_bn1"], ds["sa_bn1"] = _bn(sd, f"{d}.spat_attn.conv1.2")
    dp["sa_conv2"], ds["sa_conv2"] = _mss_cba(
        sd, f"{d}.spat_attn.conv2.0", f"{d}.spat_attn.conv2.1"
    )
    dp["sa_attn"], ds["sa_attn"] = _mss_cba(
        sd, f"{d}.spat_attn.attn.1", f"{d}.spat_attn.attn.2"
    )
    dp["chan_attn"] = _mss_se(sd, f"{d}.chan_attn")
    dp["dw1"], ds["dw1"] = _mss_cba(sd, f"{d}.dwconv.0", f"{d}.dwconv.1")
    dp["dw2"] = {"conv": _conv2d(sd, f"{d}.dwconv.2")}
    dp["out_conv"] = {"conv": _conv2d(sd, f"{d}.out.1")}
    params["decode_gate"], stats["decode_gate"] = dp, ds

    if "aux_out.0.weight" in sd:
        params["aux_conv"], stats["aux_conv"] = _mss_cba(
            sd, "aux_out.0", "aux_out.1"
        )
        params["aux_head"] = _conv2d(sd, "aux_out.3")
    return {"params": params, "batch_stats": stats}
