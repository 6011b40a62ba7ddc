"""Torch-reference checkpoint -> flax parameter converters.

Enables (a) importing published WeSpeaker checkpoints and (b) the
strongest parity gate: reference torch model and our flax model produce
cosine-identical embeddings from the same weights
(tests/test_torch_parity.py exercises this against randomly initialized
reference models).

Layout rules:
  Conv1d  (out, in, k)        -> (k, in, out)
  Conv2d  (out, in, kF, kT)   -> (kT, kF, in, out)   [we use (T, F) NHWC,
                                 the reference uses (B, C, F, T) NCHW]
  Linear  (out, in)           -> kernel (in, out)
  BatchNorm -> params {scale, bias} + batch_stats {mean, var}
The frame-map flatten order differs (reference c*F+f, ours f*C+c), so
Dense layers consuming flattened (C, F) statistics get their input rows
permuted (`_stats_permutation`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = [
    "ecapa_from_torch",
    "resnet_from_torch",
    "campplus_from_torch",
    "eres2net_from_torch",
    "repvgg_from_torch",
    "xvec_from_torch",
    "gemini_from_torch",
    "samresnet_from_torch",
    "res2net_from_torch",
    "redimnet_from_torch",
    "whisper_pmfa_from_torch",
    "convert_checkpoint",
]


def _np(x):
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _conv1d(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv2d(sd, prefix):
    # torch (out, in, kF, kT) -> flax (kT, kF, in, out)
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(3, 2, 1, 0)}


def _dense(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _dense_from_conv1d(sd, prefix):
    """1x1 Conv1d used as a per-frame Dense (e.g. ASTP linears)."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0]  # (out, in)
    out = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix, affine=True):
    params = {}
    if affine:
        params = {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _stats_permutation(channels: int, freq: int) -> np.ndarray:
    """Row permutation for Dense inputs over flattened frame maps:
    ours index i = f*C + c  ->  reference index c*F + f."""
    perm = np.zeros(channels * freq, np.int64)
    for i in range(channels * freq):
        f, c = divmod(i, channels)
        perm[i] = c * freq + f
    return perm


def _xi_pool(sd, prefix="pool"):
    """XI (xi-vector Gaussian-posterior) pooling params
    (reference pooling_layers.py:313): prior mean/log-precision +
    Conv1d->BN->Conv1d precision estimator."""
    p, st = _bn(sd, f"{prefix}.lin1_relu_bn.2")
    params = {
        "prior_mean": _np(sd[f"{prefix}.prior_mean"]),
        "prior_logprec": _np(sd[f"{prefix}.prior_logprec"]),
        "lin1": _dense_from_conv1d(sd, f"{prefix}.lin1_relu_bn.0"),
        "bn1": p,
        "lin2": _dense_from_conv1d(sd, f"{prefix}.lin2"),
    }
    return params, {"bn1": st}


# --------------------------------------------------------------- ECAPA
def ecapa_from_torch(
    sd: Dict, channels: int = 512, pooling_func: str = "ASTP"
) -> Tuple[Dict, Dict]:
    """Reference ECAPA_TDNN state_dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    def conv_relu_bn(dst, src):
        put(dst + ("conv",), _conv1d(sd, src + ".conv"))
        p, s = _bn(sd, src + ".bn")
        put(dst + ("bn",), p, s)

    conv_relu_bn(("layer1",), "layer1")
    for li in (2, 3, 4):
        base = f"layer{li}.se_res2block"
        conv_relu_bn((f"layer{li}", "conv1"), base + ".0")
        # Res2: convs.i / bns.i
        scale = 8
        for i in range(scale - 1):
            put(
                (f"layer{li}", "res2", f"conv_{i}"),
                _conv1d(sd, f"{base}.1.convs.{i}"),
            )
            p, s = _bn(sd, f"{base}.1.bns.{i}")
            put((f"layer{li}", "res2", f"bn_{i}"), p, s)
        conv_relu_bn((f"layer{li}", "conv2"), base + ".2")
        put((f"layer{li}", "se", "linear1"), _dense(sd, base + ".3.linear1"))
        put((f"layer{li}", "se", "linear2"), _dense(sd, base + ".3.linear2"))

    put(("conv",), _conv1d(sd, "conv"))
    if pooling_func == "XI":
        p, st = _xi_pool(sd)
        put(("pool",), p, st)
    else:
        put(("pool", "linear1"), _dense_from_conv1d(sd, "pool.linear1"))
        put(("pool", "linear2"), _dense_from_conv1d(sd, "pool.linear2"))
    p, s = _bn(sd, "bn")
    put(("bn",), p, s)
    put(("linear",), _dense(sd, "linear"))
    if "bn2.running_mean" in sd:
        p, s = _bn(sd, "bn2", affine="bn2.weight" in sd)
        put(("bn2",), p, s)
    return params, stats


# --------------------------------------------------------------- ResNet
def resnet_from_torch(
    sd: Dict,
    num_blocks=(3, 4, 6, 3),
    block: str = "basic",
    m_channels: int = 32,
    feat_dim: int = 80,
    two_emb_layer: bool = False,
) -> Tuple[Dict, Dict]:
    """Reference ResNet state_dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    put(("conv1",), _conv2d(sd, "conv1"))
    p, s = _bn(sd, "bn1")
    put(("bn1",), p, s)

    n_convs = 2 if block == "basic" else 3
    for li, n in enumerate(num_blocks):
        for bi in range(n):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            for ci in range(1, n_convs + 1):
                put((dst, f"conv{ci}"), _conv2d(sd, f"{src}.conv{ci}"))
                p, s = _bn(sd, f"{src}.bn{ci}")
                put((dst, f"bn{ci}"), p, s)
            if f"{src}.shortcut.0.weight" in sd:
                put((dst, "shortcut_conv"), _conv2d(sd, f"{src}.shortcut.0"))
                p, s = _bn(sd, f"{src}.shortcut.1")
                put((dst, "shortcut_bn"), p, s)

    # pooled-stats Dense needs the flatten-order permutation
    expansion = 1 if block == "basic" else 4
    out_c = m_channels * 8 * expansion
    out_f = feat_dim // 8
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f
    w = _np(sd["seg_1.weight"]).T  # (2d, emb) for TSTP
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("seg_1",), {"kernel": w_ours, "bias": _np(sd["seg_1.bias"])})
    if two_emb_layer:
        p, s = _bn(sd, "seg_bn_1", affine=False)
        put(("seg_bn_1",), p, s)
        put(("seg_2",), _dense(sd, "seg_2"))
    return params, stats


# --------------------------------------------------------------- CAM++
def campplus_from_torch(
    sd: Dict, m_channels: int = 32, feat_dim: int = 80
) -> Tuple[Dict, Dict]:
    """Reference CAMPPlus state_dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    # ---- FCM head (2-D, NCHW (F,T) -> our NHWC (T,F))
    head: Dict = {}

    def put_head(path, p, s=None):
        node = head
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats.setdefault("head", {})
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    put_head(("conv1",), _conv2d(sd, "head.conv1"))
    p, s = _bn(sd, "head.bn1")
    put_head(("bn1",), p, s)
    for li in (1, 2):
        for bi in (0, 1):
            src = f"head.layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            put_head((dst, "conv1"), _conv2d(sd, src + ".conv1"))
            p, s = _bn(sd, src + ".bn1")
            put_head((dst, "bn1"), p, s)
            put_head((dst, "conv2"), _conv2d(sd, src + ".conv2"))
            p, s = _bn(sd, src + ".bn2")
            put_head((dst, "bn2"), p, s)
            if f"{src}.shortcut.0.weight" in sd:
                put_head((dst, "shortcut_conv"), _conv2d(sd, src + ".shortcut.0"))
                p, s = _bn(sd, src + ".shortcut.1")
                put_head((dst, "shortcut_bn"), p, s)
    put_head(("conv2",), _conv2d(sd, "head.conv2"))
    p, s = _bn(sd, "head.bn2")
    put_head(("bn2",), p, s)
    params["head"] = head

    # ---- tdnn conv over the flattened FCM map: permute input channels
    # (reference flatten c*F+f at campplus.py:428; ours f*C+c)
    out_f = feat_dim // 8
    perm = _stats_permutation(m_channels, out_f)
    w = _np(sd["xvector.tdnn.linear.weight"]).transpose(2, 1, 0)  # (5, CF, out)
    put(("tdnn_conv",), {"kernel": w[:, perm, :]})
    p, s = _bn(sd, "xvector.tdnn.nonlinear.batchnorm")
    put(("tdnn_bn",), p, s)

    # ---- dense CAM blocks
    for i, num_layers in enumerate((12, 24, 16)):
        for j in range(num_layers):
            src = f"xvector.block{i + 1}.tdnnd{j + 1}"
            dst = f"block{i + 1}_tdnnd{j + 1}"
            p, s = _bn(sd, src + ".nonlinear1.batchnorm")
            put((dst, "nonlinear1_bn"), p, s)
            put((dst, "linear1"), _dense_from_conv1d(sd, src + ".linear1"))
            p, s = _bn(sd, src + ".nonlinear2.batchnorm")
            put((dst, "nonlinear2_bn"), p, s)
            put((dst, "cam_layer", "linear_local"),
                _conv1d(sd, src + ".cam_layer.linear_local"))
            put((dst, "cam_layer", "linear1"),
                _dense_from_conv1d(sd, src + ".cam_layer.linear1"))
            put((dst, "cam_layer", "linear2"),
                _dense_from_conv1d(sd, src + ".cam_layer.linear2"))
        src = f"xvector.transit{i + 1}"
        p, s = _bn(sd, src + ".nonlinear.batchnorm")
        put((f"transit{i + 1}_bn",), p, s)
        put((f"transit{i + 1}_linear",),
            _dense_from_conv1d(sd, src + ".linear"))

    p, s = _bn(sd, "xvector.out_nonlinear.batchnorm")
    put(("out_bn",), p, s)
    put(("dense_linear",), _dense_from_conv1d(sd, "xvector.dense.linear"))
    p, s = _bn(sd, "xvector.dense.nonlinear.batchnorm", affine=False)
    put(("dense_bn",), p, s)
    return params, stats


# ------------------------------------------------------------- ERes2Net
def eres2net_from_torch(
    sd: Dict,
    m_channels: int = 32,
    num_blocks=(3, 4, 6, 3),
    scale: int = 2,
    expansion: int = 2,
    feat_dim: int = 80,
) -> Tuple[Dict, Dict]:
    """Reference ERes2Net state_dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    def bn(dst, src, affine=True):
        p, s = _bn(sd, src, affine)
        put(dst, p, s)

    def aff(dst, src):
        put(dst + ("att_conv1",), _conv2d(sd, src + ".local_att.0") | (
            {"bias": _np(sd[src + ".local_att.0.bias"])}
            if src + ".local_att.0.bias" in sd else {}))
        bn(dst + ("att_bn1",), src + ".local_att.1")
        put(dst + ("att_conv2",), _conv2d(sd, src + ".local_att.3") | (
            {"bias": _np(sd[src + ".local_att.3.bias"])}
            if src + ".local_att.3.bias" in sd else {}))
        bn(dst + ("att_bn2",), src + ".local_att.4")

    put(("conv1",), _conv2d(sd, "conv1"))
    bn(("bn1",), "bn1")

    for li, n in enumerate(num_blocks):
        diff = li >= 2  # layers 3/4 use diff_AFF blocks
        for bi in range(n):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            put((dst, "conv1"), _conv2d(sd, src + ".conv1"))
            bn((dst, "bn1"), src + ".bn1")
            if diff:
                put((dst, "conv2_1"), _conv2d(sd, src + ".conv2_1"))
                bn((dst, "bn2_1"), src + ".bn2_1")
                for k in range(scale - 1):
                    put((dst, f"convs_{k}"), _conv2d(sd, f"{src}.convs.{k}"))
                    bn((dst, f"bns_{k}"), f"{src}.bns.{k}")
                    aff((dst, f"fuse_{k}"), f"{src}.fuse_models.{k}")
            else:
                for k in range(scale):
                    put((dst, f"convs_{k}"), _conv2d(sd, f"{src}.convs.{k}"))
                    bn((dst, f"bns_{k}"), f"{src}.bns.{k}")
            put((dst, "conv3"), _conv2d(sd, src + ".conv3"))
            bn((dst, "bn3"), src + ".bn3")
            if f"{src}.shortcut.0.weight" in sd:
                put((dst, "shortcut_conv"), _conv2d(sd, f"{src}.shortcut.0"))
                bn((dst, "shortcut_bn"), f"{src}.shortcut.1")

    for i in (1, 2, 3):
        put((f"layer{i}_downsample",), _conv2d(sd, f"layer{i}_downsample"))
    aff(("fuse_mode12",), "fuse_mode12")
    aff(("fuse_mode123",), "fuse_mode123")
    aff(("fuse_mode1234",), "fuse_mode1234")

    out_c = m_channels * 8 * expansion
    out_f = feat_dim // 8
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f
    w = _np(sd["seg_1.weight"]).T
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("seg_1",), {"kernel": w_ours, "bias": _np(sd["seg_1.bias"])})
    return params, stats


# --------------------------------------------------------------- RepVGG
def repvgg_from_torch(
    sd: Dict,
    num_blocks=(3, 4, 23, 3),
    width_multiplier=(0.5, 0.5, 0.5, 0.5),
    block: str = "RepVGG",
    base_width: int = 64,
    feat_dim: int = 80,
) -> Tuple[Dict, Dict]:
    """Reference RepVGG state_dict -> (params, batch_stats).

    Handles both training-form checkpoints (rbr_dense/rbr_1x1/
    rbr_dense_dilation/rbr_identity branches, reference repvgg.py:105,289)
    and deploy-form ones produced by repvgg_model_convert (:590 —
    rbr_reparam only).  Branch mapping: rbr_dense->dense_conv/dense_bn,
    rbr_1x1->one_conv/one_bn, rbr_dense_dilation->dil_conv/dil_bn,
    rbr_identity->id_bn, se.fc_1/fc_2->se/fc1,fc2."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    def convert_block(dst, src):
        blk: Dict = {}
        if f"{src}.rbr_reparam.weight" in sd:
            blk["reparam"] = {
                "kernel": _np(sd[f"{src}.rbr_reparam.weight"]).transpose(
                    3, 2, 1, 0
                ),
                "bias": _np(sd[f"{src}.rbr_reparam.bias"]),
            }
        else:
            blk["dense_conv"] = _conv2d(sd, f"{src}.rbr_dense.conv")
            p, s = _bn(sd, f"{src}.rbr_dense.bn")
            blk["dense_bn"] = p
            stats_blk = {"dense_bn": s}
            if f"{src}.rbr_1x1.conv.weight" in sd:
                blk["one_conv"] = _conv2d(sd, f"{src}.rbr_1x1.conv")
                p, s = _bn(sd, f"{src}.rbr_1x1.bn")
                blk["one_bn"] = p
                stats_blk["one_bn"] = s
            if f"{src}.rbr_dense_dilation.conv.weight" in sd:
                blk["dil_conv"] = _conv2d(sd, f"{src}.rbr_dense_dilation.conv")
                p, s = _bn(sd, f"{src}.rbr_dense_dilation.bn")
                blk["dil_bn"] = p
                stats_blk["dil_bn"] = s
            if f"{src}.rbr_identity.weight" in sd:
                p, s = _bn(sd, f"{src}.rbr_identity")
                blk["id_bn"] = p
                stats_blk["id_bn"] = s
            stats[dst] = stats_blk
        if f"{src}.se.fc_1.weight" in sd:
            blk["se"] = {
                "fc1": _dense(sd, f"{src}.se.fc_1"),
                "fc2": _dense(sd, f"{src}.se.fc_2"),
            }
        params[dst] = blk

    convert_block("stage0", "stage0")
    for si, n in enumerate(num_blocks):
        for bi in range(n):
            convert_block(f"stage{si + 1}_{bi}", f"stage{si + 1}.{bi}")

    wm = [w * (base_width / 64.0) for w in width_multiplier]
    out_c = int(512 * wm[3])
    out_f = feat_dim // 8
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f
    w = _np(sd["seg.weight"]).T  # (2d, emb) for TSTP
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("seg",), {"kernel": w_ours, "bias": _np(sd["seg.bias"])})
    return params, stats


# ----------------------------------------------------------------- XVEC
def xvec_from_torch(sd: Dict, pooling_func: str = "TSTP") -> Tuple[Dict, Dict]:
    """Reference XVEC (tdnn.py:57) state_dict -> (params, batch_stats).
    1-D TDNN layers keep channel order, so no flatten permutation."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(1, 6):
        name = f"frame_{i}"
        _, s = _bn(sd, f"{name}.bn", affine=False)
        params[name] = {"conv_1d": _conv1d(sd, f"{name}.conv_1d")}
        stats[name] = {"bn": s}
    if pooling_func == "XI":
        p, st = _xi_pool(sd)
        params["pool"] = p
        stats["pool"] = st
    params["seg_1"] = _dense(sd, "seg_1")
    _, s = _bn(sd, "seg_bn_1", affine=False)
    stats["seg_bn_1"] = s
    params["seg_2"] = _dense(sd, "seg_2")
    return params, stats


# -------------------------------------------------------- Gemini DF-ResNet
def gemini_from_torch(
    sd: Dict,
    depths=(3, 3, 9, 3),
    dims=(32, 32, 64, 128, 256),
    feat_dim: int = 80,
    two_emb_layer: bool = False,
) -> Tuple[Dict, Dict]:
    """Reference Gemini_DF_ResNet (gemini_dfresnet.py:51) state_dict ->
    (params, batch_stats).  Frequency strides /16, time /2."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    put(("stem_conv",), _conv2d(sd, "downsample_layers.0.0"))
    p, s = _bn(sd, "downsample_layers.0.1")
    put(("stem_bn",), p, s)
    for i in range(4):
        put((f"down{i + 1}_conv",), _conv2d(sd, f"downsample_layers.{i + 1}.0"))
        p, s = _bn(sd, f"downsample_layers.{i + 1}.1")
        put((f"down{i + 1}_bn",), p, s)
        for j in range(depths[i]):
            src = f"stages.{i}.{j}"
            dst = f"stage{i + 1}_{j}"
            for ci in (1, 2, 3):
                put((dst, f"conv{ci}"), _conv2d(sd, f"{src}.conv{ci}"))
                p, s = _bn(sd, f"{src}.bn{ci}")
                put((dst, f"bn{ci}"), p, s)

    out_c = dims[-1]
    out_f = feat_dim // 16
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f
    w = _np(sd["seg_1.weight"]).T
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("seg_1",), {"kernel": w_ours, "bias": _np(sd["seg_1.bias"])})
    if two_emb_layer:
        _, s = _bn(sd, "seg_bn_1", affine=False)
        stats["seg_bn_1"] = s
        put(("seg_2",), _dense(sd, "seg_2"))
    return params, stats


# ---------------------------------------------------------- SimAM ResNet
def samresnet_from_torch(
    sd: Dict,
    num_blocks=(3, 4, 6, 3),
    in_planes: int = 64,
    feat_dim: int = 80,
) -> Tuple[Dict, Dict]:
    """Reference SimAM_ResNet*_ASP (samresnet.py:134,152) state_dict ->
    (params, batch_stats).  The ASP attention convs and the bottleneck
    Dense all consume flattened (C, F) maps, so each gets the flatten-
    order permutation on the corresponding rows/columns."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    put(("conv1",), _conv2d(sd, "front.conv1"))
    p, s = _bn(sd, "front.bn1")
    put(("bn1",), p, s)
    for li, n in enumerate(num_blocks):
        for bi in range(n):
            src = f"front.layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            for ci in (1, 2):
                put((dst, f"conv{ci}"), _conv2d(sd, f"{src}.conv{ci}"))
                p, s = _bn(sd, f"{src}.bn{ci}")
                put((dst, f"bn{ci}"), p, s)
            if f"{src}.downsample.0.weight" in sd:
                put((dst, "downsample_conv"), _conv2d(sd, f"{src}.downsample.0"))
                p, s = _bn(sd, f"{src}.downsample.1")
                put((dst, "downsample_bn"), p, s)

    out_c = in_planes * 8
    out_f = feat_dim // 8
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f

    # ASP attention: Conv1d(CF->128) -> ReLU -> BN -> Conv1d(128->CF)
    w1 = _np(sd["pooling.attention.0.weight"])[:, :, 0].T  # (CF, 128)
    put(
        ("pooling", "att1"),
        {"kernel": w1[perm], "bias": _np(sd["pooling.attention.0.bias"])},
    )
    p, s = _bn(sd, "pooling.attention.2")
    put(("pooling", "att_bn"), p, s)
    w2 = _np(sd["pooling.attention.3.weight"])[:, :, 0].T  # (128, CF)
    put(
        ("pooling", "att2"),
        {
            "kernel": w2[:, perm],
            "bias": _np(sd["pooling.attention.3.bias"])[perm],
        },
    )

    w = _np(sd["bottleneck.weight"]).T  # (2d, emb)
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("bottleneck",), {"kernel": w_ours, "bias": _np(sd["bottleneck.bias"])})
    return params, stats


# ---------------------------------------------------------------- Res2Net
def res2net_from_torch(
    sd: Dict,
    num_blocks=(3, 4, 6, 3),
    m_channels: int = 32,
    feat_dim: int = 80,
    scale: int = 2,
    two_emb_layer: bool = False,
) -> Tuple[Dict, Dict]:
    """Reference Res2Net (res2net.py:96) state_dict -> (params,
    batch_stats).  Blocks expand x2; the multi-scale 3x3 convs map
    convs.{i}/bns.{i} -> convs_{i}/bns_{i}."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    put(("conv1",), _conv2d(sd, "conv1"))
    p, s = _bn(sd, "bn1")
    put(("bn1",), p, s)
    for li, n in enumerate(num_blocks):
        for bi in range(n):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            for ci in (1, 3):
                put((dst, f"conv{ci}"), _conv2d(sd, f"{src}.conv{ci}"))
                p, s = _bn(sd, f"{src}.bn{ci}")
                put((dst, f"bn{ci}"), p, s)
            for i in range(scale - 1):
                put((dst, f"convs_{i}"), _conv2d(sd, f"{src}.convs.{i}"))
                p, s = _bn(sd, f"{src}.bns.{i}")
                put((dst, f"bns_{i}"), p, s)
            if f"{src}.shortcut.0.weight" in sd:
                put((dst, "shortcut_conv"), _conv2d(sd, f"{src}.shortcut.0"))
                p, s = _bn(sd, f"{src}.shortcut.1")
                put((dst, "shortcut_bn"), p, s)

    out_c = m_channels * 8 * 2  # block expansion 2
    out_f = feat_dim // 8
    perm = _stats_permutation(out_c, out_f)
    d = out_c * out_f
    w = _np(sd["seg_1.weight"]).T
    w_ours = np.concatenate([w[perm], w[d + perm]], axis=0)
    put(("seg_1",), {"kernel": w_ours, "bias": _np(sd["seg_1.bias"])})
    if two_emb_layer:
        _, s = _bn(sd, "seg_bn_1", affine=False)
        stats["seg_bn_1"] = s
        put(("seg_2",), _dense(sd, "seg_2"))
    return params, stats


# --------------------------------------------------------------- ReDimNet
def _ln(sd, prefix):
    """Custom channels-first LayerNorm (reference redimnet.py:63) ->
    flax LayerNorm {scale, bias}."""
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def redimnet_from_torch(
    sd: Dict,
    stages_setup,
    C: int = 16,
    feat_dim: int = 72,
    block_2d_type: str = "basic_resnet",
    block_1d_type: str = "conv+att",
    out_channels=None,
    two_emb_layer: bool = False,
) -> Tuple[Dict, Dict]:
    """Reference ReDimNet (redimnet.py:792 + ReDimNetBone:622) state_dict
    -> (params, batch_stats).

    Both sides share the to1d flatten order f*C + c (reference :758-765
    permutes (B,C,F,T)->(B,F,C,T) before reshape; ours reshapes
    (B,T,F,C)), so no row permutations are needed anywhere — the
    1-D convs, attention and ASTP pool convert verbatim."""
    params: Dict = {}
    stats: Dict = {}

    def put(path, p, s=None):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = p
        if s is not None:
            node = stats
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = s

    def conv2d_block(dst, src, use_fwse):
        """ConvBlock2d -> our stage block (reference :167-203)."""
        base = f"{src}.conv_block"
        blk_p: Dict = {}
        blk_s: Dict = {}
        if block_2d_type == "convnext_like":
            i = 0
            while f"{base}.dwconvs.{i}.weight" in sd:
                blk_p[f"dwconv_{i}"] = _conv2d(sd, f"{base}.dwconvs.{i}")
                blk_p[f"dwconv_{i}"]["bias"] = _np(
                    sd[f"{base}.dwconvs.{i}.bias"]
                )
                i += 1
            p, s = _bn(sd, f"{base}.norm")
            blk_p["norm"] = p
            blk_s["norm"] = s
            blk_p["pwconv1"] = _conv2d(sd, f"{base}.pwconv1")
            blk_p["pwconv1"]["bias"] = _np(sd[f"{base}.pwconv1.bias"])
        else:
            for ci in (1, 2):
                blk_p[f"conv{ci}"] = _conv2d(sd, f"{base}.conv{ci}")
                if f"{base}.conv{ci}pw.weight" in sd:
                    blk_p[f"conv{ci}pw"] = _conv2d(sd, f"{base}.conv{ci}pw")
                    blk_p[f"conv{ci}pw"]["bias"] = _np(
                        sd[f"{base}.conv{ci}pw.bias"]
                    )
                p, s = _bn(sd, f"{base}.bn{ci}")
                blk_p[f"bn{ci}"] = p
                blk_s[f"bn{ci}"] = s
            if use_fwse and f"{base}.se.squeeze.weight" in sd:
                blk_p["se"] = {
                    "squeeze": _dense(sd, f"{base}.se.squeeze"),
                    "exitation": _dense(sd, f"{base}.se.exitation"),
                }
            if f"{base}.downsample.0.weight" in sd:
                blk_p["ds_conv"] = {
                    "kernel": _np(sd[f"{base}.downsample.0.weight"]).transpose(
                        3, 2, 1, 0
                    )
                }
                p, s = _bn(sd, f"{base}.downsample.1")
                blk_p["ds_bn"] = p
                blk_s["ds_bn"] = s
        return blk_p, blk_s

    def convnext1d(src):
        blk_p: Dict = {}
        blk_s: Dict = {}
        blk_p["dwconv_0"] = _conv1d(sd, f"{src}.dwconvs.0")
        p, s = _bn(sd, f"{src}.norm")
        blk_p["norm"] = p
        blk_s["norm"] = s
        blk_p["pwconv1"] = _conv1d(sd, f"{src}.pwconv1")
        return blk_p, blk_s

    def transformer_layer(src):
        blk_p = {
            "attention": {
                name: _dense(sd, f"{src}.attention.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm": _ln(sd, f"{src}.layer_norm"),
            "intermediate_dense": _dense(
                sd, f"{src}.feed_forward.intermediate_dense"
            ),
            "output_dense": _dense(sd, f"{src}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{src}.final_layer_norm"),
        }
        return blk_p

    # stem
    stem = _conv2d(sd, "backbone.stem.0")
    stem["bias"] = _np(sd["backbone.stem.0.bias"])
    put(("stem_conv",), stem)
    put(("stem_norm",), _ln(sd, "backbone.stem.1"))

    n_stages = len(stages_setup)
    # input mix weights: reference (1, n+1, CF, 1) -> ours (n+1, CF);
    # index 0 is the fixed all-ones stage-0 weight (skipped)
    for si in range(1, n_stages):
        w = _np(sd[f"backbone.inputs_weights.{si}"])[0, :, :, 0]
        put((f"inputs_weights_{si}",), w)
    w = _np(sd[f"backbone.inputs_weights.{n_stages}"])[0, :, :, 0]
    put(("inputs_weights_final",), w)

    for si, (stride, num_blocks, conv_exp, _ks, att_red) in enumerate(
        stages_setup
    ):
        base = f"backbone.stage{si}"
        down = {"kernel": _np(sd[f"{base}.0.weight"]).transpose(3, 2, 1, 0),
                "bias": _np(sd[f"{base}.0.bias"])}
        put((f"stage{si}_down",), down)
        for bi in range(num_blocks):
            p, s = conv2d_block(
                f"stage{si}_block{bi}", f"{base}.{bi + 1}",
                block_2d_type == "basic_resnet_fwse",
            )
            params[f"stage{si}_block{bi}"] = p
            if s:
                stats[f"stage{si}_block{bi}"] = s
        idx = num_blocks + 1
        if conv_exp != 1:
            sq = {"kernel": _np(sd[f"{base}.{idx}.0.weight"]).transpose(
                      3, 2, 1, 0),
                  "bias": _np(sd[f"{base}.{idx}.0.bias"])}
            put((f"stage{si}_squeeze_conv",), sq)
            p, s = _bn(sd, f"{base}.{idx}.1")
            put((f"stage{si}_squeeze_bn",), p, s)
            pw = {"kernel": _np(sd[f"{base}.{idx}.3.weight"]).transpose(
                      3, 2, 1, 0),
                  "bias": _np(sd[f"{base}.{idx}.3.bias"])}
            put((f"stage{si}_squeeze_pw",), pw)
            idx += 1
        idx += 1  # to1d (parameterless)
        if att_red is not None:
            src = f"{base}.{idx}"
            tcb_p: Dict = {
                "red_conv": _conv1d(sd, f"{src}.red_dim_conv.0"),
                "red_norm": _ln(sd, f"{src}.red_dim_conv.1"),
                "exp_conv": _conv1d(sd, f"{src}.exp_dim_conv"),
            }
            tcb_s: Dict = {}
            if block_1d_type == "conv+att":
                for i in range(4):
                    p, s = convnext1d(f"{src}.tcm.{i}")
                    tcb_p[f"convnext_{i}"] = p
                    tcb_s[f"convnext_{i}"] = s
                tcb_p["att"] = transformer_layer(f"{src}.tcm.4")
            elif block_1d_type == "att":
                pe = _conv1d(sd, f"{src}.tcm.0.conv")
                tcb_p["pos_enc"] = {
                    "conv": pe,
                    "norm": _ln(sd, f"{src}.tcm.0.norm"),
                }
                tcb_p["att"] = transformer_layer(f"{src}.tcm.1")
            params[f"stage{si}_tcb"] = tcb_p
            if tcb_s:
                stats[f"stage{si}_tcb"] = tcb_s

    if out_channels is not None:
        put(("mfa_conv",), _conv1d(sd, "backbone.mfa.0"))
        p, s = _bn(sd, "backbone.mfa.1")
        put(("mfa_bn",), p, s)

    put(("pool", "linear1"), _dense_from_conv1d(sd, "pool.linear1"))
    put(("pool", "linear2"), _dense_from_conv1d(sd, "pool.linear2"))
    put(("seg_1",), _dense(sd, "seg_1"))
    if two_emb_layer:
        _, s = _bn(sd, "seg_bn_1", affine=False)
        stats["seg_bn_1"] = s
        put(("seg_2",), _dense(sd, "seg_2"))
    return params, stats


# ------------------------------------------------------------ WhisperPMFA
def whisper_pmfa_from_torch(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference whisper_PMFA head (whisper_PMFA.py:112) state_dict ->
    (params, batch_stats): ASTP pool + BN over pooled stats + fc.
    The whisper encoder itself converts via
    frontend.convert_whisper_state_dict."""
    params: Dict = {}
    stats: Dict = {}
    params["pooling"] = {
        "linear1": _dense_from_conv1d(sd, "pooling.linear1"),
        "linear2": _dense_from_conv1d(sd, "pooling.linear2"),
    }
    p, s = _bn(sd, "bn.norm")
    params["bn"] = p
    stats["bn"] = s
    params["fc"] = _dense(sd, "fc")
    return params, stats


# ------------------------------------------------- name -> converter registry
_REPVGG_CFG = {
    # name: (num_blocks, width_multiplier, block)
    "REPVGG_TINY_A0": ((3, 4, 23, 3), (0.5, 0.5, 0.5, 0.5), "RepVGG"),
    "REPVGG_TINY_RSBB_A0": ((3, 4, 23, 3), (0.5, 0.5, 0.5, 0.5), "RepSPK"),
    "REPVGG_A0": ((2, 4, 14, 1), (0.75, 0.75, 0.75, 2.5), "RepVGG"),
    "REPVGG_RSBB_A0": ((2, 4, 14, 1), (0.75, 0.75, 0.75, 2.5), "RepSPK"),
    "REPVGG_A1": ((2, 4, 14, 1), (1, 1, 1, 2.5), "RepVGG"),
    "REPVGG_A2": ((2, 4, 14, 1), (1.5, 1.5, 1.5, 2.75), "RepVGG"),
    "REPVGG_RSBB_A2": ((2, 4, 14, 1), (1.5, 1.5, 1.5, 2.75), "RepSPK"),
    "REPVGG_B0": ((4, 6, 16, 1), (1, 1, 1, 2.5), "RepVGG"),
    "REPVGG_RSBB_B0": ((4, 6, 16, 1), (1, 1, 1, 2.5), "RepSPK"),
    "REPVGG_B1": ((4, 6, 16, 1), (2, 2, 2, 4), "RepVGG"),
    "REPVGG_B1g2": ((4, 6, 16, 1), (2, 2, 2, 4), "RepVGG"),
    "REPVGG_B1g4": ((4, 6, 16, 1), (2, 2, 2, 4), "RepVGG"),
    "REPVGG_B2": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5), "RepVGG"),
    "REPVGG_B2g2": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5), "RepVGG"),
    "REPVGG_B2g4": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5), "RepVGG"),
    "REPVGG_B3": ((4, 6, 16, 1), (3, 3, 3, 5), "RepVGG"),
    "REPVGG_B3g2": ((4, 6, 16, 1), (3, 3, 3, 5), "RepVGG"),
    "REPVGG_B3g4": ((4, 6, 16, 1), (3, 3, 3, 5), "RepVGG"),
    "REPVGG_D2SE": ((8, 14, 24, 1), (2.5, 2.5, 2.5, 5), "RepVGG"),
}

_RESNET_CFG = {
    "ResNet18": ((2, 2, 2, 2), "basic"),
    "ResNet34": ((3, 4, 6, 3), "basic"),
    "ResNet50": ((3, 4, 6, 3), "bottleneck"),
    "ResNet101": ((3, 4, 23, 3), "bottleneck"),
    "ResNet152": ((3, 8, 36, 3), "bottleneck"),
    "ResNet221": ((6, 16, 48, 3), "bottleneck"),
    "ResNet293": ((10, 20, 64, 3), "bottleneck"),
}

_REDIMNET_CFG = {
    # name: (C, feat_dim, block_2d_type, stages_setup)
    "ReDimNetB0": (10, 60, "basic_resnet",
                   ((1, 2, 1, ((3, 3),), 30), (2, 3, 2, ((3, 3),), 30),
                    (1, 3, 3, ((3, 3),), 30), (2, 4, 2, ((3, 3),), 10),
                    (1, 3, 1, ((3, 3),), 10))),
    "ReDimNetB1": (12, 72, "convnext_like",
                   ((1, 2, 1, ((3, 3),), None), (2, 3, 1, ((3, 3),), None),
                    (3, 4, 1, ((3, 3),), 12), (2, 5, 1, ((3, 3),), 12),
                    (2, 3, 1, ((3, 3),), 8))),
    "ReDimNetB2": (16, 72, "convnext_like",
                   ((1, 2, 1, ((3, 3),), 12), (2, 2, 1, ((3, 3),), 12),
                    (1, 3, 1, ((3, 3),), 12), (2, 4, 1, ((3, 3),), 8),
                    (1, 4, 1, ((3, 3),), 8), (2, 4, 1, ((3, 3),), 4))),
    "ReDimNetB3": (16, 72, "basic_resnet_fwse",
                   ((1, 6, 4, ((3, 3),), 32), (2, 6, 2, ((3, 3),), 32),
                    (1, 8, 2, ((3, 3),), 32), (2, 10, 2, ((3, 3),), 16),
                    (1, 10, 1, ((3, 3),), 16), (2, 8, 1, ((3, 3),), 16))),
    "ReDimNetB4": (32, 72, "basic_resnet_fwse",
                   ((1, 4, 2, ((3, 3),), 48), (2, 4, 2, ((3, 3),), 48),
                    (1, 6, 2, ((3, 3),), 48), (2, 6, 1, ((3, 3),), 32),
                    (1, 8, 1, ((3, 3),), 24), (2, 4, 1, ((3, 3),), 16))),
    "ReDimNetB5": (32, 72, "basic_resnet_fwse",
                   ((1, 4, 2, ((3, 3),), 48), (2, 4, 2, ((3, 3),), 48),
                    (1, 6, 2, ((3, 3),), 48), (2, 6, 1, ((3, 3),), 32),
                    (1, 8, 1, ((3, 3),), 24), (2, 4, 1, ((3, 3),), 16))),
    "ReDimNetB6": (32, 72, "basic_resnet",
                   ((1, 4, 4, ((3, 3),), 32), (2, 6, 2, ((3, 3),), 32),
                    (1, 6, 2, ((3, 3),), 24), (3, 8, 1, ((3, 3),), 24),
                    (1, 8, 1, ((3, 3),), 16), (2, 8, 1, ((3, 3),), 16))),
}


def convert_checkpoint(model: str, sd: Dict, **model_args) -> Tuple[Dict, Dict]:
    """Dispatch a reference state_dict to the right converter by model
    name (the same names as models/registry.py / reference
    speaker_model.py).  model_args mirror the training-config
    model_args (feat_dim, two_emb_layer, ...)."""
    feat_dim = int(model_args.get("feat_dim", 80))
    two_emb = bool(model_args.get("two_emb_layer", False))

    if model.startswith("XI_VEC_"):
        if model == "XI_VEC_XVEC":
            return xvec_from_torch(sd, pooling_func="XI")
        channels = 1024 if "1024" in model else 512
        return ecapa_from_torch(sd, channels=channels, pooling_func="XI")
    if model.startswith("ECAPA_TDNN"):
        channels = 1024 if "c1024" in model else 512
        return ecapa_from_torch(sd, channels=channels)
    if model in _RESNET_CFG:
        nb, blk = _RESNET_CFG[model]
        return resnet_from_torch(
            sd, num_blocks=nb, block=blk, feat_dim=feat_dim,
            two_emb_layer=two_emb,
        )
    if model == "CAMPPlus":
        return campplus_from_torch(sd, feat_dim=feat_dim)
    if model.startswith("ERes2Net"):
        m = 64 if ("Large" in model or "aug" in model) else 32
        kw = {}
        if "aug" in model:
            kw = dict(scale=int(model_args.get("scale", 3)),
                      expansion=int(model_args.get("expansion", 4)))
        return eres2net_from_torch(sd, m_channels=m, feat_dim=feat_dim, **kw)
    if model.startswith("Res2Net"):
        m = 64 if "Large" in model else 32
        return res2net_from_torch(
            sd, m_channels=m, feat_dim=feat_dim, two_emb_layer=two_emb
        )
    if model in _REPVGG_CFG:
        nb, wm, blk = _REPVGG_CFG[model]
        return repvgg_from_torch(
            sd, num_blocks=nb, width_multiplier=wm, block=blk,
            feat_dim=feat_dim,
        )
    if model == "XVEC" or model.startswith("TDNN"):
        return xvec_from_torch(sd)
    if model.startswith("Gemini_DF_ResNet"):
        depth_map = {"60": (3, 3, 9, 3), "114": (3, 3, 27, 3),
                     "183": (3, 8, 45, 3), "237": (3, 8, 63, 3)}
        depths = depth_map[model.rsplit("ResNet", 1)[1]]
        return gemini_from_torch(
            sd, depths=depths, feat_dim=feat_dim, two_emb_layer=two_emb
        )
    if model.startswith("SimAM_ResNet"):
        nb = (6, 16, 24, 3) if "100" in model else (3, 4, 6, 3)
        return samresnet_from_torch(
            sd, num_blocks=nb,
            in_planes=int(model_args.get("in_planes", 64)),
            feat_dim=feat_dim,
        )
    if model in _REDIMNET_CFG:
        C, F, b2, setup = _REDIMNET_CFG[model]
        return redimnet_from_torch(
            sd, setup, C=C, feat_dim=int(model_args.get("feat_dim", F)),
            block_2d_type=b2, two_emb_layer=two_emb,
        )
    if model.startswith("whisper_PMFA"):
        return whisper_pmfa_from_torch(sd)
    raise ValueError(f"no torch converter registered for model {model!r}")
