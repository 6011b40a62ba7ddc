"""ReDimNet: dimension-reshaping backbone alternating 2-D conv stages and
1-D time-context blocks with stage-output reweighting.

Parity with reference wespeaker/models/redimnet.py (LayerNorm:63,
PosEncConv:118, ConvNeXtLikeBlock:134, MultiHeadAttention:206,
TransformerEncoderLayer:276, BasicBlock:356, fwSEBlock:434,
ResBasicBlock:461, TimeContextBlock1d:540, ReDimNetBone:622, ReDimNet:792,
factories B0-B6 :874-1078).

Layout: the invariant C*F == const is carried as channels-last —
2-D stages on (B, T, F, C); the 1-D composite axis is (B, T, F*C) with
index f*C + c, which matches the reference's permute-reshape ordering
(to1d at :757: (b,c,f,t)->(b,f,c,t)->(b,f*c,t)) so torch weights map
directly.  Stage inputs are per-(source, channel) softmax-weighted sums
of every previous stage's 1-D output (inputs_weights :661-670).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norm import BatchNorm, LayerNorm
from .safe_conv import SafeConv
from .pooling import POOLING_LAYERS

__all__ = [
    "ReDimNet",
    "ReDimNetB0", "ReDimNetB1", "ReDimNetB2", "ReDimNetB3",
    "ReDimNetB4", "ReDimNetB5", "ReDimNetB6",
]


def _gelu(x, impl: str):
    """erf = torch nn.GELU() exact (parity default).  'tanh' swaps in the
    tanh approximation: on TPU the erf polynomial has no bf16 path, so a
    bf16 graph materializes f32 copies of every stage tensor around each
    GELU (round-4 HLO: f32[B,T,F,C] copy pairs per block) — the same
    VPU-prologue cost adjudicated for the SSL encoder
    (frontend/ssl_encoder.py gelu_impl; embedding cosine erf-vs-tanh
    measured at/below the bf16 rounding floor)."""
    return nn.gelu(x, approximate=(impl == "tanh"))


def _mix_outputs(w: jax.Array, outputs_1d: Sequence[jax.Array]) -> jax.Array:
    """Per-(source, channel) softmax-weighted sum of the stage outputs
    (reference inputs_weights :661-670), as an UNROLLED f32-accumulated
    sum rather than stack+einsum: jnp.stack materializes an (n,B,T,CF)
    copy that the reduce then re-reads — on a (64,998,1152) stream that
    was ~2x the mix's minimum HBM traffic (round-4 trace).  The unrolled
    form fuses into one loop fusion reading the n stage outputs in
    place; accumulation stays f32 in-fusion and the result returns to
    the stream dtype so a bf16 graph stays bf16 (cf. sslfrontend.py)."""
    wn = jax.nn.softmax(w.astype(jnp.float32), axis=0)  # (n, CF)
    acc = outputs_1d[0].astype(jnp.float32) * wn[0]
    for i in range(1, len(outputs_1d)):
        acc = acc + outputs_1d[i].astype(jnp.float32) * wn[i]
    return acc.astype(outputs_1d[0].dtype)


def _groups(c: int, gd: Optional[int]) -> int:
    if gd is None:
        return 1
    g = max(c // gd, 1)
    while c % g:
        g -= 1
    return g


class ConvNeXtLikeBlock(nn.Module):
    """depthwise-ish conv(s) -> BN -> GELU -> 1x1, residual
    (reference :134).  dim=2 operates on (B,T,F,C); dim=1 on (B,T,C)."""

    C: int
    dim: int = 2
    kernel_sizes: Tuple = ((3, 3),)
    group_divisor: Optional[int] = 1
    gelu_impl: str = "erf"

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, ks in enumerate(self.kernel_sizes):
            ks_t = (ks,) if isinstance(ks, int) else tuple(ks)
            outs.append(
                SafeConv(
                    self.C,
                    ks_t,
                    padding="SAME",
                    feature_group_count=_groups(self.C, self.group_divisor),
                    name=f"dwconv_{i}",
                )(x)
            )
        h = jnp.concatenate(outs, axis=-1)
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="norm",
        )(h)
        h = _gelu(h, self.gelu_impl)
        h = nn.Conv(self.C, (1,) * self.dim, name="pwconv1")(h)
        return x + h


class fwSEBlock(nn.Module):
    """Frequency-wise SE (reference :434): squeeze over (T, C)."""

    num_freq: int
    num_feats: int = 64

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C)
        s = jnp.mean(x, axis=(1, 3))  # (B, F)
        s = nn.relu(nn.Dense(self.num_feats, name="squeeze")(s))
        s = jax.nn.sigmoid(nn.Dense(self.num_freq, name="exitation")(s))
        return x * s[:, None, :, None]


class ResBasicBlock(nn.Module):
    """Grouped conv + pointwise residual block; conv -> pw -> ReLU -> BN
    ordering (reference :461-537).  use_fwse adds frequency-wise SE."""

    planes: int
    num_freq: int
    group_divisor: Optional[int] = 4
    use_fwse: bool = False
    se_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]

        def bn(name):
            return BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )

        if self.group_divisor is not None:
            h = SafeConv(
                in_planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                feature_group_count=_groups(in_planes, self.group_divisor),
                name="conv1",
            )(x)
            h = nn.Conv(self.planes, (1, 1), name="conv1pw")(h)
        else:
            h = nn.Conv(
                self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name="conv1",
            )(x)
        h = bn("bn1")(nn.relu(h))

        if self.group_divisor is not None:
            h = SafeConv(
                self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                feature_group_count=_groups(self.planes, self.group_divisor),
                name="conv2",
            )(h)
            h = nn.Conv(self.planes, (1, 1), name="conv2pw")(h)
        else:
            h = nn.Conv(
                self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name="conv2",
            )(h)
        h = bn("bn2")(h)
        if self.use_fwse:
            h = fwSEBlock(self.num_freq, self.se_channels, name="se")(h)

        if self.planes != in_planes:
            sc = nn.Conv(self.planes, (1, 1), use_bias=False, name="ds_conv")(x)
            sc = bn("ds_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class _Attention(nn.Module):
    """Plain MHA (reference :206)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        q = nn.Dense(d, name="q_proj")(x).reshape(b, t, self.heads, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, t, self.heads, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, t, self.heads, hd)
        # Scores stored in the compute dtype (MXU accumulates f32 either
        # way; halves the T^2 HBM traffic), softmax upcast to f32
        # in-fusion, probs back to the compute dtype — same dtype policy
        # as frontend/ssl_encoder.py.  A round-4 trace showed the old
        # preferred_element_type=f32 outputs re-promoting the whole
        # residual stream (and every downstream stage) to f32.
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        return nn.Dense(d, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN block with tanh-approx GELU FFN (reference :276-353)."""

    n_state: int
    n_mlp: int
    n_head: int = 4

    @nn.compact
    def __call__(self, x):
        x = x + _Attention(self.n_state, self.n_head, name="attention")(x)
        x = LayerNorm(epsilon=1e-6, name="layer_norm")(x)
        h = nn.Dense(self.n_mlp, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=True)  # NewGELUActivation
        h = nn.Dense(self.n_state, name="output_dense")(h)
        x = x + h
        return LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)


class PosEncConv(nn.Module):
    """Depthwise conv positional encoding with LN, residual
    (reference :118)."""

    C: int
    ks: int

    @nn.compact
    def __call__(self, x):
        h = SafeConv(
            self.C, (self.ks,), padding=[(self.ks // 2, self.ks // 2)],
            feature_group_count=self.C, name="conv",
        )(x)
        h = LayerNorm(epsilon=1e-6, name="norm")(h)
        return x + h


class TimeContextBlock1d(nn.Module):
    """1x1 reduce -> time-context module -> 1x1 expand, residual
    (reference :540).  block_type 'conv+att' (default for all factories):
    4 depthwise ConvNeXt blocks (k 7/19/31/59) + transformer layer."""

    C: int
    hC: int
    block_type: str = "conv+att"
    pos_ker_sz: int = 59
    gelu_impl: str = "erf"

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        h = nn.Conv(self.hC, (1,), name="red_conv")(x)
        h = LayerNorm(epsilon=1e-6, name="red_norm")(h)

        if self.block_type == "fc":
            h2 = nn.Conv(self.hC * 2, (1,), name="fc1")(h)
            h2 = LayerNorm(epsilon=1e-6, name="fc_norm")(h2)
            h2 = _gelu(h2, self.gelu_impl)
            h = nn.Conv(self.hC, (1,), name="fc2")(h2)
        elif self.block_type == "att":
            h = PosEncConv(self.hC, self.pos_ker_sz, name="pos_enc")(h)
            h = TransformerEncoderLayer(
                self.hC, self.hC * 2, 4, name="att"
            )(h)
        elif self.block_type == "conv+att":
            for i, ks in enumerate((7, 19, 31, 59)):
                h = ConvNeXtLikeBlock(
                    self.hC, dim=1, kernel_sizes=(ks,), group_divisor=1,
                    gelu_impl=self.gelu_impl, name=f"convnext_{i}",
                )(h, train)
            h = TransformerEncoderLayer(self.hC, self.hC, 4, name="att")(h)
        elif self.block_type == "gru":
            # bidirectional GRU over time + 1x1 projection (reference
            # :566-578; NB the reference feeds a seq-first torch GRU a
            # batch-first tensor — a latent bug in an unused path — here
            # the recurrence correctly runs over the time axis)
            fwd = nn.RNN(nn.GRUCell(self.hC), name="gru_fwd")(h)
            bwd = nn.RNN(
                nn.GRUCell(self.hC), reverse=True, keep_order=True,
                name="gru_bwd",
            )(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
            h = nn.Conv(self.hC, (1,), name="gru_proj")(h)
        else:
            raise NotImplementedError(self.block_type)

        h = nn.Conv(self.C, (1,), name="exp_conv")(h)
        return skip + h


class ReDimNet(nn.Module):
    feat_dim: int = 72
    C: int = 16
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    stages_setup: Sequence = (
        (1, 2, 1, ((3, 3),), 12),
        (2, 2, 1, ((3, 3),), 12),
        (1, 3, 1, ((3, 3),), 12),
        (2, 4, 1, ((3, 3),), 8),
        (1, 4, 1, ((3, 3),), 8),
        (2, 4, 1, ((3, 3),), 4),
    )
    group_divisor: Optional[int] = 4
    out_channels: Optional[int] = None
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = True
    two_emb_layer: bool = False
    gelu_impl: str = "erf"

    def _block2d(self, c, f, name):
        if self.block_2d_type == "convnext_like":
            return ConvNeXtLikeBlock(
                c, dim=2, kernel_sizes=((3, 3),),
                group_divisor=self.group_divisor,
                gelu_impl=self.gelu_impl, name=name,
            )
        use_fwse = self.block_2d_type == "basic_resnet_fwse"
        return ResBasicBlock(
            c, f, group_divisor=self.group_divisor,
            use_fwse=use_fwse, se_channels=min(64, max(c, 32)), name=name,
        )

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        cf = self.C * self.feat_dim
        b, t = x.shape[0], x.shape[1]

        # stem: (B, T, F, 1) -> (B, T, F, C) + per-channel LN
        h = x[..., None]
        h = nn.Conv(self.C, (3, 3), padding="SAME", name="stem_conv")(h)
        h = LayerNorm(
            epsilon=1e-6, reduction_axes=-1, name="stem_norm"
        )(h)

        def to1d(z):
            return z.reshape(z.shape[0], z.shape[1], -1)  # (B,T,F*C)

        def to2d(z, c, f):
            return z.reshape(z.shape[0], z.shape[1], f, c)

        outputs_1d = [to1d(h)]
        cur_c, cur_f = self.C, self.feat_dim
        for si, (stride, num_blocks, conv_exp, _ks, att_red) in enumerate(
            self.stages_setup
        ):
            # weighted sum of previous outputs
            n = len(outputs_1d)
            if n == 1:
                z = outputs_1d[0]
            else:
                w = self.param(
                    f"inputs_weights_{si}",
                    nn.initializers.zeros,
                    (n, cf),
                )
                z = _mix_outputs(w, outputs_1d)
            z2 = to2d(z, cur_c, cur_f)  # (B, T, F, C)

            # downsample freq / expand channels: conv (1, stride) over (T,F)
            z2 = nn.Conv(
                int(stride * cur_c * conv_exp),
                (1, stride),
                strides=(1, stride),
                padding="VALID",
                name=f"stage{si}_down",
            )(z2)
            cur_c = stride * cur_c
            cur_f = cur_f // stride

            for bi in range(num_blocks):
                z2 = self._block2d(
                    int(cur_c * conv_exp), cur_f, f"stage{si}_block{bi}"
                )(z2, train)

            if conv_exp != 1:
                z2 = SafeConv(
                    cur_c, (3, 3), padding="SAME",
                    feature_group_count=_groups(cur_c, self.group_divisor),
                    name=f"stage{si}_squeeze_conv",
                )(z2)
                z2 = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-6, name=f"stage{si}_squeeze_bn",
                )(z2)
                z2 = _gelu(z2, self.gelu_impl)
                z2 = nn.Conv(cur_c, (1, 1), name=f"stage{si}_squeeze_pw")(z2)

            z1 = to1d(z2)
            if att_red is not None:
                z1 = TimeContextBlock1d(
                    cf, cf // att_red, block_type=self.block_1d_type,
                    gelu_impl=self.gelu_impl, name=f"stage{si}_tcb",
                )(z1, train)
            outputs_1d.append(z1)

        # final weighting over all stage outputs
        n = len(outputs_1d)
        w = self.param(
            "inputs_weights_final", nn.initializers.zeros, (n, cf)
        )
        feat = _mix_outputs(w, outputs_1d)

        out_dim = cf
        if self.out_channels is not None:
            feat = nn.Conv(self.out_channels, (1,), name="mfa_conv")(feat)
            feat = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="mfa_bn",
            )(feat)
            out_dim = self.out_channels

        kwargs = {}
        if self.pooling_func == "ASTP":
            kwargs["global_context_att"] = self.global_context_att
        stats = POOLING_LAYERS[self.pooling_func](
            in_dim=out_dim, name="pool", **kwargs
        )(feat, mask=mask, train=train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        if self.two_emb_layer:
            h2 = nn.relu(embed_a)
            h2 = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                use_bias=False, use_scale=False, name="seg_bn_1",
            )(h2)
            embed_b = nn.Dense(self.embed_dim, name="seg_2")(h2)
            return embed_a, embed_b
        return jnp.zeros(()), embed_a


def _mk(C, b2, setup, gd):
    def make(feat_dim=72, embed_dim=192, pooling_func="ASTP",
             two_emb_layer=False, gelu_impl="erf", **kw):
        return ReDimNet(
            feat_dim=feat_dim, C=C, block_1d_type="conv+att",
            block_2d_type=b2, stages_setup=setup, group_divisor=gd,
            out_channels=None, embed_dim=embed_dim,
            pooling_func=pooling_func, global_context_att=True,
            two_emb_layer=two_emb_layer, gelu_impl=gelu_impl,
        )

    return make


ReDimNetB0 = _mk(
    10, "basic_resnet",
    ((1, 2, 1, ((3, 3),), 30), (2, 3, 2, ((3, 3),), 30),
     (1, 3, 3, ((3, 3),), 30), (2, 4, 2, ((3, 3),), 10),
     (1, 3, 1, ((3, 3),), 10)),
    1,
)
ReDimNetB1 = _mk(
    12, "convnext_like",
    ((1, 2, 1, ((3, 3),), None), (2, 3, 1, ((3, 3),), None),
     (3, 4, 1, ((3, 3),), 12), (2, 5, 1, ((3, 3),), 12),
     (2, 3, 1, ((3, 3),), 8)),
    8,
)
ReDimNetB2 = _mk(
    16, "convnext_like",
    ((1, 2, 1, ((3, 3),), 12), (2, 2, 1, ((3, 3),), 12),
     (1, 3, 1, ((3, 3),), 12), (2, 4, 1, ((3, 3),), 8),
     (1, 4, 1, ((3, 3),), 8), (2, 4, 1, ((3, 3),), 4)),
    4,
)
ReDimNetB3 = _mk(
    16, "basic_resnet_fwse",
    ((1, 6, 4, ((3, 3),), 32), (2, 6, 2, ((3, 3),), 32),
     (1, 8, 2, ((3, 3),), 32), (2, 10, 2, ((3, 3),), 16),
     (1, 10, 1, ((3, 3),), 16), (2, 8, 1, ((3, 3),), 16)),
    1,
)
ReDimNetB4 = _mk(
    32, "basic_resnet_fwse",
    ((1, 4, 2, ((3, 3),), 48), (2, 4, 2, ((3, 3),), 48),
     (1, 6, 2, ((3, 3),), 48), (2, 6, 1, ((3, 3),), 32),
     (1, 8, 1, ((3, 3),), 24), (2, 4, 1, ((3, 3),), 16)),
    1,
)
ReDimNetB5 = _mk(
    32, "basic_resnet_fwse",
    ((1, 4, 2, ((3, 3),), 48), (2, 4, 2, ((3, 3),), 48),
     (1, 6, 2, ((3, 3),), 48), (2, 6, 1, ((3, 3),), 32),
     (1, 8, 1, ((3, 3),), 24), (2, 4, 1, ((3, 3),), 16)),
    16,
)
ReDimNetB6 = _mk(
    32, "basic_resnet",
    ((1, 4, 4, ((3, 3),), 32), (2, 6, 2, ((3, 3),), 32),
     (1, 6, 2, ((3, 3),), 24), (3, 8, 1, ((3, 3),), 24),
     (1, 8, 1, ((3, 3),), 16), (2, 8, 1, ((3, 3),), 16)),
    32,
)
