"""Space-to-depth execution of the ResNet stem (layer1) — numerics-
preserving, weight-rearranged, MXU-width-filling.

Problem (docs/PERF_NOTES.md "ResNet34 stem adjudication"): the
reference architecture runs layer1 at 32 channels and full (T, F)
resolution (reference wespeaker/models/resnet.py:110 m_channels=32), so
its 3x3 convs occupy 32/128 of the MXU's output lanes — a hard 25%
compute ceiling.  The round-3 analysis rejected space-to-depth because
a CENTERED 3x3 block conv over 2x2-folded tensors costs 4x the dense
FLOPs.  The key insight used here: with the INPUT fold SHIFTED by one
row/col relative to the OUTPUT fold, the exact equivalent of a 3x3
stride-1 conv is a 2x2 block conv — 16/9 = 1.78x dense FLOPs (56%
structurally non-zero) at 4x the lane occupancy, a net win wherever the
stage is MXU-width-bound.  Each conv shifts the fold convention by one
original row/col; the bookkeeping below tracks the offset, re-pads with
zero blocks, and trims garbage blocks, so steady-state overhead is only
1-2 extra block rows/cols per dim (~3-5%).

Semantics are preserved EXACTLY (modulo float reassociation):
  * blocked kernels are pure rearrangements of the original (3,3,ci,co)
    weights with structural zeros — the same parameter tree, so
    checkpoints / torch importers are untouched;
  * rows outside the real [0, T) x [0, F) region are re-zeroed after
    every conv (the original's SAME-padding semantics);
  * BatchNorm statistics are computed with masked sums and the TRUE
    element count (B*T*F), matching the unblocked stats bit-for-bit up
    to reduction order; running stats update with flax's
    momentum*ra + (1-momentum)*batch rule on the same param names.

Applies to BasicBlock stems (ResNet18/34 and the SimAM variants share
the shape); the Bottleneck families (50+) spend their time in wider
stages and keep the direct path.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fold_input",
    "s2d_kernel_s1",
    "s2d_kernel_entry",
    "BlockedState",
    "blocked_conv_s1",
    "BlockedBatchNorm",
    "align_to",
]


class BlockedState:
    """(B, Kt, Kf, 4C) blocked tensor + per-dim fold offsets.

    Block (i, j), position p = 2*dr + dc, channel c holds original
    element (ot + 2i + dr, of + 2j + dc, c); rows/cols outside
    [0, T) x [0, F) are maintained as zeros."""

    def __init__(self, x, ot, of, t, f):
        self.x = x
        self.ot, self.of = ot, of
        self.t, self.f = t, f  # real extents

    @property
    def kt(self):
        return self.x.shape[1]

    @property
    def kf(self):
        return self.x.shape[2]


def _pad_blocks(x, top_t, bot_t, top_f, bot_f):
    return jnp.pad(
        x, ((0, 0), (top_t, bot_t), (top_f, bot_f), (0, 0))
    )


def fold_input(x: jax.Array, t: int, f: int) -> BlockedState:
    """(B, T, F, C) -> blocked state with offsets (-1, -1)."""
    b, _, _, c = x.shape
    kt, kf = (t + 3) // 2, (f + 3) // 2
    xp = jnp.pad(
        x, ((0, 0), (1, 2 * kt - 1 - t), (1, 2 * kf - 1 - f), (0, 0))
    )
    xb = xp.reshape(b, kt, 2, kf, 2, c)
    # channel layout p*C + c with p = 2*dr + dc (pos-major)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, kt, kf, 4 * c)
    return BlockedState(xb, -1, -1, t, f)


def _row_mask(k: int, o: int, n: int):
    """(K*2,) validity of original indices o+2i+dr in [0, n)."""
    idx = o + jnp.arange(2 * k)
    return (idx >= 0) & (idx < n)


def valid_mask(st: BlockedState) -> jax.Array:
    """(1, Kt, Kf, 4) mask over blocks x positions (broadcasts over C
    after a reshape to (..., 4, C))."""
    mt = _row_mask(st.kt, st.ot, st.t).reshape(st.kt, 2)
    mf = _row_mask(st.kf, st.of, st.f).reshape(st.kf, 2)
    m = (
        mt[:, None, :, None] & mf[None, :, None, :]
    )  # (Kt, Kf, dr, dc)
    return m.reshape(1, st.kt, st.kf, 4)


def apply_mask(st: BlockedState) -> BlockedState:
    b, kt, kf, c4 = st.x.shape
    m = valid_mask(st)[..., None]  # (1, Kt, Kf, 4, 1)
    x = (st.x.reshape(b, kt, kf, 4, c4 // 4) * m).reshape(st.x.shape)
    return BlockedState(x, st.ot, st.of, st.t, st.f)


def _s1_selector() -> np.ndarray:
    """Constant 0/1 tensor S[bi,bj,dr,dc,a,bb,kt,kf]: which original
    tap (kt,kf) lands at blocked position (bi,bj,p_in,p_out)."""
    s = np.zeros((2, 2, 2, 2, 2, 2, 3, 3), np.float32)
    for bi in range(2):
        for bj in range(2):
            for dr in range(2):
                for dc in range(2):
                    for a in range(2):
                        for bb in range(2):
                            dt = 2 * bi - 1 + dr - a
                            df = 2 * bj - 1 + dc - bb
                            if -1 <= dt <= 1 and -1 <= df <= 1:
                                s[bi, bj, dr, dc, a, bb, dt + 1, df + 1] = 1
    return s


_S1_SEL = _s1_selector()


def s2d_kernel_s1(w: jax.Array) -> jax.Array:
    """(3, 3, ci, co) -> (2, 2, 4ci, 4co) blocked kernel for the
    stride-1 SAME conv: output fold offset = input offset + 1 after the
    mandatory one-block top-left pad (tap rule dt = 2*bi - 1 + dr - a).
    One einsum against a constant 0/1 selector (a single fused op in
    fwd AND bwd, vs 64 scatter/slice pairs)."""
    _, _, ci, co = w.shape
    sel = jnp.asarray(_S1_SEL, w.dtype)
    # (bi,bj,dr,dc,a,bb,kt,kf) x (kt,kf,ci,co) -> (bi,bj,dr,dc,ci,a,bb,co)
    wb = jnp.einsum("xyrsabtf,tfio->xyrsiabo", sel, w)
    # flatten (dr,dc,ci) -> p_in*ci + c and (a,bb,co) -> p_out*co + c
    return wb.reshape(2, 2, 4 * ci, 4 * co)


def _entry_selector(ot: int, of: int) -> np.ndarray:
    s = np.zeros((2, 2, 2, 2, 3, 3), np.float32)
    for bi in range(2):
        for bj in range(2):
            for dr in range(2):
                for dc in range(2):
                    dt = ot + 2 * bi + dr
                    df = of + 2 * bj + dc
                    if -1 <= dt <= 1 and -1 <= df <= 1:
                        s[bi, bj, dr, dc, dt + 1, df + 1] = 1
    return s


_ENTRY_SEL = {
    (ot, of): _entry_selector(ot, of)
    for ot in (-1, -2)
    for of in (-1, -2)
}


def s2d_kernel_entry(w: jax.Array, ot: int, of: int) -> jax.Array:
    """(3, 3, ci, co) -> (2, 2, 4ci, co) kernel for the stride-2
    SAME conv that EXITS the blocked region.  Output t consumes blocks
    (t, t+1); tap dt = ot + 2*bi + dr (valid for ot in {-1, -2}, which
    together cover x rows [2t-1, 2t+1])."""
    assert ot in (-1, -2) and of in (-1, -2), (ot, of)
    _, _, ci, co = w.shape
    sel = jnp.asarray(_ENTRY_SEL[(ot, of)], w.dtype)
    wb = jnp.einsum("xyrstf,tfio->xyrsio", sel, w)
    return wb.reshape(2, 2, 4 * ci, co)


def _coverage_pads(st: BlockedState) -> Tuple[int, int]:
    """Zero blocks needed at the bottom so coverage spans [-1, T]
    (resp. F) — folded into the conv's padding argument, never
    materialized."""
    bot_t = 1 if st.ot + 2 * st.kt - 1 < st.t else 0
    bot_f = 1 if st.of + 2 * st.kf - 1 < st.f else 0
    return bot_t, bot_f


def _trim_top(st: BlockedState) -> BlockedState:
    """Drop leading blocks wholly below index -1 (pure zeros)."""
    cut_t = cut_f = 0
    ot, of = st.ot, st.of
    while ot + 2 <= -1:
        cut_t += 1
        ot += 2
    while of + 2 <= -1:
        cut_f += 1
        of += 2
    if cut_t or cut_f:
        return BlockedState(
            st.x[:, cut_t:, cut_f:], ot, of, st.t, st.f
        )
    return st


def blocked_conv_s1(st: BlockedState, w: jax.Array) -> BlockedState:
    """Exact 3x3 SAME stride-1 conv in blocked form: one-block top-left
    zero pad (+ bottom coverage pad) expressed through the conv's own
    padding argument, then a 2x2 block conv; offset decreases by 1."""
    bot_t, bot_f = _coverage_pads(st)
    wb = s2d_kernel_s1(w).astype(st.x.dtype)
    y = jax.lax.conv_general_dilated(
        st.x, wb, window_strides=(1, 1),
        padding=((1, bot_t), (1, bot_f)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = BlockedState(y, st.ot - 1, st.of - 1, st.t, st.f)
    return _trim_top(out)


def blocked_conv_entry(
    st: BlockedState, w: jax.Array
) -> jax.Array:
    """3x3 SAME stride-2 conv consuming the blocked region; emits the
    normal-layout (B, ceil(T/2), ceil(F/2), co) map.  Offsets must be
    in {-1, -2} (the steady state after trim)."""
    t_out = (st.t - 1) // 2 + 1
    f_out = (st.f - 1) // 2 + 1
    # block t..t+1 feed output t: need blocks up to t_out
    need_t = max(0, t_out + 1 - st.kt)
    need_f = max(0, f_out + 1 - st.kf)
    wb = s2d_kernel_entry(w, st.ot, st.of).astype(st.x.dtype)
    y = jax.lax.conv_general_dilated(
        st.x, wb, window_strides=(1, 1),
        padding=((0, need_t), (0, need_f)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[:, :t_out, :f_out]


def shortcut_entry(st: BlockedState) -> jax.Array:
    """Stride-2 1x1 sampling x[2t, 2f] out of the blocked region —
    normal layout.  Row 2t sits at block (2t - ot - dr)/2: offset -1 ->
    (block t, pos 1); offset -2 -> (block t+1, pos 0)."""
    assert st.ot in (-1, -2) and st.of in (-1, -2)
    b, kt, kf, c4 = st.x.shape
    c = c4 // 4
    t_out = (st.t - 1) // 2 + 1
    f_out = (st.f - 1) // 2 + 1
    need_t = (t_out + 1 if st.ot == -2 else t_out) - kt
    need_f = (f_out + 1 if st.of == -2 else f_out) - kf
    x = _pad_blocks(st.x, 0, max(0, need_t), 0, max(0, need_f))
    x = x.reshape(b, x.shape[1], x.shape[2], 2, 2, c)
    dr = 1 if st.ot == -1 else 0
    dc = 1 if st.of == -1 else 0
    x = x[:, :, :, dr, dc]
    st_t = 1 if st.ot == -2 else 0
    st_f = 1 if st.of == -2 else 0
    return x[:, st_t:st_t + t_out, st_f:st_f + f_out]


def align_to(st: BlockedState, ot: int, of: int) -> BlockedState:
    """Re-index to target offsets of the SAME parity by whole-block
    pad/trim (garbage blocks are zeros, so this is exact)."""
    assert (st.ot - ot) % 2 == 0 and (st.of - of) % 2 == 0
    shift_t = (st.ot - ot) // 2
    shift_f = (st.of - of) // 2
    x = st.x
    if shift_t > 0 or shift_f > 0:
        x = _pad_blocks(x, max(0, shift_t), 0, max(0, shift_f), 0)
    if shift_t < 0 or shift_f < 0:
        x = x[:, max(0, -shift_t):, max(0, -shift_f):]
    return BlockedState(x, ot, of, st.t, st.f)


def align_like(st: BlockedState, ref: BlockedState) -> BlockedState:
    st = align_to(st, ref.ot, ref.of)
    # match block counts (pad/trim bottom; excess blocks are zeros)
    x = st.x
    dt, df = ref.kt - st.kt, ref.kf - st.kf
    if dt > 0 or df > 0:
        x = _pad_blocks(x, 0, max(0, dt), 0, max(0, df))
    if dt < 0 or df < 0:
        x = x[:, : ref.kt, : ref.kf]
    return BlockedState(x, ref.ot, ref.of, st.t, st.f)


class BlockedBatchNorm(nn.Module):
    """BatchNorm over a blocked tensor, numerically identical to the
    flax BatchNorm on the unblocked map: masked f32 sums with the TRUE
    count B*T*F, biased variance, momentum*ra + (1-momentum)*batch
    running update, same param/collection names (scale/bias,
    batch_stats mean/var), output re-masked and cast to input dtype."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, st: BlockedState, train: bool) -> BlockedState:
        b, kt, kf, c4 = st.x.shape
        c = c4 // 4
        x5 = st.x.reshape(b, kt, kf, 4, c)
        m = valid_mask(st)[..., None]  # (1,Kt,Kf,4,1)
        sdt = jnp.promote_types(st.x.dtype, jnp.float32)

        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            n = b * st.t * st.f
            xf = x5.astype(sdt) * m
            mean = jnp.sum(xf, axis=(0, 1, 2, 3)) / n
            var = jnp.sum(xf * xf, axis=(0, 1, 2, 3)) / n - mean * mean
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(
            var.astype(sdt) + self.epsilon
        ) * scale.astype(sdt)
        y = (
            (x5.astype(sdt) - mean.astype(sdt)) * inv
            + bias.astype(sdt)
        ) * m
        y = y.astype(st.x.dtype).reshape(st.x.shape)
        return BlockedState(y, st.ot, st.of, st.t, st.f)
