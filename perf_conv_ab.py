"""Conv-formulation A/B on the real chip (round 2, VERDICT #1).

Measurement rules learned the hard way (docs/PERF_NOTES.md + this lab):
  * consume EVERY output with a full reduction (sum) — returning
    `.ravel()[0]` lets XLA dead-code-eliminate the op under test (the
    first version of this lab "measured" 752 TFLOP/s that way);
  * scan length must push per-dispatch compute far beyond the remote
    tunnel's dispatch floor (~6 ms measured below by the empty body) —
    K=8 (perf_micro.py) leaves matmul4096 dispatch-contaminated.

Cases: empty scan body (dispatch floor), 4096^3 matmul (chip anchor),
the ECAPA Res2 hierarchical k=3 d=2 stack as XLA convs vs hand-lowered
shifted matmuls, and 1x1 conv vs reshaped dot.  All bf16, B=128 T=200
(production train shapes), fwd and fwd+bwd(all grads consumed).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, T, C, W = 128, 200, 1024, 128  # W = res2 width (c1024 / scale 8)
KSC = 64
ITERS = 4


def timed(fn, *args, scan_len=KSC):
    r = fn(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (ITERS * scan_len) * 1e3


def scan_wrap(body):
    """body(c, *args) -> scalar f32; carry feeds back so nothing is CSE'd."""
    @jax.jit
    def run(*args):
        def step(c, _):
            return body(c * 1e-30, *args), None
        return lax.scan(step, jnp.float32(0), None, length=KSC)[0]
    return run


def res2_conv_apply(x, ws, d):
    dn = lax.conv_dimension_numbers(
        (B, T, W), (3, W, W), ("NWC", "WIO", "NWC"))
    spx = [x[..., i * W : (i + 1) * W] for i in range(8)]
    out, sp = [], spx[0]
    for i in range(7):
        if i >= 1:
            sp = sp + spx[i]
        sp = lax.conv_general_dilated(
            sp, ws[i], (1,), [(d, d)], rhs_dilation=(d,),
            dimension_numbers=dn)
        sp = jax.nn.relu(sp)
        out.append(sp)
    out.append(spx[7])
    return jnp.concatenate(out, axis=-1)


def res2_mm_apply(x, ws, d):
    spx = [x[..., i * W : (i + 1) * W] for i in range(8)]
    out, sp = [], spx[0]
    for i in range(7):
        if i >= 1:
            sp = sp + spx[i]
        w = ws[i]  # (3, W, W)
        xp = jnp.pad(sp, ((0, 0), (d, d), (0, 0)))
        sp = (xp[:, :T] @ w[0] + xp[:, d : d + T] @ w[1]
              + xp[:, 2 * d : 2 * d + T] @ w[2])
        sp = jax.nn.relu(sp)
        out.append(sp)
    out.append(spx[7])
    return jnp.concatenate(out, axis=-1)


def bench_pair(name, apply, x, ws, gflop):
    def floss(c, x, ws):
        y = apply(x + c.astype(x.dtype), ws, 2)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    def fb_body(c, x, ws):
        l, g = jax.value_and_grad(floss, argnums=2)(c, x, ws)
        return l + jnp.sum(g.astype(jnp.float32)) * 1e-9

    msf = timed(scan_wrap(floss), x, ws)
    msfb = timed(scan_wrap(fb_body), x, ws)
    print(json.dumps({
        "case": name, "fwd_ms": round(msf, 3), "fwdbwd_ms": round(msfb, 3),
        "fwd_tflops": round(gflop / msf, 1),
        "fwdbwd_tflops": round(3 * gflop / msfb, 1)}), flush=True)


def main():
    rng = np.random.default_rng(0)

    ms = timed(scan_wrap(lambda c: c + 1.0))
    print(json.dumps({"case": "empty_scan_floor",
                      "per_iter_ms": round(ms, 4),
                      "per_dispatch_ms": round(ms * KSC, 2)}), flush=True)

    a = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.bfloat16)

    @jax.jit
    def mm(a):
        def step(c, _):
            return (c @ a) * (1.0 / 64.0), None
        return lax.scan(step, a, None, length=KSC)[0]

    ms = timed(mm, a)
    print(json.dumps({"case": "anchor_mm4096", "fwd_ms": round(ms, 3),
                      "fwd_tflops": round(2 * 4096**3 / 1e9 / ms, 1)}),
          flush=True)

    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((7, 3, W, W)) * 0.05, jnp.bfloat16)
    res2_gflop = 2 * B * T * 3 * W * W * 7 / 1e9
    bench_pair("res2_conv", res2_conv_apply, x, ws, res2_gflop)
    bench_pair("res2_mm", res2_mm_apply, x, ws, res2_gflop)

    w1 = jnp.asarray(rng.standard_normal((1, C, C)) * 0.03, jnp.bfloat16)
    dn1 = lax.conv_dimension_numbers(
        (B, T, C), (1, C, C), ("NWC", "WIO", "NWC"))
    c1x1_gflop = 2 * B * T * C * C / 1e9
    bench_pair(
        "c1x1_conv",
        lambda x, w, d: lax.conv_general_dilated(
            x, w, (1,), [(0, 0)], dimension_numbers=dn1), x, w1, c1x1_gflop)
    bench_pair(
        "c1x1_dot",
        lambda x, w, d: (x.reshape(B * T, C) @ w[0]).reshape(B, T, C),
        x, w1, c1x1_gflop)


if __name__ == "__main__":
    main()
