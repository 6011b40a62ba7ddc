"""Per-component microbench of the ECAPA train step (B=128, T=200).
Each component timed scanned+fetch-forced, fwd and fwd+bwd with ALL grad
leaves consumed (no DCE). Also measures pure-matmul chip peak."""
import json, time
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

from wespeaker_hubert_tpu.models.ecapa_tdnn import (
    ConvReluBn, Res2ConvReluBn, SERes2Block, EcapaTdnn)
from wespeaker_hubert_tpu.models.pooling import POOLING_LAYERS
from wespeaker_hubert_tpu.models import get_projection

B, T, C = 128, 200, 1024
K, ITERS = 8, 8


def timed(fn, *a):
    r = fn(*a)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*a)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (ITERS * K) * 1e3


def consume_tree(t):
    return sum(jnp.sum(l.astype(jnp.float32) * 1e-9) for l in jax.tree.leaves(t))


def bench_module(name, mod, x, train=True, flops_g=None):
    rng = np.random.default_rng(0)
    variables = mod.init(jax.random.key(0), x, train=train)
    cast = lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def fwd_loss(params, x):
        v = {"params": jax.tree.map(cast, params)}
        if bs:
            v["batch_stats"] = bs
        out = mod.apply(v, x, train=train, mutable=["batch_stats"] if train else False)
        out = out[0] if isinstance(out, tuple) else out
        return jnp.sum(out.astype(jnp.float32) * 1e-6)

    @jax.jit
    def fwd(params, x):
        def body(c, _):
            return fwd_loss(params, x * (1 + c * 1e-30)), None
        return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

    @jax.jit
    def fwdbwd(params, x):
        def body(c, _):
            l, g = jax.value_and_grad(fwd_loss)(params, x * (1 + c * 1e-30))
            return l + consume_tree(g), None
        return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]

    xb = x.astype(jnp.bfloat16)
    f, fb = timed(fwd, params, xb), timed(fwdbwd, params, xb)
    row = {"component": name, "fwd_ms": round(f, 3), "fwdbwd_ms": round(fb, 3)}
    if flops_g:
        row["fwd_tflops"] = round(flops_g / f, 1)
    print(json.dumps(row), flush=True)
    return f, fb


def main():
    import sys
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    def want(name):
        return only is None or any(o in name for o in only)

    # pure matmul peak
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(c, _):
            return (c @ a) * (1.0 / m), None
        return jax.lax.scan(body, a, None, length=K)[0]
    if not want("matmul4096"):
        ms = None
    else:
        ms = timed(mm, a)
    if ms is not None:
        tf = 2 * m**3 / (ms * 1e-3) / 1e12
        print(json.dumps({"component": "matmul4096_bf16", "fwd_ms": round(ms, 3),
                          "tflops": round(tf, 1)}), flush=True)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, C)), jnp.float32)
    gf = lambda f: f / 1e9
    want("conv1x1_1024") and bench_module("conv1x1_1024", ConvReluBn(C, 1), x,
                 flops_g=gf(2 * B * T * C * C))
    want("layer1_k5_80to1024") and bench_module("layer1_k5_80to1024", ConvReluBn(C, 5),
                 jnp.asarray(np.random.default_rng(1).standard_normal((B, T, 80)), jnp.float32),
                 flops_g=gf(2 * B * T * 80 * C * 5))
    want("res2_k3_d2") and bench_module("res2_k3_d2", Res2ConvReluBn(C, 3, 2, 8), x,
                 flops_g=gf(2 * B * T * (C // 8) * (C // 8) * 3 * 7))
    want("se_res2block") and bench_module("se_res2block", SERes2Block(C, 3, 2, 8), x)
    x3 = jnp.asarray(np.random.default_rng(2).standard_normal((B, T, 3072)), jnp.float32)

    class MFA(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(1536, (1,), name="conv")(x)
    want("mfa_conv_3072to1536") and bench_module("mfa_conv_3072to1536", MFA(), x3,
                 flops_g=gf(2 * B * T * 3072 * 1536))

    class Pool(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return POOLING_LAYERS["ASTP"](in_dim=1536, global_context_att=True,
                                          name="pool")(x, train=train)
    xp = jnp.asarray(np.random.default_rng(3).standard_normal((B, T, 1536)), jnp.float32)
    want("astp_glob_1536") and bench_module("astp_glob_1536", Pool(), xp)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            emb = nn.Dense(192, name="emb")(x)
            proj = get_projection({"project_type": "arc_margin", "embed_dim": 192,
                                   "num_class": 17982, "scale": 32.0})
            labels = jnp.zeros((x.shape[0],), jnp.int32)
            logits, _ = proj(emb.astype(jnp.float32), labels, 0.1)
            import optax
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
    xe = jnp.asarray(np.random.default_rng(4).standard_normal((B, 3072)), jnp.float32)
    want("emb+arcmargin+ce") and bench_module("emb+arcmargin+ce", Head(), xe)

    # full backbone fwd/bwd for cross-check
    want("backbone_glob_c1024") and bench_module("backbone_glob_c1024",
                 EcapaTdnn(1024, 80, 192, "ASTP", True, False),
                 jnp.asarray(np.random.default_rng(5).standard_normal((B, T, 80)), jnp.float32))


if __name__ == "__main__":
    main()
