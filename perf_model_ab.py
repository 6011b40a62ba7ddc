"""Model-vs-skeleton attribution on the real chip (round 2, VERDICT #1).

perf_conv_ab.py established: anchor 4096^3 matmul = 163 TF/s; ECAPA's
1x1 convs run at 130-228 TF/s; the narrow res2 convs at 44-87 TF/s and
XLA's native conv lowering beats hand-lowered shifted matmuls.  This
lab closes the loop on the REAL model: where do the remaining ms go?

Cases (all bf16, B=128 T=200, K=64 scan, fetch-forced, ALL grads
consumed in fwd+bwd — perf_lab.cmd_model consumed only one leaf, which
lets XLA dead-code-eliminate part of the backward):

  ecapa      : production ECAPA_TDNN_GLOB_c1024 + ArcMargin head + CE
  skel       : hand-built conv/matmul skeleton with the SAME conv
               shapes (k5 80->1024; 3x [1x1, res2 7xk3 w128, 1x1];
               cat 3072->1536; stats pool; fc 3072->192; 192->17982)
               but NO norms/ReLU/SE/attentive pooling/margin
  skel_glue  : skeleton + per-channel scale/bias + relu after every
               conv (the elementwise cost of BN-shaped glue)

delta(skel_glue, skel)   = elementwise glue cost
delta(ecapa, skel_glue)  = SE blocks + ASTP + margin + f32 BN stats
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    create_train_state,
    cross_entropy,
    make_optimizer,
)

B, T, NC = 128, 200, 17982
K, ITERS = 64, 3


def timed(fn, *args):
    r = fn(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*args)
    float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (ITERS * K) * 1e3


def consume_tree(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t)) * 1e-9


def report(tag, loss_fn, params, feats, labels):
    if len(sys.argv) > 1 and tag not in sys.argv[1:]:
        return None, None
    @jax.jit
    def fwd(params, feats, labels):
        def body(c, _):
            return loss_fn(params, feats * (1 + c * 1e-30), labels), None
        return lax.scan(body, jnp.float32(0), None, length=K)[0]

    @jax.jit
    def fwdbwd(params, feats, labels):
        def body(c, _):
            l, g = jax.value_and_grad(loss_fn)(
                params, feats * (1 + c * 1e-30), labels)
            return l + consume_tree(g), None
        return lax.scan(body, jnp.float32(0), None, length=K)[0]

    ca = jax.jit(lambda p, f, l: jax.value_and_grad(loss_fn)(p, f, l)
                 ).lower(params, feats, labels).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    gflop = ca.get("flops", 0) / 1e9
    gb = ca.get("bytes accessed", 0) / 1e9

    msf = timed(fwd, params, feats, labels)
    msfb = timed(fwdbwd, params, feats, labels)
    print(json.dumps({
        "case": tag, "fwd_ms": round(msf, 2), "fwdbwd_ms": round(msfb, 2),
        "fwdbwd_gflop": round(gflop, 0), "fwdbwd_gb": round(gb, 1),
        "fwdbwd_tflops": round(gflop / msfb, 1),
        "fwdbwd_gbps": round(gb / msfb * 1000, 0)}), flush=True)
    return msf, msfb


def conv1d(x, w, d=1):
    k = w.shape[0]
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape, ("NWC", "WIO", "NWC"))
    pad = (k - 1) * d // 2
    return lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(d,), dimension_numbers=dn)


def batchnorm(x, s, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1))
    var = jnp.mean(jnp.square(xf), axis=(0, 1)) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * s + b
    return y.astype(x.dtype)


def make_skeleton(glue, bn=False, astp=False):
    def post(x, s, b):
        if bn:
            return batchnorm(jax.nn.relu(x), s, b)
        if glue:
            return jax.nn.relu(x * s + b)
        return x

    def apply(params, feats, labels):
        x = feats.astype(jnp.bfloat16)
        x = post(conv1d(x, params["conv1"]), params["s1"], params["b1"])
        outs = []
        for bi, d in enumerate((2, 3, 4)):
            p = params[f"blk{bi}"]
            y = post(conv1d(x, p["in"]), p["in_s"], p["in_b"])
            spx = [y[..., i * 128 : (i + 1) * 128] for i in range(8)]
            res, sp = [], spx[0]
            for i in range(7):
                if i >= 1:
                    sp = sp + spx[i]
                sp = conv1d(sp, p["res"][i], d)
                if bn:
                    sp = batchnorm(jax.nn.relu(sp), 1.0, 0.0)
                elif glue:
                    sp = jax.nn.relu(sp)
                res.append(sp)
            res.append(spx[7])
            y = jnp.concatenate(res, axis=-1)
            y = post(conv1d(y, p["out"]), p["out_s"], p["out_b"])
            x = x + y
            outs.append(x)
        z = jnp.concatenate(outs, axis=-1)
        z = post(conv1d(z, params["cat"]), params["cat_s"], params["cat_b"])
        mu = jnp.mean(z, axis=1)
        sd = jnp.sqrt(jnp.clip(jnp.mean(z * z, axis=1) - mu * mu, 1e-4))
        if astp:
            C = z.shape[-1]
            k = params["att1"]
            if astp == "cat":
                ctx = jnp.concatenate(
                    [z, jnp.broadcast_to(mu[:, None, :], z.shape),
                     jnp.broadcast_to(sd[:, None, :], z.shape)], axis=-1)
                a = ctx @ k
            else:
                a = (z @ k[:C] + mu[:, None, :] @ k[C : 2 * C]
                     + sd[:, None, :] @ k[2 * C :])
            a = jnp.tanh(a)
            scores = a @ params["att2"]
            alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=1
                                   ).astype(z.dtype)
            mu = jnp.sum(alpha * z, axis=1)
            sd = jnp.sqrt(jnp.clip(
                jnp.sum(alpha * z * z, axis=1) - mu * mu, 1e-4))
        e = jnp.concatenate([mu, sd], axis=-1) @ params["fc"]
        logits = (e @ params["head"]).astype(jnp.float32)
        return cross_entropy(logits, labels)

    return apply


def skeleton_params(rng):
    def w(*shape, s=0.03):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.bfloat16)

    p = {"conv1": w(5, 80, 1024), "s1": w(1024, s=1), "b1": w(1024),
         "cat": w(1, 3072, 1536), "cat_s": w(1536, s=1), "cat_b": w(1536),
         "att1": w(3 * 1536, 128), "att2": w(128, 1536),
         "fc": w(3072, 192), "head": w(192, NC)}
    for bi in range(3):
        p[f"blk{bi}"] = {
            "in": w(1, 1024, 1024), "in_s": w(1024, s=1), "in_b": w(1024),
            "res": w(7, 3, 128, 128), "out": w(1, 1024, 1024),
            "out_s": w(1024, s=1), "out_b": w(1024)}
    return p


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, NC, B))

    backbone = get_speaker_model("ECAPA_TDNN_GLOB_c1024")(
        feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": NC, "scale": 32.0})
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(num_epochs=150, epoch_iter=1000,
                             initial_lr=0.1, final_lr=5e-5, warm_up_epoch=6)
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    state = create_train_state(net, tx, jax.random.key(0),
                               jnp.zeros((B, T, 80)), jnp.zeros((B,), jnp.int32))
    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x

    def ecapa_loss(params, feats, labels):
        variables = {"params": jax.tree.map(cast, params)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (emb, logits, aux), upd = net.apply(
            variables, feats.astype(jnp.bfloat16), labels, 0.1,
            train=True, mutable=["batch_stats"])
        return cross_entropy(logits.astype(jnp.float32), labels)

    report("ecapa", ecapa_loss, state.params, feats, labels)
    sp = skeleton_params(rng)
    report("skel", make_skeleton(False), sp, feats, labels)
    report("skel_glue", make_skeleton(True), sp, feats, labels)
    report("skel_bn", make_skeleton(True, bn=True), sp, feats, labels)
    report("skel_bn_astp", make_skeleton(True, bn=True, astp=True),
           sp, feats, labels)
    report("skel_bn_astp_cat", make_skeleton(True, bn=True, astp="cat"),
           sp, feats, labels)


if __name__ == "__main__":
    main()
