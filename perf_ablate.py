"""In-situ model-internal attribution: time the real scanned feats-step
with components identity-patched (shapes preserved), so deltas include
fusion + bwd effects.  Methodology: docs/PERF_NOTES.md."""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

import wespeaker_hubert_tpu.models.ecapa_tdnn as ecapa_mod
import wespeaker_hubert_tpu.models.norm as norm_mod
import wespeaker_hubert_tpu.models.pooling as pool_mod


def run_case(tag):
    # (re)import-time patching must happen before model build
    if tag == "no_res2":
        class IdRes2(nn.Module):
            channels: int = 0
            kernel_size: int = 3
            dilation: int = 1
            scale: int = 8
            @nn.compact
            def __call__(self, x, train=False):
                return x
        ecapa_mod.Res2ConvReluBn = IdRes2
    elif tag == "no_bn":
        class IdBN(nn.Module):
            use_running_average: bool = True
            momentum: float = 0.9
            epsilon: float = 1e-5
            @nn.compact
            def __call__(self, x, *a, **k):
                return x
        ecapa_mod.BatchNorm = IdBN
    elif tag == "no_se":
        class IdSE(nn.Module):
            channels: int = 0
            se_bottleneck_dim: int = 128
            @nn.compact
            def __call__(self, x, mask=None):
                return x
        ecapa_mod.SEConnect = IdSE
    elif tag == "tap_pool":
        class TAP(nn.Module):
            in_dim: int = 0
            global_context_att: bool = False
            @nn.compact
            def __call__(self, x, mask=None, train=False):
                m = jnp.mean(x, axis=1)
                s = jnp.std(x, axis=1)
                return jnp.concatenate([m, s], axis=-1)
        pool_mod.POOLING_LAYERS = dict(pool_mod.POOLING_LAYERS, ASTP=TAP)
        ecapa_mod.POOLING_LAYERS = pool_mod.POOLING_LAYERS
    elif tag == "plain_sgd":
        pass
    elif tag == "base":
        pass
    else:
        raise SystemExit(f"unknown tag {tag}")

    from perf_lab import build, time_step
    import wespeaker_hubert_tpu.train.state as state_mod
    if tag == "plain_sgd":
        import optax
        orig = state_mod.make_optimizer
        state_mod.make_optimizer = lambda lr, *a, **k: optax.chain(
            optax.scale_by_schedule(lambda s: -lr(s)))
        import wespeaker_hubert_tpu.train as train_pkg
        train_pkg.make_optimizer = state_mod.make_optimizer
        # perf_lab imported make_optimizer directly
        import perf_lab
        perf_lab.make_optimizer = state_mod.make_optimizer
    step, state, b = build("feats")
    ms = time_step(step, state, b)
    print(json.dumps({"ablation": tag, "ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    run_case(sys.argv[1])
