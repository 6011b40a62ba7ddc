"""Pipeline parallelism: dp x pp parity vs the sequential encoder.

The pipelined stack must be a pure re-scheduling — every hidden state
bit-equal (up to float reassociation) to SSLEncoder.__call__, and grads
must flow through the ppermute schedule for the joint fine-tune role.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from wespeaker_hubert_tpu.frontend.ssl_encoder import (
    SSLEncoder,
    SSLEncoderConfig,
)
from wespeaker_hubert_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_ssl_hidden_states,
    stack_encoder_layers,
)


def _mesh(data=2, pipe=4):
    devs = np.asarray(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def _build(model_type, n_layers=4, stable_ln=False):
    cfg = dataclasses.replace(
        SSLEncoderConfig.tiny(
            model_type=model_type, do_stable_layer_norm=stable_ln
        ),
        num_hidden_layers=n_layers,
    )
    enc = SSLEncoder(cfg)
    wav = jax.random.normal(jax.random.key(1), (8, 1600)) * 0.1
    variables = enc.init(jax.random.key(0), wav)
    return cfg, enc, variables, wav


@pytest.mark.parametrize(
    "model_type,stable_ln",
    [("hubert", False), ("wavlm", False), ("wavlm", True)],
)
def test_pipeline_matches_sequential(model_type, stable_ln):
    # stable_ln=True is the pre-LN large-model branch (WavLM-Large/
    # hubert_large): final encoder LN applies to the LAST hidden state
    cfg, enc, variables, wav = _build(model_type, stable_ln=stable_ln)
    ref_hidden, _ = enc.apply(variables, wav)

    mesh = _mesh()
    pp_hidden, _ = jax.jit(
        lambda v, w: pipelined_ssl_hidden_states(
            cfg, v, w, mesh=mesh, n_micro=4, data_axis="data"
        )
    )(variables, wav)

    assert len(pp_hidden) == len(ref_hidden) == cfg.num_hidden_layers + 1
    for i, (a, b) in enumerate(zip(pp_hidden, ref_hidden)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=f"hidden state {i}",
        )


def test_pipeline_single_stage_and_full_pipe():
    """Degenerate S=1 (pure dp) and S=8 (one layer per stage) both hold."""
    cfg, enc, variables, wav = _build("hubert", n_layers=8)
    ref_hidden, _ = enc.apply(variables, wav)
    for data, pipe, n_micro in ((8, 1, 1), (1, 8, 4)):
        mesh = _mesh(data, pipe)
        pp_hidden, _ = pipelined_ssl_hidden_states(
            cfg, variables, wav, mesh=mesh, n_micro=n_micro,
            data_axis="data" if data > 1 else None,
        )
        np.testing.assert_allclose(
            np.asarray(pp_hidden[-1]), np.asarray(ref_hidden[-1]),
            rtol=2e-5, atol=2e-6,
        )


def _grad_fixtures():
    cfg, enc, variables, wav = _build("hubert")
    stacked, _ = stack_encoder_layers(variables["params"], cfg)

    from wespeaker_hubert_tpu.frontend.ssl_encoder import EncoderLayer

    layer = EncoderLayer(cfg, layer_idx=1)

    def layer_fn(lp, x):
        out, _ = layer.apply({"params": lp}, x, None, None)
        return out

    mesh1 = _mesh(1, 1)
    hidden0 = pipelined_ssl_hidden_states(
        cfg, variables, wav, mesh=mesh1, n_micro=1
    )[0][0]
    return cfg, stacked, layer_fn, hidden0


def _max_rel_l2(ga, gb):
    """Max per-leaf relative L2 error, skipping k_proj bias (its true
    grad is 0 — softmax is invariant to a constant key-score shift — so
    both sides hold pure noise there)."""
    worst = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0], jax.tree.leaves(gb)
    ):
        if "k_proj" in jax.tree_util.keystr(path) and a.ndim == 2:
            continue
        a, b = np.asarray(a), np.asarray(b)
        worst = max(
            worst, np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        )
    return worst


def test_pipeline_grads_match_sequential():
    """d(loss)/d(layer params) through the pipeline schedule equals the
    sequential scan's grads — the joint fine-tune training role.  No
    data sharding here so per-device activation shapes match the
    reference evaluation (XLA CPU computes transcendental ops slightly
    differently per batch shape, which would contaminate the check)."""
    cfg, stacked, layer_fn, hidden0 = _grad_fixtures()
    mesh = _mesh(1, 4)

    def seq_loss(sp):
        def body(h, p):
            return layer_fn(p, h), None

        h, _ = jax.lax.scan(body, hidden0, sp)
        return jnp.sum(h ** 2)

    ref_grads = jax.jit(jax.grad(seq_loss))(stacked)

    def pp_loss(sp):
        states = pipeline_apply(
            layer_fn, sp, hidden0, mesh=mesh, n_micro=4
        )
        return jnp.sum(states[-1] ** 2)

    pp_grads = jax.jit(jax.grad(pp_loss))(stacked)
    # Codegen floor, not pipeline error: re-running the SAME sequential
    # math merely unrolled instead of scanned already shifts these
    # cancellation-heavy grads by ~8e-4 rel-L2 on XLA CPU, and the
    # partial-manual lowering compiles the layer in a different fusion
    # environment (measured ~1.2e-3 here).  True schedule error is
    # excluded separately: a tanh-matmul layer (no transcendental
    # cancellation) matches at ~7e-8 and the forward at ~3e-7 rel.
    assert _max_rel_l2(pp_grads, ref_grads) < 5e-3


def test_pipeline_grads_data_sharded_exact():
    """With dp x pp, pipeline grads are BIT-EXACT against a reference
    evaluated at the same per-device shapes (grads psum over 'data',
    microbatches accumulate in tick order = row order here)."""
    cfg, stacked, layer_fn, hidden0 = _grad_fixtures()
    mesh = _mesh(8, 1)

    def seq_loss_on(h0, sp):
        def body(h, p):
            return layer_fn(p, h), None

        h, _ = jax.lax.scan(body, h0, sp)
        return jnp.sum(h ** 2)

    ref_grads = jax.tree.map(
        lambda *x: sum(x),
        *[
            jax.grad(lambda sp, h=hidden0[i : i + 1]: seq_loss_on(h, sp))(
                stacked
            )
            for i in range(hidden0.shape[0])
        ],
    )

    def pp_loss(sp):
        states = pipeline_apply(
            layer_fn, sp, hidden0, mesh=mesh, n_micro=1, data_axis="data"
        )
        return jnp.sum(states[-1] ** 2)

    pp_grads = jax.jit(jax.grad(pp_loss))(stacked)
    assert _max_rel_l2(pp_grads, ref_grads) < 1e-6


def test_pipeline_remat_grads_identical():
    """jax.checkpoint per layer changes memory, not math: grads match
    the non-remat pipeline's at the f32 floor (the recomputation can be
    scheduled/fused differently, so not strictly bitwise)."""
    cfg, stacked, layer_fn, hidden0 = _grad_fixtures()
    mesh = _mesh(1, 4)

    def loss(sp, remat):
        states = pipeline_apply(
            layer_fn, sp, hidden0, mesh=mesh, n_micro=4, remat=remat
        )
        return jnp.sum(states[-1] ** 2)

    g0 = jax.jit(jax.grad(lambda sp: loss(sp, False)))(stacked)
    g1 = jax.jit(jax.grad(lambda sp: loss(sp, True)))(stacked)
    # XLA re-fuses the recomputed forward differently (measured ~1.4e-3
    # rel-L2 on this tiny net's cancellation-heavy grads — the same
    # codegen sensitivity as evaluating the identical math at different
    # batch shapes, see test_pipeline_grads_data_sharded_exact's note)
    assert _max_rel_l2(g1, g0) < 5e-3


def test_pipeline_bf16_production_dtype():
    """The extraction path runs bf16 on TPU; the pipeline must hold
    parity with the sequential scan at the bf16 rounding floor."""
    cfg, stacked, layer_fn, hidden0 = _grad_fixtures()
    mesh = _mesh(2, 4)
    h_bf16 = hidden0.astype(jnp.bfloat16)
    sp_bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), stacked)

    def seq(sp, h):
        def body(h, p):
            return layer_fn(p, h), None

        h, _ = jax.lax.scan(body, h, sp)
        return h

    ref = jax.jit(seq)(sp_bf16, h_bf16)
    out = jax.jit(
        lambda sp, h: pipeline_apply(
            layer_fn, sp, h, mesh=mesh, n_micro=4, data_axis="data"
        )
    )(sp_bf16, h_bf16)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out[-1], np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_pipeline_full_train_step():
    """A complete pp training step: pipelined stack -> mean-pool ->
    linear head -> CE loss -> SGD update of the pipe-sharded stacked
    params.  Loss must fall and match the unpipelined implementation
    step for step."""
    import optax

    cfg, stacked, layer_fn, hidden0 = _grad_fixtures()
    mesh = _mesh(1, 4)
    n_class = 4
    labels = jnp.asarray(np.arange(8) % n_class)
    head = jax.random.normal(jax.random.key(5), (32, n_class)) * 0.1
    tx = optax.sgd(0.05)

    def logits_pp(params):
        states = pipeline_apply(
            layer_fn, params["stack"], hidden0, mesh=mesh, n_micro=4,
            remat=True,
        )
        pooled = states[-1].mean(axis=1)
        return pooled @ params["head"]

    def logits_seq(params):
        def body(h, p):
            return layer_fn(p, h), None

        h, _ = jax.lax.scan(body, hidden0, params["stack"])
        return h.mean(axis=1) @ params["head"]

    def run(logits_fn):
        params = {"stack": stacked, "head": head}
        opt_state = tx.init(params)
        losses = []

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logp = jax.nn.log_softmax(logits_fn(p))
                return -jnp.mean(logp[jnp.arange(8), labels])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(3):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        return losses

    pp_losses = run(logits_pp)
    seq_losses = run(logits_seq)
    assert pp_losses[-1] < pp_losses[0]
    np.testing.assert_allclose(pp_losses, seq_losses, rtol=1e-4)


def test_pipeline_rejects_bad_split():
    cfg, enc, variables, wav = _build("hubert", n_layers=4)
    stacked, _ = stack_encoder_layers(variables["params"], cfg)
    mesh = _mesh(2, 4)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(
            lambda p, x: x, stacked, jnp.zeros((7, 3, 32)),
            mesh=mesh, n_micro=4,
        )
    mesh3 = Mesh(np.asarray(jax.devices()[:3]).reshape(1, 3), ("data", "pipe"))
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(
            lambda p, x: x, stacked, jnp.zeros((8, 3, 32)),
            mesh=mesh3, n_micro=4,
        )
