"""Partitioner-safe grouped conv (ops/conv_safe.py).

Documents and guards against the XLA SPMD bug where a grouped conv's
WEIGHT gradient gets an extra psum over mesh axes that don't shard the
batch (x TP x PP degree) — hit by the SSL pos-conv (and any depthwise
backbone) whenever the mesh has a 'model'/'pipe' axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wespeaker_hubert_tpu.ops.conv_safe import grouped_conv1d


def _mesh(shape, names):
    return Mesh(np.asarray(jax.devices()).reshape(shape), names)


def _lax_conv(x, w, stride, padding, g):
    return lax.conv_general_dilated(
        x, w, (stride,), padding,
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
    )


@pytest.mark.parametrize("stride,pad", [(1, (2, 2)), (2, (1, 2)), (1, (0, 0))])
def test_matches_lax_conv_forward_and_grads(stride, pad):
    """Single-device: forward bitwise, grads allclose vs the lax conv."""
    g = 4
    x = jax.random.normal(jax.random.key(0), (4, 37, 16))
    w = jax.random.normal(jax.random.key(1), (5, 4, 16)) * 0.1

    y0 = _lax_conv(x, w, stride, (pad,), g)
    y1 = grouped_conv1d(x, w, stride, (pad,), g)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    loss0 = lambda w, x: jnp.sum(jnp.tanh(_lax_conv(x, w, stride, (pad,), g)) ** 2)
    loss1 = lambda w, x: jnp.sum(jnp.tanh(grouped_conv1d(x, w, stride, (pad,), g)) ** 2)
    gw0, gx0 = jax.jit(jax.grad(loss0, argnums=(0, 1)))(w, x)
    gw1, gx1 = jax.jit(jax.grad(loss1, argnums=(0, 1)))(w, x)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-5, atol=1e-6)


def test_lax_grouped_conv_weight_grad_bug_documented():
    """The underlying XLA bug: batch-sharded input on a ('data','model')
    mesh doubles the lax grouped conv's weight grad.  If this starts
    PASSING at ratio 1.0 after a jax upgrade, the workaround in
    conv_safe.py can be retired."""
    mesh = _mesh((4, 2), ("data", "model"))
    g = 4
    x = jax.random.normal(jax.random.key(0), (8, 32, 16))
    w = jax.random.normal(jax.random.key(1), (5, 4, 16)) * 0.1
    loss = lambda w, x: jnp.sum(_lax_conv(x, w, 1, "SAME", g) ** 2)
    g0 = jax.jit(jax.grad(loss))(w, x)
    sh = NamedSharding(mesh, P("data"))
    g1 = jax.jit(jax.grad(loss), in_shardings=(None, sh))(w, jax.device_put(x, sh))
    ratio = float(jnp.linalg.norm(g1) / jnp.linalg.norm(g0))
    assert ratio == pytest.approx(2.0, rel=1e-3), (
        f"XLA grouped-conv dw bug ratio changed: {ratio} — if 1.0, the "
        "conv_safe workaround is obsolete"
    )


@pytest.mark.parametrize(
    "shape,names",
    [((4, 2), ("data", "model")), ((2, 2, 2), ("data", "pipe", "model"))],
)
def test_safe_conv_weight_grad_correct_on_mesh(shape, names):
    """grouped_conv1d's dw is partition-invariant: batch-sharded input
    on meshes with replicated axes matches the unsharded grad."""
    mesh = _mesh(shape, names)
    g = 4
    x = jax.random.normal(jax.random.key(0), (8, 32, 16))
    w = jax.random.normal(jax.random.key(1), (5, 4, 16)) * 0.1
    loss = lambda w, x: jnp.sum(grouped_conv1d(x, w, 1, ((2, 2),), g) ** 2)
    g0 = jax.jit(jax.grad(loss))(w, x)
    sh = NamedSharding(mesh, P("data"))
    g1 = jax.jit(jax.grad(loss), in_shardings=(None, sh))(w, jax.device_put(x, sh))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6
    )


def test_bf16_dw_accumulates_f32():
    """bf16 operands: dw computed with f32 accumulation, returned bf16."""
    g = 4
    x = jax.random.normal(jax.random.key(0), (4, 32, 16)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.key(1), (5, 4, 16)) * 0.1).astype(
        jnp.bfloat16
    )
    loss = lambda w: jnp.sum(
        grouped_conv1d(x, w, 1, ((2, 2),), g).astype(jnp.float32) ** 2
    )
    gw = jax.jit(jax.grad(loss))(w)
    assert gw.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(gw, np.float32)))
