"""Margin-softmax head tests: numerics vs independent numpy formulas
(ArcFace/CosFace math per the papers, matching reference
wespeaker/models/projections.py behavior)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.models.projections import (
    AddMarginProduct,
    ArcMarginIntertopkSubcenter,
    ArcMarginProduct,
    LinearProduct,
    SphereFace2,
    get_projection,
)

B, D, C = 8, 16, 20


def _setup(module):
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.standard_normal((B, D)), dtype=jnp.float32)
    label = jnp.asarray(rng.integers(0, C, B))
    variables = module.init(jax.random.key(1), embed, label, 0.0)
    return embed, label, variables


def _np_cosine(embed, weight):
    e = embed / np.linalg.norm(embed, axis=1, keepdims=True)
    w = weight / np.linalg.norm(weight, axis=0, keepdims=True)
    return e @ w


class TestArcMargin:
    def test_zero_margin_is_scaled_cosine(self):
        head = ArcMarginProduct(D, C, scale=32.0)
        embed, label, variables = _setup(head)
        logits, aux = head.apply(variables, embed, label, 0.0)
        cos = _np_cosine(np.asarray(embed), np.asarray(variables["params"]["weight"]))
        np.testing.assert_allclose(np.asarray(logits), 32.0 * cos, rtol=1e-5, atol=1e-5)
        assert aux is None

    def test_margin_matches_numpy_formula(self):
        m = 0.2
        head = ArcMarginProduct(D, C, scale=32.0)
        embed, label, variables = _setup(head)
        logits, _ = head.apply(variables, embed, label, m)

        cos = _np_cosine(np.asarray(embed), np.asarray(variables["params"]["weight"]))
        sin = np.sqrt(np.clip(1 - cos**2, 0, 1))
        phi = cos * math.cos(m) - sin * math.sin(m)
        th = math.cos(math.pi - m)
        mmm = 1.0 + math.cos(math.pi - m)
        phi = np.where(cos > th, phi, cos - mmm)
        want = cos.copy()
        want[np.arange(B), np.asarray(label)] = phi[np.arange(B), np.asarray(label)]
        np.testing.assert_allclose(np.asarray(logits), 32.0 * want, rtol=1e-5, atol=1e-5)

    def test_margin_lowers_target_logit(self):
        head = ArcMarginProduct(D, C, scale=32.0)
        embed, label, variables = _setup(head)
        l0, _ = head.apply(variables, embed, label, 0.0)
        l2, _ = head.apply(variables, embed, label, 0.2)
        rows = np.arange(B)
        lab = np.asarray(label)
        assert (np.asarray(l2)[rows, lab] <= np.asarray(l0)[rows, lab] + 1e-5).all()
        off = np.ones((B, C), bool)
        off[rows, lab] = False
        np.testing.assert_allclose(
            np.asarray(l2)[off], np.asarray(l0)[off], rtol=1e-6
        )


class TestSubcenterIntertopk:
    def test_subcenter_max(self):
        K = 3
        head = ArcMarginIntertopkSubcenter(D, C, K=K, k_top=0, mp=0.0)
        embed, label, variables = _setup(head)
        logits, _ = head.apply(variables, embed, label, 0.0)
        cos = _np_cosine(np.asarray(embed), np.asarray(variables["params"]["weight"]))
        cos = cos.reshape(B, C, K).max(-1)
        np.testing.assert_allclose(np.asarray(logits), 32.0 * cos, rtol=1e-5, atol=1e-5)

    def test_intertopk_penalty(self):
        m, mp, k_top = 0.2, 0.06, 5
        head = ArcMarginIntertopkSubcenter(D, C, K=1, k_top=k_top, mp=mp)
        embed, label, variables = _setup(head)
        logits, _ = head.apply(variables, embed, label, m)
        l_nom, _ = head.apply(
            variables.copy(), embed, label, m,
        )
        # penalty raises exactly k_top non-target logits vs plain arcmargin
        plain = ArcMarginProduct(D, C, scale=32.0)
        pv = {"params": {"weight": variables["params"]["weight"]}}
        base, _ = plain.apply(pv, embed, label, m)
        diff = np.asarray(logits) - np.asarray(base)
        rows = np.arange(B)
        lab = np.asarray(label)
        assert np.allclose(diff[rows, lab], 0, atol=1e-5)
        n_raised = (diff > 1e-6).sum(axis=1)
        assert (n_raised == k_top).all()

    def test_do_lm_disables_penalty(self):
        head = ArcMarginIntertopkSubcenter(D, C, K=1, k_top=5, mp=0.06, do_lm=True)
        embed, label, variables = _setup(head)
        logits, _ = head.apply(variables, embed, label, 0.2)
        plain = ArcMarginProduct(D, C, scale=32.0)
        pv = {"params": {"weight": variables["params"]["weight"]}}
        base, _ = plain.apply(pv, embed, label, 0.2)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(base), atol=1e-5)


class TestAddMargin:
    def test_formula(self):
        m = 0.25
        head = AddMarginProduct(D, C, scale=32.0)
        embed, label, variables = _setup(head)
        logits, _ = head.apply(variables, embed, label, m)
        cos = _np_cosine(np.asarray(embed), np.asarray(variables["params"]["weight"]))
        want = cos.copy()
        rows, lab = np.arange(B), np.asarray(label)
        want[rows, lab] -= m
        np.testing.assert_allclose(np.asarray(logits), 32.0 * want, rtol=1e-5, atol=1e-5)


class TestSphereFace2:
    def test_returns_loss(self):
        head = SphereFace2(D, C)
        embed, label, variables = _setup(head)
        logits, loss = head.apply(variables, embed, label, 0.1)
        assert logits.shape == (B, C)
        assert loss.shape == ()
        assert np.isfinite(float(loss))

    def test_loss_lower_for_aligned_embedding(self):
        head = SphereFace2(D, C)
        embed, label, variables = _setup(head)
        w = np.asarray(variables["params"]["weight"])
        lab = np.asarray(label)
        aligned = jnp.asarray(w[:, lab].T * 10.0)
        _, loss_aligned = head.apply(variables, aligned, label, 0.1)
        _, loss_rand = head.apply(variables, embed, label, 0.1)
        assert float(loss_aligned) < float(loss_rand)


class TestLinear:
    def test_shapes(self):
        head = LinearProduct(D, C)
        rng = np.random.default_rng(0)
        embed = jnp.asarray(rng.standard_normal((B, D)), dtype=jnp.float32)
        variables = head.init(jax.random.key(0), embed)
        logits, aux = head.apply(variables, embed)
        assert logits.shape == (B, C)
        assert aux is None


def test_get_projection_dispatch():
    for ptype, cls in [
        ("arc_margin", ArcMarginProduct),
        ("add_margin", AddMarginProduct),
        ("arc_margin_intertopk_subcenter", ArcMarginIntertopkSubcenter),
        ("sphereface2", SphereFace2),
        ("linear", LinearProduct),
    ]:
        head = get_projection(
            {"project_type": ptype, "embed_dim": D, "num_class": C, "scale": 32.0}
        )
        assert isinstance(head, cls)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
