"""Golden tests: margin-softmax heads vs the live torch reference
(VERDICT r1 #5).  Reference projection modules are instantiated with
random weights, converted (transpose to classes-last), and logits must
match in f32; bf16 embeddings must stay within mixed-precision tolerance
(the heads upcast to f32 internally — projections._cosine_logits).

Reference: wespeaker/models/projections.py (ArcMarginProduct:169,
ArcMarginProduct_intertopk_subcenter:243, AddMarginProduct:369,
SphereProduct:411, SphereFace2:66).
"""

import math
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "wespeaker")),
    reason="reference checkout unavailable",
)

B, D, C = 16, 64, 37
MARGINS = (0.0, 0.1, 0.2)


@pytest.fixture(scope="module")
def ref_proj():
    if "wespeaker" not in sys.modules or not hasattr(
        sys.modules.get("wespeaker"), "__path__"
    ):
        pkg = types.ModuleType("wespeaker")
        pkg.__path__ = [os.path.join(REF, "wespeaker")]
        sys.modules["wespeaker"] = pkg
    sys.path.insert(0, REF)
    import wespeaker.models.projections as rp

    return rp


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    embed = rng.standard_normal((B, D)).astype(np.float32)
    label = rng.integers(0, C, B).astype(np.int64)
    return embed, label


def _mmm_edge_embed(weight_t, label):
    """Embeddings pointing AWAY from their target class weight so
    cos(theta) <= cos(pi - m) — exercises the `cosine - mmm` branch
    (reference projections.py:199 continuity fix)."""
    w = weight_t / np.linalg.norm(weight_t, axis=1, keepdims=True)
    return (-w[label] + 0.001).astype(np.float32)


class TestArcMargin:
    @pytest.mark.parametrize("margin", MARGINS)
    @pytest.mark.parametrize("easy", [False, True])
    def test_logit_parity_f32(self, ref_proj, data, margin, easy):
        from wespeaker_hubert_tpu.models.projections import ArcMarginProduct

        embed, label = data
        torch.manual_seed(0)
        ref = ref_proj.ArcMarginProduct(D, C, scale=32.0, margin=margin,
                                        easy_margin=easy)
        ref.update(margin)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()

        ours = ArcMarginProduct(D, C, scale=32.0, easy_margin=easy)
        params = {"weight": jnp.asarray(ref.weight.detach().numpy().T)}
        logits, aux = ours.apply(
            {"params": params}, jnp.asarray(embed), jnp.asarray(label), margin
        )
        assert aux is None
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4
        )

    def test_mmm_edge_parity(self, ref_proj, data):
        """Antipodal embeddings take the cosine - mmm branch."""
        from wespeaker_hubert_tpu.models.projections import ArcMarginProduct

        _, label = data
        torch.manual_seed(1)
        margin = 0.2
        ref = ref_proj.ArcMarginProduct(D, C, scale=32.0, margin=margin)
        ref.update(margin)
        w_t = ref.weight.detach().numpy()
        embed = _mmm_edge_embed(w_t, label)
        # confirm the branch actually triggers
        cos = embed / np.linalg.norm(embed, axis=1, keepdims=True)
        wn = w_t / np.linalg.norm(w_t, axis=1, keepdims=True)
        target_cos = np.sum(cos * wn[label], axis=1)
        assert (target_cos <= math.cos(math.pi - margin)).any()

        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()
        ours = ArcMarginProduct(D, C, scale=32.0)
        logits, _ = ours.apply(
            {"params": {"weight": jnp.asarray(w_t.T)}},
            jnp.asarray(embed), jnp.asarray(label), margin,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4
        )

    def test_bf16_embed_tolerance(self, ref_proj, data):
        """bf16 embeddings (mixed-precision train path): logits still match
        the f32 torch reference to bf16 input precision."""
        from wespeaker_hubert_tpu.models.projections import ArcMarginProduct

        embed, label = data
        torch.manual_seed(0)
        margin = 0.2
        ref = ref_proj.ArcMarginProduct(D, C, scale=32.0, margin=margin)
        ref.update(margin)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()
        ours = ArcMarginProduct(D, C, scale=32.0)
        logits, _ = ours.apply(
            {"params": {"weight": jnp.asarray(
                ref.weight.detach().numpy().T)}},
            jnp.asarray(embed, jnp.bfloat16), jnp.asarray(label), margin,
        )
        assert logits.dtype == jnp.float32  # upcast inside the head
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=0.05, atol=0.35
        )
        # ranking preserved: target-class logit ordering agrees
        assert (
            np.argmax(np.asarray(logits), 1) == np.argmax(ref_logits, 1)
        ).mean() > 0.9


class TestSubcenterIntertopk:
    @pytest.mark.parametrize("margin", MARGINS)
    @pytest.mark.parametrize("do_lm", [False, True])
    def test_logit_parity(self, ref_proj, data, margin, do_lm):
        from wespeaker_hubert_tpu.models.projections import (
            ArcMarginIntertopkSubcenter,
        )

        embed, label = data
        torch.manual_seed(0)
        ref = ref_proj.ArcMarginProduct_intertopk_subcenter(
            D, C, scale=32.0, margin=margin, easy_margin=False,
            K=3, mp=0.06, k_top=5, do_lm=do_lm,
        )
        ref.update(margin)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()
        ours = ArcMarginIntertopkSubcenter(
            D, C, scale=32.0, K=3, mp=0.06, k_top=5, do_lm=do_lm
        )
        logits, _ = ours.apply(
            {"params": {"weight": jnp.asarray(
                ref.weight.detach().numpy().T)}},
            jnp.asarray(embed), jnp.asarray(label), margin,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4
        )


class TestAddMargin:
    @pytest.mark.parametrize("margin", MARGINS)
    def test_logit_parity(self, ref_proj, data, margin):
        from wespeaker_hubert_tpu.models.projections import AddMarginProduct

        embed, label = data
        torch.manual_seed(0)
        ref = ref_proj.AddMarginProduct(D, C, scale=32.0, margin=margin)
        ref.update(margin)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()
        ours = AddMarginProduct(D, C, scale=32.0)
        logits, _ = ours.apply(
            {"params": {"weight": jnp.asarray(
                ref.weight.detach().numpy().T)}},
            jnp.asarray(embed), jnp.asarray(label), margin,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4
        )


class TestSphereFace2:
    @pytest.mark.parametrize("margin", MARGINS)
    @pytest.mark.parametrize("mtype", ["A", "C"])
    def test_logits_and_loss_parity(self, ref_proj, data, margin, mtype):
        from wespeaker_hubert_tpu.models.projections import SphereFace2

        embed, label = data
        torch.manual_seed(0)
        ref = ref_proj.SphereFace2(D, C, scale=32.0, margin=margin,
                                   lanbuda=0.7, t=3, margin_type=mtype)
        ref.update(margin)
        with torch.no_grad():
            ref_logits, ref_loss = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            )
        ours = SphereFace2(D, C, scale=32.0, lanbuda=0.7, t=3.0,
                           margin_type=mtype)
        params = {
            "weight": jnp.asarray(ref.weight.detach().numpy().T),
            "bias": jnp.asarray(ref.bias.detach().numpy()),
        }
        logits, loss = ours.apply(
            {"params": params}, jnp.asarray(embed), jnp.asarray(label), margin
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            float(loss), float(ref_loss), rtol=1e-4, atol=1e-4
        )


class TestSphere:
    def test_logit_parity_first_iter(self, ref_proj, data):
        from wespeaker_hubert_tpu.models.projections import SphereProduct

        embed, label = data
        torch.manual_seed(0)
        ref = ref_proj.SphereProduct(D, C, margin=4)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label)
            ).numpy()  # ref increments iter to 1 inside forward
        ours = SphereProduct(D, C, margin=4)
        logits, _ = ours.apply(
            {"params": {"weight": jnp.asarray(
                ref.weight.detach().numpy().T)}},
            jnp.asarray(embed), jnp.asarray(label), 0.0, it=ref.iter,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-4
        )


class TestShardedHeadVsTorch:
    @pytest.mark.parametrize("margin", MARGINS)
    def test_loss_parity_at_margin_ramp(self, ref_proj, data, margin):
        """The explicit shard_map head's loss over the 8-device mesh must
        equal torch CE over the reference ArcMargin logits."""
        import torch.nn.functional as F

        from wespeaker_hubert_tpu.parallel.mesh import make_mesh
        from wespeaker_hubert_tpu.parallel.sharded_head import (
            make_sharded_arcmargin_loss,
        )

        embed, label = data
        c = 40  # divisible by model axis
        torch.manual_seed(0)
        ref = ref_proj.ArcMarginProduct(D, c, scale=32.0, margin=margin)
        ref.update(margin)
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(embed), torch.from_numpy(label % c)
            )
            ref_loss = float(F.cross_entropy(
                ref_logits, torch.from_numpy(label % c)))

        mesh = make_mesh(model_parallel=4)
        loss_fn = make_sharded_arcmargin_loss(mesh, c, scale=32.0)
        w = jnp.asarray(ref.weight.detach().numpy().T)
        loss, acc = loss_fn(
            jnp.asarray(embed), w, jnp.asarray(label % c), margin
        )
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
