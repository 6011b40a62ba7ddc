"""SSL encoder parity tests: our flax HuBERT/WavLM vs the installed
HuggingFace torch implementations, on randomly initialized tiny configs
with imported weights.  This is the strongest offline golden available —
it validates every layer's math including WavLM's gated relative position
bias."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wespeaker_hubert_tpu.frontend import (
    SSLEncoder,
    SSLEncoderConfig,
    SSLFrontend,
    convert_hf_state_dict,
    feat_extract_output_lengths,
)

torch = pytest.importorskip("torch")


def _hf_config_kwargs(cfg: SSLEncoderConfig):
    return dict(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


def _run_pair(cfg, torch_model, wav):
    torch_model.eval()
    with torch.no_grad():
        out = torch_model(
            torch.from_numpy(wav), output_hidden_states=True
        )
    hf_hidden = [h.numpy() for h in out.hidden_states]

    params = convert_hf_state_dict(torch_model.state_dict(), cfg)
    model = SSLEncoder(cfg)
    ours, _ = model.apply({"params": params}, jnp.asarray(wav))
    return hf_hidden, [np.asarray(h) for h in ours]


class TestHubertParity:
    def test_base_style_post_ln(self):
        cfg = SSLEncoderConfig.tiny("hubert")
        from transformers import HubertConfig, HubertModel

        hf = HubertModel(HubertConfig(**_hf_config_kwargs(cfg)))
        wav = np.random.default_rng(0).standard_normal((2, 3200)).astype(
            np.float32
        )
        hf_hidden, ours = _run_pair(cfg, hf, wav)
        assert len(hf_hidden) == len(ours) == cfg.num_hidden_layers + 1
        for i, (a, b) in enumerate(zip(hf_hidden, ours)):
            np.testing.assert_allclose(
                a, b, atol=2e-4, rtol=1e-3,
                err_msg=f"hidden state {i} mismatch",
            )

    def test_large_style_pre_ln(self):
        cfg = SSLEncoderConfig.tiny("hubert", do_stable_layer_norm=True)
        cfg = SSLEncoderConfig(
            **{
                **cfg.__dict__,
                "feat_extract_norm": "layer",
            }
        )
        from transformers import HubertConfig, HubertModel

        hf = HubertModel(HubertConfig(**_hf_config_kwargs(cfg)))
        wav = np.random.default_rng(1).standard_normal((2, 3200)).astype(
            np.float32
        )
        hf_hidden, ours = _run_pair(cfg, hf, wav)
        # final state (post final-LN) must match
        np.testing.assert_allclose(
            hf_hidden[-1], ours[-1], atol=2e-4, rtol=1e-3
        )


class TestWav2Vec2Parity:
    def test_wav2vec2_imports_through_hubert_path(self):
        """wav2vec 2.0 (the reference s3prl upstream's third family):
        HF Wav2Vec2Model state_dicts convert and match layer by layer —
        its inference graph is the hubert architecture."""
        cfg = SSLEncoderConfig.tiny("hubert")
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        hf = Wav2Vec2Model(Wav2Vec2Config(**_hf_config_kwargs(cfg)))
        wav = np.random.default_rng(3).standard_normal((2, 3200)).astype(
            np.float32
        )
        hf_hidden, ours = _run_pair(cfg, hf, wav)
        assert len(hf_hidden) == len(ours) == cfg.num_hidden_layers + 1
        for i, (a, b) in enumerate(zip(hf_hidden, ours)):
            np.testing.assert_allclose(
                a, b, atol=2e-4, rtol=1e-3,
                err_msg=f"hidden state {i} mismatch",
            )

    def test_upstream_factories(self):
        c = SSLEncoderConfig.wav2vec2_base()
        assert c == SSLEncoderConfig.hubert_base()
        # 'wav2vec2_large' = the s3prl/lv60 variant (pre-LN)
        c = SSLEncoderConfig.wav2vec2_large()
        assert c == SSLEncoderConfig.hubert_large()
        assert c.hidden_size == 1024 and c.do_stable_layer_norm
        # facebook/wav2vec2-large (960h) is group-norm + post-LN
        c = SSLEncoderConfig.wav2vec2_large_960h()
        assert c.hidden_size == 1024 and not c.do_stable_layer_norm
        assert c.feat_extract_norm == "group"


class TestWavLMParity:
    def test_wavlm_gated_rel_pos(self):
        cfg = SSLEncoderConfig.tiny("wavlm")
        from transformers import WavLMConfig, WavLMModel

        kwargs = _hf_config_kwargs(cfg)
        kwargs.update(num_buckets=cfg.num_buckets, max_bucket_distance=cfg.max_distance)
        hf = WavLMModel(WavLMConfig(**kwargs))
        wav = np.random.default_rng(2).standard_normal((2, 3200)).astype(
            np.float32
        )
        hf_hidden, ours = _run_pair(cfg, hf, wav)
        for i, (a, b) in enumerate(zip(hf_hidden, ours)):
            np.testing.assert_allclose(
                a, b, atol=3e-4, rtol=1e-3,
                err_msg=f"hidden state {i} mismatch",
            )


class TestFrontend:
    def test_featurizer_shapes_and_freeze(self):
        cfg = SSLEncoderConfig.tiny("hubert")
        frontend = SSLFrontend(cfg, frozen=True)
        wav = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 3200)), jnp.float32
        )
        lengths = jnp.asarray([3200, 1600])
        variables = frontend.init(jax.random.key(0), wav, lengths)
        feats, fl = frontend.apply(variables, wav, lengths)
        want_t = int(feat_extract_output_lengths(cfg, 3200))
        assert feats.shape == (2, want_t, cfg.hidden_size)
        assert int(fl[0]) == want_t
        assert int(fl[1]) == int(feat_extract_output_lengths(cfg, 1600))

        # frozen: no gradient reaches the upstream
        def loss(params):
            f, _ = frontend.apply({"params": params}, wav, lengths)
            return jnp.sum(f**2)

        g = jax.grad(loss)(variables["params"])
        upstream_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["upstream"])
        )
        assert upstream_norm == 0.0
        assert float(jnp.abs(g["featurizer_weights"]).sum()) > 0

    def test_unfrozen_grads_flow(self):
        cfg = SSLEncoderConfig.tiny("hubert")
        frontend = SSLFrontend(cfg, frozen=False)
        wav = jnp.asarray(
            np.random.default_rng(4).standard_normal((1, 3200)), jnp.float32
        )
        variables = frontend.init(jax.random.key(0), wav)

        def loss(params):
            f, _ = frontend.apply({"params": params}, wav)
            return jnp.sum(f**2)

        g = jax.grad(loss)(variables["params"])
        upstream_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["upstream"])
        )
        assert upstream_norm > 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestLayerSelection:
    def test_single_layer_and_last_only(self):
        cfg = SSLEncoderConfig.tiny("hubert")
        wav = jnp.asarray(
            np.random.default_rng(5).standard_normal((1, 3200)), jnp.float32
        )
        # single-layer select == that encoder hidden state
        front = SSLFrontend(cfg, frozen=True, layer=1)
        v = front.init(jax.random.key(0), wav)
        feats, _ = front.apply(v, wav)
        from wespeaker_hubert_tpu.frontend import SSLEncoder

        enc = SSLEncoder(cfg)
        hidden, _ = enc.apply({"params": v["params"]["upstream"]}, wav)
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(hidden[1]), atol=1e-6
        )

        # multilayer_feature=False: only one featurizer weight
        front2 = SSLFrontend(cfg, frozen=True, multilayer_feature=False)
        v2 = front2.init(jax.random.key(0), wav)
        assert v2["params"]["featurizer_weights"].shape == (1,)


class TestAttnImpl:
    def test_flash_knob_falls_back_off_tpu(self):
        """attn_impl='flash' runs the Pallas kernel only on TPU; off-TPU
        it must produce the exact einsum-path outputs (same params)."""
        import dataclasses

        if jax.default_backend() not in ("cpu", "gpu"):
            pytest.skip("on TPU the flash path legitimately differs "
                        "(online-softmax numerics); this test locks the "
                        "off-TPU fallback only")

        cfg = SSLEncoderConfig.tiny(model_type="wavlm")
        rng = np.random.default_rng(0)
        wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
        model = SSLEncoder(cfg)
        params = model.init(jax.random.key(0), jnp.asarray(wav))["params"]
        ref, _ = model.apply({"params": params}, jnp.asarray(wav))
        flash_cfg = dataclasses.replace(cfg, attn_impl="flash")
        got, _ = SSLEncoder(flash_cfg).apply(
            {"params": params}, jnp.asarray(wav)
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_attn_impl_config_wiring(self):
        """dataset_args.s3prl_args.attn_impl reaches the encoder config
        (bin/train.build_speaker_net)."""
        from wespeaker_hubert_tpu.bin.train import build_speaker_net

        net = build_speaker_net({
            "model": "ECAPA_TDNN_c512",
            "model_args": {"embed_dim": 16},
            "dataset_args": {
                "frontend": "s3prl",
                "s3prl_args": {"upstream": "tiny", "attn_impl": "flash"},
            },
        }, num_class=2)
        assert net.frontend.cfg.attn_impl == "flash"
