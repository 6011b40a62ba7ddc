"""End-to-end slice: synthetic corpus -> TrainPipeline -> jitted train step
(device aug + fbank in-graph) -> embedding extraction -> trial scoring ->
EER.  The learned embeddings must separate synthetic speakers far better
than chance.  This exercises every layer of the stack the way the
reference's recipe stages 3-6 do (examples/voxceleb/v2/run.sh)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wespeaker_hubert_tpu.backend import eer_from_scores, trial_cosine_scores
from wespeaker_hubert_tpu.data import (
    EvalPipeline,
    load_data_list,
    TrainPipeline,
    TrainPipelineConfig,
    write_wav,
)
from wespeaker_hubert_tpu.models import get_projection
from wespeaker_hubert_tpu.models.ecapa_tdnn import EcapaTdnn
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    MarginSchedule,
    create_train_state,
    make_eval_embed,
    make_optimizer,
    make_train_step,
)

N_SPK = 6


def _spk_wav(rng, spk, n):
    """Speaker identity = fixed formant-like sine stack + noise."""
    t = np.arange(n) / 16000.0
    freqs = 300.0 + 97.0 * spk + 13.0 * np.arange(3) * (spk + 1)
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) for f in freqs)
    x = x / 3.0 + rng.standard_normal(n) * 0.05
    return (x * 0.3).clip(-1, 1).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    train_entries, eval_entries = [], []
    for spk in range(N_SPK):
        for u in range(10):
            n = int(rng.integers(17000, 33000))
            key = f"s{spk}u{u}"
            path = str(root / f"{key}.wav")
            write_wav(path, _spk_wav(rng, spk, n))
            e = {"key": key, "wav": path, "spk": f"s{spk}"}
            (train_entries if u < 7 else eval_entries).append(e)
    train_list = root / "train.list"
    eval_list = root / "eval.list"
    for path, entries in [(train_list, train_entries), (eval_list, eval_entries)]:
        with open(path, "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")
    return {
        "train_list": str(train_list),
        "eval_list": str(eval_list),
        "eval_keys": [e["key"] for e in eval_entries],
        "spk_of": {e["key"]: e["spk"] for e in eval_entries},
    }


def test_train_extract_score_eer(corpus):
    spk2id = {f"s{i}": i for i in range(N_SPK)}
    backbone = EcapaTdnn(channels=64, feat_dim=40, embed_dim=32)
    projection = get_projection(
        {
            "project_type": "arc_margin",
            "embed_dim": 32,
            "num_class": N_SPK,
            "scale": 32.0,
            "easy_margin": False,
        }
    )
    net = SpeakerNet(backbone=backbone, projection=projection)

    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(num_mel_bins=40, dither=1.0),
        spec_aug=True,
    )
    epoch_iter = 5
    lr = ExponentialDecrease(
        num_epochs=30, epoch_iter=epoch_iter, initial_lr=0.1, final_lr=0.01,
        warm_up_epoch=2, scale_ratio=1.0,
    )
    margin = MarginSchedule(
        epoch_iter=epoch_iter, increase_start_epoch=4, fix_start_epoch=8,
        initial_margin=0.0, final_margin=0.1,
    )
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)

    pipe = TrainPipeline(
        load_data_list(corpus["train_list"]),
        spk2id,
        TrainPipelineConfig(
            num_frms=100, batch_size=14, shuffle_size=32, aug_prob=0.0,
            filter_min_frames=50, speed_perturb=False,
        ),
    )

    state = None
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg)
    losses = []
    for epoch in range(30):
        pipe.set_epoch(epoch)
        for batch in pipe:
            if state is None:
                feats_ex = jnp.zeros((14, 100, 40))
                state = create_train_state(
                    net, tx, jax.random.key(0), feats_ex, jnp.asarray(batch["label"])
                )
            state, metrics = step(state, batch, jax.random.key(7))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    # ---- extraction over bucketed whole utterances
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(num_mel_bins=40, dither=0.0), spec_aug=False
    )
    embed_fn = make_eval_embed(net, feature_cfg=eval_fcfg)
    embs, keys = [], []
    for batch in EvalPipeline(load_data_list(corpus["eval_list"]), batch_size=8):
        e = embed_fn(
            variables, {"wav": jnp.asarray(batch["wav"]),
                        "length": jnp.asarray(batch["length"])}
        )
        embs.append(np.asarray(e))
        keys += batch["keys"]
    emb = np.concatenate(embs)
    key2idx = {k: i for i, k in enumerate(keys)}

    # ---- all-pairs trials
    e_idx, t_idx, labels = [], [], []
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            e_idx.append(key2idx[ka])
            t_idx.append(key2idx[kb])
            labels.append(
                1 if corpus["spk_of"][ka] == corpus["spk_of"][kb] else 0
            )
    scores = trial_cosine_scores(emb, np.asarray(e_idx), np.asarray(t_idx))
    eer, mindcf, _ = eer_from_scores(scores, np.asarray(labels))
    # random = 0.5; the model must have learned real speaker structure
    assert eer < 0.25, f"EER {eer}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_train_with_speed_perturb_and_aug(corpus):
    """Full device-aug training path: speed perturb (x3 label space,
    device resample) + reverb/noise mixing + SpecAug, converging on the
    synthetic corpus."""
    from wespeaker_hubert_tpu.data import AugStore

    spk2id = {f"s{i}": i for i in range(N_SPK)}
    backbone = EcapaTdnn(channels=48, feat_dim=40, embed_dim=24)
    projection = get_projection(
        {
            "project_type": "arc_margin",
            "embed_dim": 24,
            "num_class": 3 * N_SPK,  # x3 for speed labels
            "scale": 32.0,
        }
    )
    net = SpeakerNet(backbone=backbone, projection=projection)
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(num_mel_bins=40, dither=1.0), spec_aug=True
    )
    lr = ExponentialDecrease(
        num_epochs=10, epoch_iter=5, initial_lr=0.08, final_lr=0.02,
        warm_up_epoch=1,
    )
    margin = MarginSchedule(
        epoch_iter=5, increase_start_epoch=3, fix_start_epoch=6,
        initial_margin=0.0, final_margin=0.1,
    )
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)

    rng = np.random.default_rng(9)
    noise_store = AugStore(
        arrays={
            "noise-a": (rng.standard_normal(20000) * 0.1).astype(np.float32),
            "music-b": (rng.standard_normal(30000) * 0.1).astype(np.float32),
        }
    )
    rir = np.zeros(2000, np.float32)
    rir[0] = 1.0
    rir[400] = 0.4
    rir_store = AugStore(arrays={"rir-1": rir})

    pipe = TrainPipeline(
        load_data_list(corpus["train_list"]),
        spk2id,
        TrainPipelineConfig(
            num_frms=100, batch_size=14, shuffle_size=32, aug_prob=0.5,
            filter_min_frames=50, speed_perturb=True,
        ),
        reverb_store=rir_store,
        noise_store=noise_store,
    )

    state = None
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg)
    losses = []
    seen_labels = set()
    for epoch in range(10):
        pipe.set_epoch(epoch)
        for batch in pipe:
            seen_labels.update(np.asarray(batch["label"]).tolist())
            if state is None:
                state = create_train_state(
                    net, tx, jax.random.key(0),
                    jnp.zeros((14, 100, 40)), jnp.asarray(batch["label"]),
                )
            state, metrics = step(state, batch, jax.random.key(7))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # the x3 speed label space was actually exercised
    assert max(seen_labels) >= N_SPK
