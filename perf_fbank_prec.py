"""A/B fbank matmul precision + dither cost in the full packed train step.

Trace attribution (perf_trace.py): the f32 'highest' DFT matmul
(fusion.1988) runs at 24 TF/s for 0.44 ms/step; 'high' (bf16_3x) and
'default' (bf16) trade exactness of the Kaldi-golden fbank for MXU
passes.  Run: python perf_fbank_prec.py <highest|high|default> [dither]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wespeaker_hubert_tpu.data.dataset import chunk_samples_for_frames
from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.ops.augment import speed_input_len
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease,
    MarginSchedule,
    create_train_state,
    make_optimizer,
    make_train_step,
)


def run(prec, dither, batch=128, num_frms=200, num_class=17982,
        loop_steps=8, iters=10):
    backbone = get_speaker_model("ECAPA_TDNN_GLOB_c1024")(
        feat_dim=80, embed_dim=192)
    projection = get_projection(
        {"project_type": "arc_margin", "embed_dim": 192,
         "num_class": num_class, "scale": 32.0})
    net = SpeakerNet(backbone=backbone, projection=projection)
    lr = ExponentialDecrease(num_epochs=150, epoch_iter=1000,
                             initial_lr=0.1, final_lr=5e-5, warm_up_epoch=6)
    margin = MarginSchedule(epoch_iter=1000, increase_start_epoch=20,
                            fix_start_epoch=40, initial_margin=0.0,
                            final_margin=0.2)
    tx = make_optimizer(lr, "SGD", weight_decay=1e-4)
    chunk = chunk_samples_for_frames(num_frms)
    in_len = speed_input_len(chunk)
    state = create_train_state(
        net, tx, jax.random.key(0),
        jnp.zeros((batch, num_frms, 80)), jnp.zeros((batch,), jnp.int32))
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(dither=dither, matmul_precision=prec),
        spec_aug=True)
    step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg,
                           chunk_samples=chunk, compute_dtype=jnp.bfloat16,
                           num_steps=loop_steps)
    rng = np.random.default_rng(0)
    n_rev = n_noise = int(batch * 0.6 / 2)
    b = {
        "wav": jnp.asarray(rng.standard_normal((batch, in_len)) * 0.1,
                           jnp.float32),
        "speed_idx": jnp.asarray(rng.integers(0, 3, batch), jnp.int32),
        "label": jnp.asarray(rng.integers(0, num_class, batch)),
        "rir": jnp.asarray(rng.standard_normal((n_rev, 8000)), jnp.float32),
        "noise": jnp.asarray(rng.standard_normal((n_noise, chunk)) * 0.05,
                             jnp.float32),
        "snr": jnp.full((n_noise,), 10.0, jnp.float32),
    }
    key = jax.random.key(1)
    b = {k: jnp.broadcast_to(v, (loop_steps,) + v.shape) for k, v in b.items()}
    st, m = step(state, b, key)
    float(m["loss"][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, b, key)
    float(m["loss"][-1])
    ms = (time.perf_counter() - t0) / (iters * loop_steps) * 1e3
    print(json.dumps({"prec": prec, "dither": dither,
                      "ms_per_step": round(ms, 2),
                      "audio_s_s": round(batch * 2 / ms * 1000, 0)}),
          flush=True)


if __name__ == "__main__":
    prec = sys.argv[1] if len(sys.argv) > 1 else "highest"
    dither = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    run(prec, dither)
