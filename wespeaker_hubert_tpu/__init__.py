"""wespeaker_hubert_tpu — TPU-native speaker-embedding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of WeSpeaker
(reference: JunyiPeng00/wespeaker_hubert): speaker-verification training
(margin-softmax over large speaker inventories), embedding extraction,
trial scoring / AS-Norm / PLDA backends, and diarization — designed for
SPMD execution over TPU meshes (data-parallel batches, model-sharded
classifier head) rather than DDP process groups.

Layout:
  ops/       — audio DSP + compute kernels (fbank, cmvn, specaug, augment)
  models/    — functional model zoo (ECAPA, ResNet, ... + poolings + heads)
  parallel/  — mesh construction, sharding rules, collective helpers
  data/      — sharded input pipeline (manifest striping, chunking, host aug)
  train/     — train step, schedulers, train state, checkpointing
  backend/   — scoring (cosine/AS-Norm/PLDA), metrics (EER/minDCF/DET)
  diar/      — diarization (subsegmentation, clustering, RTTM)
  ssl/       — self-supervised wrappers (DINO/MoCo/SimCLR)
  cli/       — user-facing API
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS env request even when a site hook has
# pre-registered another backend (e.g. a TPU plugin registered by
# sitecustomize overrides JAX_PLATFORMS=cpu; tests and CPU-only tools set
# it deliberately).  No-op once a backend is already in use.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
