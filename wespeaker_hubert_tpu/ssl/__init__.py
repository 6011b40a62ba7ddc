from .contrastive import (
    MoCoState,
    create_moco_state,
    info_nce_logits,
    make_moco_train_step,
    make_simclr_train_step,
)
from .dataset import SSLPipeline
from .dino import (
    DINOHead,
    DINONet,
    DINOState,
    cosine_schedule,
    create_dino_state,
    make_dino_train_step,
)

__all__ = [
    "MoCoState",
    "create_moco_state",
    "info_nce_logits",
    "make_moco_train_step",
    "make_simclr_train_step",
    "SSLPipeline",
    "DINOHead",
    "DINONet",
    "DINOState",
    "cosine_schedule",
    "create_dino_state",
    "make_dino_train_step",
]
