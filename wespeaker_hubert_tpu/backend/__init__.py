from .metrics import (
    compute_c_norm,
    compute_eer,
    compute_pmiss_pfa,
    eer_from_scores,
)
from .score import (
    apply_asnorm,
    cohort_mean_std,
    cosine_scores,
    l2_normalize,
    trial_cosine_scores,
)

__all__ = [
    "compute_c_norm",
    "compute_eer",
    "compute_pmiss_pfa",
    "eer_from_scores",
    "apply_asnorm",
    "cohort_mean_std",
    "cosine_scores",
    "l2_normalize",
    "trial_cosine_scores",
]
