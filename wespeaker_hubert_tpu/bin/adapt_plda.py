"""`python -m wespeaker_hubert_tpu.bin.adapt_plda` — see plda_bins.py."""
from .plda_bins import main_adapt as main  # noqa: F401

if __name__ == "__main__":
    main()
