#!/usr/bin/env python
"""SimCLR SSL recipe driver (reference examples/voxceleb/v3/simclr/run.sh)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../../.."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from contrastive_runner import run

if __name__ == "__main__":
    run("simclr", os.path.join(os.path.dirname(__file__), "conf/ecapa_tdnn.yaml"))
