#!/usr/bin/env python
"""MoCo SSL recipe driver (reference examples/voxceleb/v3/moco/run.sh)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../../.."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from contrastive_runner import run

if __name__ == "__main__":
    run("moco", os.path.join(os.path.dirname(__file__), "conf/ecapa_tdnn.yaml"))
