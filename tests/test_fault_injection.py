"""Fault injection: SIGKILL the training CLI mid-epoch (a real crash, not
a cooperative stop), resume from the last periodic full-state save, and
the run must converge to the BIT-identical final state of an
uninterrupted run.  Completes the failure-recovery story (SURVEY §5;
the reference restarts whole epochs and has no such test)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from wespeaker_hubert_tpu.bin.train import train
from wespeaker_hubert_tpu.utils.config import dump_config

from tests.test_resume import _config, _leaves, _make_corpus


def test_sigkill_resume_bit_exact(tmp_path):
    root = tmp_path
    _make_corpus(root, np.random.default_rng(2))

    # run A: uninterrupted, in-process
    cfg_a = _config(root, str(root / "expA"), save_batch_interval=2)
    state_a = train(cfg_a)

    # run B: same config via the real CLI in a subprocess; SIGKILL it as
    # soon as a periodic mid-epoch save has landed
    exp_b = root / "expB"
    cfg_b = _config(root, str(exp_b), save_batch_interval=2)
    cfg_path = str(root / "confB.yaml")
    dump_config(cfg_b, cfg_path)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "wespeaker_hubert_tpu.bin.train",
         "--config", cfg_path],
        cwd=repo, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    state_path = exp_b / "models" / "train_state.ckpt"
    meta_path = exp_b / "models" / "train_state.ckpt.json"
    try:
        deadline = time.time() + 300
        killed_at = None
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill it — still a valid run
            if meta_path.exists() and state_path.exists():
                meta = json.load(open(meta_path))
                # a mid-epoch periodic save (not an end-of-epoch boundary)
                if meta.get("batch_in_epoch", 0) not in (0, 6):
                    killed_at = meta
                    proc.send_signal(signal.SIGKILL)
                    break
            time.sleep(0.2)
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)

    assert killed_at is not None, "never observed a mid-epoch save to kill at"

    # resume in-process from the crash state to completion
    state_b = train(_config(root, str(exp_b), save_batch_interval=2))

    assert int(state_a.step) == int(state_b.step)
    for la, lb in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(la, lb)

    # post-resume metric stream matches the uninterrupted run bit-exactly
    def metrics(exp):
        out = {}
        with open(root / exp / "metrics.jsonl") as f:
            for line in f:
                d = json.loads(line)
                out[d["step"]] = d["loss"]  # latest line per step wins
        return out

    ma, mb = metrics("expA"), metrics("expB")
    resume_from = killed_at["epoch"] * 6 + killed_at["batch_in_epoch"]
    after = {s: v for s, v in mb.items() if s > resume_from}
    assert after, "no post-resume metrics logged"
    for s, v in after.items():
        assert ma[s] == v, (s, ma[s], v)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
