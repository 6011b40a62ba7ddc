"""Utility-layer tests: schedules (TriAngular2 cyclic shape, warmup
coefficients), config overrides, checkpoint partial loads, observability
meters."""

import numpy as np
import pytest

from wespeaker_hubert_tpu.train.schedulers import (
    ExponentialDecrease,
    MarginSchedule,
    TriAngular2,
    get_lr_schedule,
)
from wespeaker_hubert_tpu.utils.config import (
    apply_overrides,
    dump_config,
    load_config,
    parse_config_or_kwargs,
)
from wespeaker_hubert_tpu.utils.observability import (
    MetricsLogger,
    ThroughputMeter,
    Timer,
)


class TestTriAngular2:
    def test_cyclic_shape(self):
        s = TriAngular2(
            num_epochs=8, epoch_iter=100, initial_lr=0.6, final_lr=0.1,
            warm_up_epoch=0, cycle_step=2, reduce_lr_diff_ratio=0.5,
        )
        # cycle = 200 iters, step_size 100: rises to max at 100, back at 200
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(100)) == pytest.approx(0.6)
        assert float(s(199)) == pytest.approx(0.105, abs=1e-3)
        # second cycle peak halves the gap: 0.1 + 0.5*0.5 = 0.35
        assert float(s(300)) == pytest.approx(0.35)

    def test_dispatch(self):
        s = get_lr_schedule(
            "TriAngular2", num_epochs=2, epoch_iter=10, initial_lr=0.1,
            final_lr=0.01,
        )
        assert float(s(0)) >= 0
        with pytest.raises(ValueError):
            get_lr_schedule("Nope")


class TestWarmup:
    def test_warm_from_zero(self):
        s = ExponentialDecrease(
            num_epochs=10, epoch_iter=10, initial_lr=0.1, final_lr=0.01,
            warm_up_epoch=2, scale_ratio=4.0, warm_from_zero=True,
        )
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(10)) > 0
        # after warmup the x4 multi-process scale applies
        assert float(s(20)) == pytest.approx(
            4.0 * 0.1 * np.exp((20 / 100) * np.log(0.1)), rel=1e-4
        )

    def test_scale_gt_one_ramp(self):
        s = ExponentialDecrease(
            num_epochs=10, epoch_iter=10, initial_lr=0.1, final_lr=0.01,
            warm_up_epoch=2, scale_ratio=4.0, warm_from_zero=False,
        )
        # starts at 1x, ramps to 4x
        assert float(s(0)) == pytest.approx(0.1, rel=1e-5)


class TestMarginScheduleEdge:
    def test_update_margin_false(self):
        m = MarginSchedule(
            epoch_iter=10, increase_start_epoch=1, fix_start_epoch=2,
            initial_margin=0.05, final_margin=0.3, update_margin=False,
        )
        assert float(m(0)) == pytest.approx(0.05)
        assert float(m(1000)) == pytest.approx(0.05)

    def test_linear_type(self):
        m = MarginSchedule(
            epoch_iter=10, increase_start_epoch=1, fix_start_epoch=3,
            initial_margin=0.0, final_margin=0.2, increase_type="linear",
        )
        assert float(m(10)) == pytest.approx(0.1)


class TestConfig:
    def test_roundtrip_and_overrides(self, tmp_path):
        p = str(tmp_path / "c.yaml")
        dump_config({"a": {"b": 1}, "lr": 0.1}, p)
        cfg = load_config(p)
        assert cfg["a"]["b"] == 1
        cfg2 = apply_overrides(cfg, ["a.b=2", "new.key=hello", "lr=0.05"])
        assert cfg2["a"]["b"] == 2
        assert cfg2["new"]["key"] == "hello"
        assert cfg2["lr"] == 0.05
        assert cfg["a"]["b"] == 1  # original untouched

        cfg3 = parse_config_or_kwargs(p, overrides=["lr=1e-3"], exp_dir="x")
        assert cfg3["lr"] == pytest.approx(1e-3)
        assert cfg3["exp_dir"] == "x"

    def test_bad_override(self):
        with pytest.raises(ValueError):
            apply_overrides({}, ["noequalsign"])


class TestObservability:
    def test_throughput_meter(self):
        m = ThroughputMeter()
        for _ in range(5):
            m.update(10.0, 2)
        assert m.audio_seconds_per_s > 0
        assert m.rtf == pytest.approx(1.0 / m.audio_seconds_per_s)
        t = m.totals()
        assert t["total_audio_seconds"] == pytest.approx(50.0)
        assert t["total_steps"] == 10

    def test_metrics_logger(self, tmp_path):
        import json

        p = str(tmp_path / "m.jsonl")
        log = MetricsLogger(p)
        log.log(1, loss=0.5, tag="x")
        log.log(2, loss=0.25)
        log.close()
        lines = [json.loads(ln) for ln in open(p)]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert lines[1]["loss"] == 0.25

    def test_timer(self):
        t = Timer()
        assert t.elapsed() >= 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_file_utils(tmp_path):
    from wespeaker_hubert_tpu.utils.file_utils import (
        read_lists,
        read_scp,
        read_table,
    )

    p = tmp_path / "wav.scp"
    p.write_text("utt1 /a/b.wav\nutt2 /c/d.wav\n\n")
    assert read_scp(str(p)) == [("utt1", "/a/b.wav"), ("utt2", "/c/d.wav")]

    p2 = tmp_path / "x.list"
    p2.write_text("a\nb\n\nc\n")
    assert read_lists(str(p2)) == ["a", "b", "c"]

    p3 = tmp_path / "trials"
    p3.write_text("e1 t1 target\ne2 t2 nontarget\n")
    assert read_table(str(p3)) == [
        ["e1", "t1", "target"], ["e2", "t2", "nontarget"]
    ]
