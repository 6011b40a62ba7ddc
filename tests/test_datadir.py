"""Kaldi-style data-dir utilities (bin/datadir.py): the roles of the
reference's tools/{filter_scp.pl, utt2spk_to_spk2utt.pl,
spk2utt_to_utt2spk.pl, fix_data_dir.sh, subset_data_dir.sh,
combine_data.sh, copy_data_dir.sh}."""

import os
import subprocess
import sys

import pytest

from wespeaker_hubert_tpu.bin.datadir import (
    combine_data,
    copy_data_dir,
    filter_scp,
    fix_data_dir,
    spk2utt_to_utt2spk,
    subset_data_dir,
    utt2spk_to_spk2utt,
)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _read(path):
    return [ln.rstrip("\n") for ln in open(path) if ln.strip()]


def _make_dir(d, utts, with_dur=True):
    """utts: list of (utt, spk[, dur])."""
    os.makedirs(d, exist_ok=True)
    _write(os.path.join(d, "wav.scp"), [f"{u} /wav/{u}.wav" for u, *_ in utts])
    _write(os.path.join(d, "utt2spk"), [f"{u} {s}" for u, s, *_ in utts])
    if with_dur:
        _write(
            os.path.join(d, "utt2dur"),
            [f"{u} {r[0] if r else 1.0}" for u, s, *r in utts],
        )
    return d


def test_filter_scp_field_and_exclude():
    lines = ["a x1", "b x2", "c x3"]
    assert filter_scp(["a", "c"], lines) == ["a x1", "c x3"]
    assert filter_scp(["a", "c"], lines, exclude=True) == ["b x2"]
    # -f 2 filters on the second token (reference filter_scp.pl -f)
    assert filter_scp(["x2"], lines, field=2) == ["b x2"]
    # id_list entries may be whole lines: first token counts
    assert filter_scp(["a extra stuff"], lines) == ["a x1"]


def test_spk2utt_round_trip():
    u2s = ["u1 s1", "u2 s2", "u3 s1"]
    s2u = utt2spk_to_spk2utt(u2s)
    assert s2u == ["s1 u1 u3", "s2 u2"]
    assert spk2utt_to_utt2spk(s2u) == sorted(u2s)


def test_fix_data_dir_intersects_and_sorts(tmp_path):
    d = str(tmp_path / "d")
    _make_dir(d, [("u2", "s1"), ("u1", "s1"), ("u3", "s2")])
    # wav.scp is missing u3 -> fix must drop it everywhere
    _write(os.path.join(d, "wav.scp"), ["u2 /wav/u2.wav", "u1 /wav/u1.wav"])
    n = fix_data_dir(d)
    assert n == 2
    assert _read(os.path.join(d, "utt2spk")) == ["u1 s1", "u2 s1"]
    assert _read(os.path.join(d, "wav.scp")) == [
        "u1 /wav/u1.wav", "u2 /wav/u2.wav",
    ]
    assert _read(os.path.join(d, "spk2utt")) == ["s1 u1 u2"]


def test_fix_partial_utt2dur_filters_but_never_drops(tmp_path):
    """A partial auxiliary table (utt2dur/vad.scp) must not shrink the
    dataset — kaldi's fix_data_dir.sh only intersects over the
    sample-defining tables."""
    d = str(tmp_path / "d")
    _make_dir(d, [("u1", "s1"), ("u2", "s1"), ("u3", "s2")])
    _write(os.path.join(d, "utt2dur"), ["u1 1.0"])  # partial
    assert fix_data_dir(d) == 3
    assert len(_read(os.path.join(d, "utt2spk"))) == 3
    assert _read(os.path.join(d, "utt2dur")) == ["u1 1.0"]


def test_combine_rejects_duplicate_utts(tmp_path):
    a = _make_dir(str(tmp_path / "a"), [("u1", "s1")])
    b = _make_dir(str(tmp_path / "b"), [("u1", "s2")])
    with pytest.raises(ValueError, match="duplicate utt ids"):
        combine_data(str(tmp_path / "ab"), [a, b])


def test_subset_last_n_zero_is_empty(tmp_path):
    src = _make_dir(str(tmp_path / "src"), [("u1", "s1"), ("u2", "s1")])
    assert subset_data_dir(src, str(tmp_path / "z"), n=0, mode="last") == 0


def test_subset_modes(tmp_path):
    src = _make_dir(
        str(tmp_path / "src"),
        [(f"u{i}", f"s{i % 3}", float(10 - i)) for i in range(9)],
    )
    fix_data_dir(src)

    assert subset_data_dir(src, str(tmp_path / "first"), n=4, mode="first") == 4
    assert _read(str(tmp_path / "first" / "utt2spk"))[0].startswith("u0")

    assert subset_data_dir(src, str(tmp_path / "last"), n=2, mode="last") == 2
    assert {ln.split()[0] for ln in _read(str(tmp_path / "last" / "utt2spk"))} \
        == {"u7", "u8"}

    # shortest uses utt2dur (durations decrease with i -> u8, u7 shortest)
    assert subset_data_dir(
        src, str(tmp_path / "short"), n=2, mode="shortest"
    ) == 2
    assert {ln.split()[0] for ln in _read(str(tmp_path / "short" / "utt2spk"))} \
        == {"u7", "u8"}

    # per-spk: 1 utt per speaker -> 3 utts
    assert subset_data_dir(
        src, str(tmp_path / "perspk"), n=1, mode="per-spk"
    ) == 3

    # speakers: whole speakers until >= n utts (3 per spk -> 1 spk = 3)
    n = subset_data_dir(src, str(tmp_path / "spks"), n=3, mode="speakers")
    assert n == 3
    spks = {ln.split()[1] for ln in _read(str(tmp_path / "spks" / "utt2spk"))}
    assert len(spks) == 1

    # random is seed-deterministic
    a = subset_data_dir(src, str(tmp_path / "r1"), n=4, mode="random", seed=7)
    subset_data_dir(src, str(tmp_path / "r2"), n=4, mode="random", seed=7)
    assert a == 4
    assert _read(str(tmp_path / "r1" / "utt2spk")) == _read(
        str(tmp_path / "r2" / "utt2spk")
    )

    # spk-list / utt-list forms
    _write(str(tmp_path / "spklist"), ["s0"])
    assert subset_data_dir(
        src, str(tmp_path / "byspk"), spk_list=str(tmp_path / "spklist")
    ) == 3
    _write(str(tmp_path / "uttlist"), ["u1", "u5"])
    assert subset_data_dir(
        src, str(tmp_path / "byutt"), utt_list=str(tmp_path / "uttlist")
    ) == 2


def test_combine_and_copy(tmp_path):
    a = _make_dir(str(tmp_path / "a"), [("a1", "s1"), ("a2", "s2")])
    # b has no utt2dur -> combined dir must not have one either
    # (combine_data.sh only merges tables present in every source)
    b = _make_dir(str(tmp_path / "b"), [("b1", "s3")], with_dur=False)
    dest = str(tmp_path / "ab")
    assert combine_data(dest, [a, b]) == 3
    assert not os.path.exists(os.path.join(dest, "utt2dur"))
    assert _read(os.path.join(dest, "utt2spk")) == [
        "a1 s1", "a2 s2", "b1 s3",
    ]

    cp = str(tmp_path / "cp")
    assert copy_data_dir(a, cp) == 2
    assert _read(os.path.join(cp, "wav.scp")) == _read(
        os.path.join(a, "wav.scp")
    )
    with pytest.raises(AssertionError):
        copy_data_dir(a, a)


def test_cli(tmp_path):
    src = _make_dir(str(tmp_path / "src"), [("u1", "s1"), ("u2", "s2")])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "wespeaker_hubert_tpu.bin.datadir",
         "subset", src, str(tmp_path / "dst"), "--n", "1", "--mode", "first"],
        capture_output=True, text=True, timeout=60, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip() == "1"
    assert _read(str(tmp_path / "dst" / "utt2spk")) == ["u1 s1"]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
