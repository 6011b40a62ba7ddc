"""ThreadSanitizer race check for the native loader: builds the loader +
stress harness with -fsanitize=thread and runs multiple epochs; any data
race aborts with a TSan report.  (The reference's hand-rolled C++
threading — BlockingQueue/ThreadPool — ships with no sanitizer coverage;
SURVEY §5.)  Skipped when g++/tsan runtime is unavailable."""

import os
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(
    os.path.dirname(__file__), "..", "wespeaker_hubert_tpu", "data", "native"
)


def _build_tsan(tmp_path):
    binary = str(tmp_path / "loader_tsan")
    base = [
        "g++", "-O1", "-g", "-std=c++17", "-pthread",
        "-fsanitize=thread",
        os.path.join(NATIVE, "loader.cc"),
        os.path.join(NATIVE, "loader_test_main.cc"),
        "-o", binary, "-lz",
    ]
    for extra in (["-DWESP_HAVE_ZSTD", "-lzstd"], []):
        try:
            subprocess.run(base + extra, check=True, capture_output=True)
            return binary
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def test_loader_race_free(tmp_path):
    binary = _build_tsan(tmp_path)
    if binary is None:
        pytest.skip("g++/tsan unavailable")

    from wespeaker_hubert_tpu.data import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(20):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(
            p,
            (rng.standard_normal(int(rng.integers(4000, 30000))) * 0.1)
            .clip(-1, 1),
        )
        paths.append(p)
    lst = str(tmp_path / "files.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")

    # tar shards for the v3 loader stress
    import tarfile

    shard_paths = []
    for s in range(3):
        tp = str(tmp_path / f"shard{s}.tar")
        with tarfile.open(tp, "w") as tf:
            for i, p in enumerate(paths[s::3]):
                key = f"s{i % 3}u{s}_{i}"
                tf.add(p, arcname=key + ".wav")
                spk = tmp_path / "x.spk"
                spk.write_text(f"s{i % 3}")
                tf.add(str(spk), arcname=key + ".spk")
        shard_paths.append(tp)
    # one shard each gzip- and zstd-compressed: the decompressing
    # readers run inside the same worker pool and need TSan coverage too
    import gzip

    gz = shard_paths[1] + ".gz"
    with open(shard_paths[1], "rb") as f, gzip.open(gz, "wb") as out:
        out.write(f.read())
    shard_paths[1] = gz
    from wespeaker_hubert_tpu.data.zstd_io import zstd_available

    if zstd_available():
        from wespeaker_hubert_tpu.data.zstd_io import compress_file

        zst = shard_paths[2] + ".zst"
        compress_file(shard_paths[2], zst)
        shard_paths[2] = zst
    tlst = str(tmp_path / "shards.txt")
    with open(tlst, "w") as f:
        f.write("\n".join(shard_paths) + "\n")

    proc = subprocess.run(
        [binary, lst, "5", tlst], capture_output=True, text=True,
        timeout=120,
    )
    report = proc.stdout + proc.stderr
    assert proc.returncode == 0, report
    assert "WARNING: ThreadSanitizer" not in report, report
    assert "consumed" in proc.stdout
    assert "consumed2" in proc.stdout
    assert "consumed3" in proc.stdout


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
