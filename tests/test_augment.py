"""Device-side augmentation ops vs independent numpy/scipy references."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from wespeaker_hubert_tpu.ops.augment import (
    SPEEDS,
    add_reverb_noise,
    add_reverb_noise_packed,
    speed_input_len,
    speed_perturb,
)


class TestReverbNoise:
    def _mk(self, b=4, l=4000, r=800):
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal((b, l)) * 0.1).astype(np.float32)
        rir = np.zeros((b, r), np.float32)
        rir[:, : r // 2] = rng.standard_normal((b, r // 2)).astype(np.float32)
        noise = (rng.standard_normal((b, l)) * 0.05).astype(np.float32)
        return wav, rir, noise

    def test_none_passthrough(self):
        wav, rir, noise = self._mk()
        out = np.asarray(
            add_reverb_noise(
                jnp.asarray(wav), jnp.asarray(rir), jnp.asarray(noise),
                jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.float32),
            )
        )
        np.testing.assert_allclose(out, wav, atol=1e-6)

    def test_reverb_matches_scipy(self):
        wav, rir, noise = self._mk()
        out = np.asarray(
            add_reverb_noise(
                jnp.asarray(wav), jnp.asarray(rir), jnp.asarray(noise),
                jnp.full(4, 1, jnp.int32), jnp.zeros(4, jnp.float32),
            )
        )
        for i in range(4):
            r = rir[i] / np.sqrt(np.sum(rir[i] ** 2))
            want = scipy.signal.convolve(wav[i], r, mode="full")[: wav.shape[1]]
            want = want / (np.max(np.abs(want)) + 1e-4)
            np.testing.assert_allclose(out[i], want, rtol=1e-3, atol=1e-4)

    def test_noise_snr(self):
        wav, rir, noise = self._mk()
        snr = np.full(4, 10.0, np.float32)
        out = np.asarray(
            add_reverb_noise(
                jnp.asarray(wav), jnp.asarray(rir), jnp.asarray(noise),
                jnp.full(4, 2, jnp.int32), jnp.asarray(snr),
            )
        )
        for i in range(4):
            a_db = 10 * np.log10(np.mean(wav[i] ** 2) + 1e-4)
            n_db = 10 * np.log10(np.mean(noise[i] ** 2) + 1e-4)
            scaled = np.sqrt(10 ** ((a_db - n_db - 10.0) / 10)) * noise[i]
            want = wav[i] + scaled
            want = want / (np.max(np.abs(want)) + 1e-4)
            np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-5)


class TestSpeedPerturb:
    def test_identity_speed(self):
        rng = np.random.default_rng(1)
        out_len = 1000
        l_in = speed_input_len(out_len)
        wav = rng.standard_normal((2, l_in)).astype(np.float32)
        out = np.asarray(
            speed_perturb(jnp.asarray(wav), jnp.zeros(2, jnp.int32), out_len)
        )
        np.testing.assert_allclose(out, wav[:, :out_len], atol=1e-6)

    def test_resample_tracks_sine(self):
        # speed s shifts a sine's apparent frequency by factor s
        out_len = 2000
        l_in = speed_input_len(out_len)
        t = np.arange(l_in) / 16000.0
        wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :]
        for idx, s in enumerate(SPEEDS):
            out = np.asarray(
                speed_perturb(
                    jnp.asarray(wav), jnp.full(1, idx, jnp.int32), out_len
                )
            )[0]
            tt = np.arange(out_len) / 16000.0
            want = np.sin(2 * np.pi * 440.0 * s * tt)
            # linear interp of a 440*s Hz tone at 16 kHz: small error
            assert np.abs(out - want).max() < 0.01, f"speed {s}"

    def test_batch_mixed_speeds(self):
        rng = np.random.default_rng(2)
        out_len = 500
        l_in = speed_input_len(out_len)
        wav = rng.standard_normal((3, l_in)).astype(np.float32)
        out = np.asarray(
            speed_perturb(
                jnp.asarray(wav), jnp.asarray([0, 1, 2], jnp.int32), out_len
            )
        )
        assert out.shape == (3, out_len)
        np.testing.assert_allclose(out[0], wav[0, :out_len], atol=1e-6)
        assert not np.allclose(out[1], wav[1, :out_len])


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_speed_perturb_matches_scalar_interp():
    """Polyphase output == scalar-loop linear interpolation at n*speed
    (the sox 'speed' semantics), for every speed branch."""
    import numpy as np

    import jax.numpy as jnp

    from wespeaker_hubert_tpu.ops.augment import (
        SPEEDS,
        speed_input_len,
        speed_perturb,
    )

    out_len = 3210  # not a multiple of the polyphase block (10)
    l_in = speed_input_len(out_len)
    rng = np.random.default_rng(11)
    wav = rng.standard_normal((3, l_in)).astype(np.float32)
    idx = np.array([0, 1, 2], np.int32)
    y = np.asarray(speed_perturb(jnp.asarray(wav), jnp.asarray(idx), out_len))
    n = np.arange(out_len)
    for i, k in enumerate(idx):
        s = SPEEDS[k]
        pos = n * s
        lo = np.floor(pos).astype(int)
        f = (pos - lo).astype(np.float32)
        ref = wav[i, lo] * (1 - f) + wav[i, lo + 1] * f
        np.testing.assert_allclose(y[i], ref, atol=2e-6)


class TestPackedAug:
    def test_packed_equals_unpacked(self):
        """Packed layout (compact rir/noise over fixed slots) must produce
        the same waveforms as the where()-based full-batch path."""
        rng = np.random.default_rng(0)
        b, l, r = 12, 4000, 800
        n_rev, n_noise = 3, 4
        wav = rng.standard_normal((b, l)).astype(np.float32) * 0.1
        rir_full = np.zeros((b, r), np.float32)
        rir_full[:n_rev] = rng.standard_normal((n_rev, r)) * 0.3
        noise_full = np.zeros((b, l), np.float32)
        noise_full[n_rev:n_rev + n_noise] = (
            rng.standard_normal((n_noise, l)) * 0.05)
        snr_full = np.zeros((b,), np.float32)
        snr_full[n_rev:n_rev + n_noise] = rng.uniform(0, 15, n_noise)
        aug_type = np.array([1] * n_rev + [2] * n_noise
                            + [0] * (b - n_rev - n_noise), np.int32)

        ref = np.asarray(add_reverb_noise(
            jnp.asarray(wav), jnp.asarray(rir_full), jnp.asarray(noise_full),
            jnp.asarray(aug_type), jnp.asarray(snr_full)))
        got = np.asarray(add_reverb_noise_packed(
            jnp.asarray(wav), jnp.asarray(rir_full[:n_rev]),
            jnp.asarray(noise_full[n_rev:n_rev + n_noise]),
            jnp.asarray(snr_full[n_rev:n_rev + n_noise]), n_rev))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_zero_counts_passthrough(self):
        rng = np.random.default_rng(1)
        wav = rng.standard_normal((4, 1000)).astype(np.float32)
        out = add_reverb_noise_packed(
            jnp.asarray(wav), jnp.zeros((0, 100)), jnp.zeros((0, 1000)),
            jnp.zeros((0,)), 0)
        np.testing.assert_allclose(np.asarray(out), wav)

    def test_reverb_only(self):
        rng = np.random.default_rng(2)
        b, l, r = 6, 2000, 300
        wav = rng.standard_normal((b, l)).astype(np.float32) * 0.1
        rir = rng.standard_normal((2, r)).astype(np.float32)
        out = np.asarray(add_reverb_noise_packed(
            jnp.asarray(wav), jnp.asarray(rir), jnp.zeros((0, l)),
            jnp.zeros((0,)), 2))
        # clean rows untouched, reverb rows changed + peak-normalized
        np.testing.assert_allclose(out[2:], wav[2:])
        assert np.abs(out[:2]).max() <= 1.0001
        assert not np.allclose(out[:2], wav[:2])
