"""Unit tests for the DSP op layer against scipy/numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from formula_vad_tpu.ops import dft, resample, stft, volume, windows


class TestWindows:
    def test_hann_periodic_matches_scipy(self):
        for n in (320, 1024):
            w = windows.hann_periodic(n)
            ref = scipy.signal.get_window("hann", n, fftbins=True)
            np.testing.assert_allclose(w, ref, atol=1e-6)

    def test_hann_symmetric_matches_scipy(self):
        for n in (320, 1024):
            w = windows.hann_symmetric(n)
            ref = scipy.signal.get_window("hann", n, fftbins=False)
            np.testing.assert_allclose(w, ref, atol=1e-6)

    def test_sqrt_hann(self):
        w = windows.sqrt_hann_symmetric(320)
        np.testing.assert_allclose(w**2, windows.hann_symmetric(320), atol=1e-6)

    def test_norm_factor_hann_periodic_1024(self):
        # sum(periodic hann) == N/2 exactly, so norm factor == 2 and the
        # BufferedFFT magnitude scale is 2/1024 == 1/512 (BufferedFFT.zig:95-99).
        w = windows.hann_periodic(1024)
        nf = windows.window_norm_factor(w)
        assert abs(nf - 2.0) < 1e-5

    def test_hamming(self):
        w = windows.hamming_periodic(64)
        idx = np.arange(64)
        ref = 0.53836 - (1 - 0.53836) * np.cos(2 * np.pi * idx / 64)
        np.testing.assert_allclose(w, ref, atol=1e-6)


class TestDFT:
    def test_rdft_matches_numpy(self):
        rng = np.random.default_rng(0)
        for n in (320, 1024):
            x = rng.standard_normal((3, n)).astype(np.float32)
            re, im = dft.rdft(jnp.asarray(x), n)
            ref = np.fft.rfft(x, axis=-1)
            np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3 * np.sqrt(n))
            np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3 * np.sqrt(n))

    def test_irdft_kiss_convention(self):
        """kiss_fftri is unnormalized: round-trip gains a factor of N."""
        rng = np.random.default_rng(1)
        n = 320
        x = rng.standard_normal((n,)).astype(np.float32)
        re, im = dft.rdft(jnp.asarray(x), n)
        back = dft.irdft_kiss(re, im, n)
        np.testing.assert_allclose(np.asarray(back) / n, x, atol=1e-4)

    def test_freq_to_bin(self):
        # Reference speech band 500-2000 Hz at 48k/1024 -> bins 11..43
        # (FFT.zig:156-166 round(freq/bin_width)).
        assert dft.freq_to_bin(500.0, 1024, 48000) == 11
        assert dft.freq_to_bin(2000.0, 1024, 48000) == 43
        with pytest.raises(ValueError):
            dft.freq_to_bin(25000.0, 1024, 48000)


class TestResample:
    def test_downsample_decimation(self):
        x = jnp.arange(24, dtype=jnp.float32)
        y = resample.downsample(x, 3)
        np.testing.assert_array_equal(np.asarray(y), np.arange(0, 24, 3, dtype=np.float32))

    def test_upsample_reference_semantics(self):
        """Mirror resample.zig:32-65 exactly with a scalar python loop."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal(16).astype(np.float32)
        prev = np.float32(0.25)
        rate = 3

        def ref_upsample(inp, prev_last, r):
            out = np.zeros(len(inp) * r, dtype=np.float32)
            n_interp = r - 1

            def interp(a, b, dest_len):
                return np.array(
                    [a + (b - a) * np.float32((i + 1) / (dest_len + 1)) for i in range(dest_len)],
                    dtype=np.float32,
                )

            out[:n_interp] = interp(prev_last, inp[0], n_interp)
            out[n_interp] = inp[0]
            for i in range(1, len(inp)):
                fr = i * r
                out[fr : fr + n_interp] = interp(inp[i - 1], inp[i], n_interp)
                out[fr + n_interp] = inp[i]
            return out, inp[-1]

        expected, expected_last = ref_upsample(x, prev, rate)
        got, got_last = resample.upsample(jnp.asarray(x), jnp.asarray(prev), rate)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)
        assert float(got_last) == pytest.approx(float(expected_last))

    def test_upsample_chain_carry(self):
        """Chunked upsampling with carry == single-shot upsampling."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal(64).astype(np.float32)
        whole, _ = resample.upsample(jnp.asarray(x), jnp.asarray(np.float32(0)), 3)
        last = jnp.asarray(np.float32(0))
        parts = []
        for i in range(0, 64, 16):
            part, last = resample.upsample(jnp.asarray(x[i : i + 16]), last, 3)
            parts.append(np.asarray(part))
        np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole), atol=1e-7)

    def test_batched(self):
        x = jnp.ones((2, 4, 12))
        assert resample.downsample(x, 3).shape == (2, 4, 4)
        y, last = resample.upsample(x[..., ::3], jnp.zeros((2, 4)), 3)
        assert y.shape == (2, 4, 12)
        assert last.shape == (2, 4)


class TestSTFT:
    def test_frame_signal(self):
        x = jnp.arange(10, dtype=jnp.float32)
        f = stft.frame_signal(x, 4, 2)
        assert f.shape == (4, 4)
        np.testing.assert_array_equal(np.asarray(f[1]), [2, 3, 4, 5])

    def test_stft_matches_scipy(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(8160).astype(np.float32)
        w = windows.sqrt_hann_symmetric(320)
        re, im = stft.stft(jnp.asarray(x), w, 320, 160)
        assert re.shape == (50, 161)
        frames = np.lib.stride_tricks.sliding_window_view(x, 320)[::160][:50]
        ref = np.fft.rfft(frames * w, axis=-1)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=0.05)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=0.05)

    def test_istft_round_trip(self):
        """Analysis->synthesis with sqrt-Hann at 50% overlap reconstructs the
        interior up to the reference's own COLA ripple: the NSNet2 window is
        sqrt(*symmetric*) Hann (NSNet2.zig:384-396), whose squared overlap sum
        is 1 +/- ~0.5% (only the periodic Hann is exactly COLA at hop N/2)."""
        rng = np.random.default_rng(5)
        x = rng.standard_normal(8160).astype(np.float32)
        w = windows.sqrt_hann_symmetric(320)
        re, im = stft.stft(jnp.asarray(x), w, 320, 160)
        y = stft.istft_overlap_add(re, im, w, 320, 160, 8160)
        # interior (beyond the first/last partial-overlap hop)
        np.testing.assert_allclose(np.asarray(y)[160:8000], x[160:8000], atol=0.02)
        # and the error really is the COLA ripple, not a bug:
        cola = w**2
        scale = np.zeros(8160, np.float32)
        for f in range(50):
            scale[160 * f : 160 * f + 320] += cola
        np.testing.assert_allclose(np.asarray(y)[160:8000], (x * scale)[160:8000], atol=1e-4)

    def test_magnitude_windows_norm(self):
        """A full-scale 468.75 Hz sine (bin 10 of 1024 @48k) has magnitude
        ~0.5 with the reference's 1/512 normalization."""
        n = 1024
        t = np.arange(n)
        x = np.sin(2 * np.pi * 10 * t / n).astype(np.float32)
        w = windows.hann_periodic(n)
        nf = windows.window_norm_factor(w) / np.float32(n)
        mags = stft.magnitude_windows(jnp.asarray(x), w, n, nf)
        assert mags.shape == (513,)
        assert np.asarray(mags)[10] == pytest.approx(0.5, abs=1e-3)


class TestVolume:
    def test_rms(self):
        x = jnp.asarray(np.ones(100, np.float32) * 0.5)
        assert float(volume.rms_volume(x)) == pytest.approx(0.5)

    def test_volume_analysis(self):
        chunk = jnp.stack([jnp.ones(1000) * 0.2, jnp.ones(1000) * 0.4])
        ratio, vmin, vmax = volume.volume_analysis(chunk)
        assert float(ratio) == pytest.approx(0.5, abs=1e-6)
        assert float(vmin) == pytest.approx(0.2, abs=1e-6)
        assert float(vmax) == pytest.approx(0.4, abs=1e-6)

    def test_zero_volume(self):
        chunk = jnp.zeros((2, 100))
        ratio, _, _ = volume.volume_analysis(chunk)
        assert float(ratio) == 0.0


class TestFusedBand16:
    """band_volume_16k (upsample folded into the band DFT, PARITY.md
    deviation 8) vs materialize-upsample + band_volume_windows."""

    def _ref(self, x16, prev, n_windows):
        from formula_vad_tpu.ops import resample, stft as stft_mod

        up, _ = resample.upsample(jnp.asarray(x16), jnp.asarray(prev), 3)
        frames = np.asarray(up)[..., : n_windows * 1024].reshape(
            x16.shape[:-1] + (n_windows, 1024)
        )
        w = windows.hann_periodic(1024)
        norm = float(windows.window_norm_factor(w) / np.float32(1024))
        return np.asarray(
            stft_mod.band_volume_windows(jnp.asarray(frames), w, 1024, norm, 11, 43)
        )

    def test_matches_upsample_then_band(self):
        from formula_vad_tpu.ops import stft as stft_mod

        rng = np.random.default_rng(5)
        t16 = 16000 * 4  # 4 s -> 187 full windows (non-multiple of 3)
        x16 = (0.1 * rng.standard_normal((2, t16))).astype(np.float32)
        prev = np.asarray([0.03, -0.02], np.float32)
        n_windows = t16 * 3 // 1024
        w = windows.hann_periodic(1024)
        norm = float(windows.window_norm_factor(w) / np.float32(1024))
        got = np.asarray(
            stft_mod.band_volume_16k(
                jnp.asarray(x16), jnp.asarray(prev), w, 1024, norm, 11, 43, n_windows
            )
        )
        want = self._ref(x16, prev, n_windows)
        assert got.shape == want.shape == (2, n_windows)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)

    def test_slab_chaining_matches_single_shot(self):
        """Two chained slabs (prev carried across) == one whole-stream call
        bitwise — slabs are superframe-aligned by construction."""
        from formula_vad_tpu.ops import stft as stft_mod

        rng = np.random.default_rng(6)
        w = windows.hann_periodic(1024)
        norm = float(windows.window_norm_factor(w) / np.float32(1024))
        sf = 1024  # superframe = 1024 16k samples = 3 windows
        t16 = sf * 20
        x16 = (0.1 * rng.standard_normal((1, t16))).astype(np.float32)
        whole = np.asarray(
            stft_mod.band_volume_16k(
                jnp.asarray(x16), jnp.zeros((1,), jnp.float32), w, 1024, norm,
                11, 43, 60,
            )
        )
        half = t16 // 2
        a = np.asarray(
            stft_mod.band_volume_16k(
                jnp.asarray(x16[:, :half]), jnp.zeros((1,), jnp.float32), w, 1024,
                norm, 11, 43, 30,
            )
        )
        b = np.asarray(
            stft_mod.band_volume_16k(
                jnp.asarray(x16[:, half:]), jnp.asarray(x16[:, half - 1]), w, 1024,
                norm, 11, 43, 30,
            )
        )
        np.testing.assert_array_equal(np.concatenate([a, b], axis=-1), whole)
