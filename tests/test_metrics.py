"""Metric formula tests (librosa-parity; ref calculate_metrics.py)."""

import numpy as np

from jatsr_tpu.metrics import (
    calculate_lsd,
    calculate_mel_loss,
    calculate_multi_scale_mel_loss,
    grade_quality,
    mel_filterbank,
    power_to_db,
    stft_magnitude,
)


def _tone(freq, sr=44100, secs=0.5, amp=1.0):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_lsd_identity_zero():
    x = _tone(440)
    lsd, frames = calculate_lsd(x, x)
    assert lsd == 0.0
    assert np.all(frames == 0.0)


def test_lsd_positive_and_symmetric():
    a, b = _tone(440), _tone(880)
    l_ab, _ = calculate_lsd(a, b)
    l_ba, _ = calculate_lsd(b, a)
    assert l_ab > 0.5
    np.testing.assert_allclose(l_ab, l_ba, rtol=1e-9)


def test_lsd_scale_invariance_relationship():
    """Scaling by 10x shifts log10 magnitudes by exactly 1 -> LSD = 20 dB."""
    x = _tone(1000) + 1e-3  # keep above the 1e-8 floor
    lsd, _ = calculate_lsd(10.0 * x, x)
    np.testing.assert_allclose(lsd, 20.0, atol=0.2)


def test_stft_shape_and_parseval_sanity():
    x = _tone(440, secs=0.25)
    S = stft_magnitude(x, 2048, 512)
    assert S.shape[0] == 1025
    assert S.shape[1] == 1 + len(x) // 512
    # peak bin should be near 440/ (44100/2048) ≈ bin 20
    peak_bin = S[:, S.shape[1] // 2].argmax()
    assert abs(peak_bin - round(440 * 2048 / 44100)) <= 1


def test_mel_filterbank_properties():
    fb = mel_filterbank(44100, 2048, 80)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # filter centres are monotonically increasing
    centres = fb.argmax(axis=1)
    assert np.all(np.diff(centres) >= 0)


def test_power_to_db_ref_max_and_topdb():
    S = np.array([[1.0, 0.1, 1e-12]])
    db = power_to_db(S)
    np.testing.assert_allclose(db[0, 0], 0.0)
    np.testing.assert_allclose(db[0, 1], -10.0, atol=1e-6)
    assert db.min() >= db.max() - 80.0


def test_mel_loss_identity_zero():
    x = _tone(440)
    l1, l2, _, _ = calculate_mel_loss(x, x)
    assert l1 == 0.0 and l2 == 0.0


def test_mel_loss_detects_highfreq_removal():
    """Removing content above 8 kHz must register in the mel losses."""
    sr = 44100
    full = _tone(400, sr) + 0.5 * _tone(12000, sr)
    low = _tone(400, sr)
    l1, l2, _, _ = calculate_mel_loss(low, full, sr)
    assert l1 > 1.0
    assert l2 >= l1


def test_multi_scale_runs():
    a, b = _tone(440), _tone(450)
    l1, l2, results = calculate_multi_scale_mel_loss(a, b)
    assert set(results) == {"fft512", "fft1024", "fft2048"}
    assert l1 > 0 and l2 > 0


def test_grading_thresholds():
    assert grade_quality(0.5, 0.5) == "LSD: excellent, Mel: excellent"
    assert grade_quality(3.0, 5.0) == "LSD: poor, Mel: poor"
    assert grade_quality(1.2, 2.5) == "LSD: good, Mel: fair"


def test_spectrum_plots(tmp_path):
    from jatsr_tpu.metrics.plots import plot_audio_spectrum, plot_comparison

    x = _tone(440, secs=0.3)
    p1 = plot_audio_spectrum(x, 44100, tmp_path / "spec.png", title="t")
    p2 = plot_comparison([("a", x), ("b", x * 0.5)], 44100,
                         tmp_path / "cmp.png")
    assert p1.exists() and p1.stat().st_size > 1000
    assert p2.exists() and p2.stat().st_size > 1000
