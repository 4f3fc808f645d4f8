"""DSP auxiliaries: sound level, ultrasonic CV, loudness, EQ, spectrogram,
suncalc."""

import datetime

import numpy as np
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.audio.audionorm import (
    NormalizeOptions,
    measure_lufs,
    normalize,
    normalize_int16,
    plan_gain,
    true_peak_db,
)
from birdnet_go_tpu.audio.equalizer import Biquad, FilterChain, design_biquad
from birdnet_go_tpu.ops.soundlevel import (
    SoundLevelConfig,
    band_levels_db,
    third_octave_centers,
)
from birdnet_go_tpu.ops.ultrasonic import (
    UltrasonicConfig,
    is_unlikely,
    ultrasonic_frame_cv,
)
from birdnet_go_tpu.utils.suncalc import is_daytime, sun_times


def _tone(rate, seconds, f, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


# -- sound level -----------------------------------------------------------------

def test_third_octave_centers():
    c = third_octave_centers(25.0, 20000.0)
    assert abs(c[np.argmin(np.abs(c - 1000))] - 1000.0) < 1.0
    assert (np.diff(c) > 0).all()
    # ~29 bands across 25 Hz..20 kHz (exact 2^(n/3) centers, band edges
    # slightly off the nominal 25/20000 labels)
    assert 27 <= len(c) <= 30


def test_band_levels_tone_lands_in_band():
    cfg = SoundLevelConfig(sample_rate=48000)
    x = jnp.asarray(_tone(48000, 1.0, 1000.0, amp=0.5))
    levels, centers = band_levels_db(x, cfg)
    levels = np.asarray(levels)
    peak_band = int(levels.argmax())
    assert abs(centers[peak_band] - 1000.0) < 120.0
    # RMS of a 0.5 sine = 0.5/√2 → ~-9 dBFS
    assert -13.0 < levels[peak_band] < -6.0


# -- ultrasonic CV -----------------------------------------------------------------

def test_ultrasonic_cv_steady_noise_low_pulses_high():
    rng = np.random.default_rng(0)
    rate = 256000
    cfg = UltrasonicConfig(sample_rate=rate)
    # steady broadband noise: low CV
    noise = rng.standard_normal(rate // 4).astype(np.float32) * 0.1
    cv_noise = float(ultrasonic_frame_cv(jnp.asarray(noise), cfg))
    # pulsed ultrasonic chirps (bat-like): high CV
    x = np.zeros(rate // 4, np.float32)
    for start in range(0, len(x), rate // 32):
        seg = _tone(rate, 0.002, 45000.0, amp=0.8)
        x[start:start + len(seg)] += seg
    cv_pulse = float(ultrasonic_frame_cv(jnp.asarray(x), cfg))
    assert cv_noise < cv_pulse
    assert cv_noise < 0.5
    assert cv_pulse > 1.0
    assert bool(is_unlikely(jnp.asarray(noise),
                            UltrasonicConfig(cv_threshold=cv_noise + 0.01)))


# -- loudness ------------------------------------------------------------------------

def test_lufs_of_full_scale_sine():
    # 997 Hz sine at full scale ≈ -3.01 LUFS (K-weighting ~0 dB @ 1 kHz)
    x = _tone(48000, 5.0, 997.0, amp=1.0)
    lufs = measure_lufs(x, 48000)
    assert abs(lufs - (-3.01)) < 0.6


def test_normalize_reaches_target():
    x = _tone(48000, 5.0, 997.0, amp=0.05)       # quiet: ~-29 dB down
    y = normalize(x, 48000)
    lufs = measure_lufs(y, 48000)
    assert abs(lufs - (-23.0)) < 1.0


def test_true_peak_cap():
    x = _tone(48000, 2.0, 997.0, amp=0.9)        # loud already
    opts = NormalizeOptions(target_lufs=0.0, max_true_peak_db=-1.0)
    g = plan_gain(x, 48000, opts)
    y = x * g
    assert true_peak_db(y, 48000) <= -0.9


def test_normalize_int16_roundtrip():
    pcm = (np.clip(_tone(48000, 2.0, 500.0, amp=0.01), -1, 1)
           * 32767).astype(np.int16)
    out = normalize_int16(pcm, 48000)
    assert out.dtype == np.int16
    assert np.abs(out).max() > np.abs(pcm).max()   # gained up


# -- equalizer -------------------------------------------------------------------------

def _tone_response(bq_coeffs, rate, f):
    bq = Biquad(bq_coeffs)
    x = _tone(rate, 0.5, f, amp=1.0)
    y = bq.process(x)
    mid = y[len(y) // 4:]
    return np.sqrt(np.mean(mid ** 2)) / np.sqrt(0.5)


def test_highpass_response():
    c = design_biquad("highpass", 48000, 1000.0)
    assert _tone_response(c, 48000, 100.0) < 0.05      # stop band
    assert 0.9 < _tone_response(c, 48000, 8000.0) < 1.1  # pass band


def test_lowpass_response():
    c = design_biquad("lowpass", 48000, 1000.0)
    assert _tone_response(c, 48000, 12000.0) < 0.05
    assert 0.9 < _tone_response(c, 48000, 100.0) < 1.1


def test_peaking_gain():
    c = design_biquad("peaking", 48000, 1000.0, q=1.0, gain_db=6.0)
    assert 1.8 < _tone_response(c, 48000, 1000.0) < 2.2   # +6 dB ≈ ×2


def test_filter_chain_streaming_continuity():
    chain = FilterChain.from_config(48000, [
        {"type": "highpass", "frequency": 300},
        {"type": "peaking", "frequency": 2000, "gain": 3.0},
    ])
    x = np.random.default_rng(1).standard_normal(9600).astype(np.float32)
    whole = FilterChain.from_config(48000, [
        {"type": "highpass", "frequency": 300},
        {"type": "peaking", "frequency": 2000, "gain": 3.0},
    ]).process(x)
    parts = np.concatenate([chain.process(x[:1000]),
                            chain.process(x[1000:5000]),
                            chain.process(x[5000:])])
    np.testing.assert_allclose(parts, whole, atol=1e-5)


def test_unknown_filter_kind():
    with pytest.raises(ValueError):
        design_biquad("bandstopish", 48000, 1000.0)


# -- spectrogram -----------------------------------------------------------------------

def test_spectrogram_png_render(tmp_path):
    from PIL import Image

    from birdnet_go_tpu.analysis.spectrogram import (
        FrequencyProfile,
        generate_png,
        render_spectrogram,
    )

    x = _tone(48000, 3.0, 2000.0, amp=0.5)
    img = render_spectrogram(x, 48000, width=400)
    assert img.size[0] == 400
    # tone row must be the brightest: bright band near 2 kHz on a 0-12 kHz
    # axis (bird profile resamples to 24 kHz)
    arr = np.asarray(img.convert("L"), np.float32)
    row_energy = arr.mean(axis=1)
    h = arr.shape[0]
    peak_row = int(row_energy.argmax())
    expected = h - 1 - int(2000.0 / 12000.0 * (h - 1))
    assert abs(peak_row - expected) < h * 0.08

    out = generate_png(x, 48000, tmp_path / "spec.png", width=400)
    assert Image.open(out).size[0] == 400


def test_prerenderer_singleflight(tmp_path):
    from birdnet_go_tpu.analysis.spectrogram import PreRenderer

    pr = PreRenderer(workers=1)
    x = _tone(48000, 1.0, 1000.0)
    out = tmp_path / "a.png"
    # submit the same target twice before starting: second coalesces
    assert pr.submit(x, 48000, out, width=100)
    assert pr.submit(x, 48000, out, width=100)
    pr.start()
    import time

    deadline = time.time() + 15
    while not out.exists() and time.time() < deadline:
        time.sleep(0.05)
    pr.stop()
    assert out.exists()
    assert pr.rendered == 1


# -- suncalc ---------------------------------------------------------------------------

def test_sun_times_helsinki_summer():
    st = sun_times(datetime.date(2026, 6, 21), 60.17, 24.94)
    assert st.sunrise is not None and st.sunset is not None
    # Helsinki midsummer: sunrise ~03:54 local (00:54 UTC), sunset ~22:50
    # local (19:50 UTC)
    assert st.sunrise.hour in (0, 1)
    assert st.sunset.hour in (19, 20)


def test_polar_day_and_night():
    st = sun_times(datetime.date(2026, 6, 21), 78.0, 15.0)   # Svalbard
    assert st.polar == "day"
    assert is_daytime(datetime.datetime(2026, 6, 21, 1, 0), 78.0, 15.0)
    st = sun_times(datetime.date(2026, 12, 21), 78.0, 15.0)
    assert st.polar == "night"
    assert not is_daytime(datetime.datetime(2026, 12, 21, 12, 0), 78.0, 15.0)


def test_is_daytime_midday_vs_midnight():
    assert is_daytime(datetime.datetime(2026, 6, 1, 12, 0), 52.5, 13.4)
    assert not is_daytime(datetime.datetime(2026, 6, 1, 0, 30), 52.5, 13.4)
