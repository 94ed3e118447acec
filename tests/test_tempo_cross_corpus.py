"""WSOLA <-> phase-vocoder cross-algorithm consistency corpus (VERDICT r3
#4 mitigation for the missing SoundTouch oracle).

SoundTouch — the reference's tempo/pitch engine (audio-velocity.cpp:
369-427) — is not in this image and its sources are not obtainable
offline, so sample-level parity with the reference binary cannot be
tested. This corpus bounds the risk a different way: the framework ships
TWO independent tempo/pitch implementations (ops/stretch.py WSOLA — the
reference-parity family — and ops/pv.py phase vocoder), built from
different math with different artifact profiles. Where they AGREE on
structured musical material, an implementation error in either would
have to be replicated in the other to pass; where they legitimately
differ (WSOLA transient swallowing), the divergence is documented and
pinned rather than hidden.

Corpus: a harmonic chord (A-major triad partials), a click train over a
quiet tone bed (transient timing), and a formant-shaped AM "vowel"
(speech-like envelope). Production path: ops.stretch.soundtouch_like —
the exact (rate, pitch) wiring both nodes use (audio-velocity.cpp:
446-477).

Measured 2026-08-20 (CPU, 3 s clips, tempos 0.75/1.6, pitch ±5 st);
contracts pinned with margin below the worst measurement:

  - output length: IDENTICAL integers across algorithms (shared exact
    scaling law), within 1% of N/tempo;
  - chord partials: each algorithm keeps the dominant partial within 1%
    under tempo change, and lands pitch shifts within 1% of target
    (measured 293.0/293.7 vs 293.7 target at +5 st);
  - clicks: every detected transient within 25 ms of its expected
    1/tempo-scaled position; >= 3 of 4 detected per algorithm (WSOLA
    measurably swallows one click at 1.6x — envelope 0.66 vs PV's 4/4 —
    the classic WSOLA compression artifact, pinned as >= 3 not == 4);
  - vowel: amplitude-envelope correlation WSOLA vs PV >= 0.90 (measured
    0.937-0.991) and mean log-spectral-envelope correlation below 8 kHz
    >= 0.97 (measured 0.986-0.994).

What this does and does not prove is documented in PARITY.md §SoundTouch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nodey_tpu.core import registry
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops.stretch import soundtouch_like

RATE = 48_000


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[-1]),
                  rate=RATE, fmt="flt", channels=x.shape[0])


def chord(seconds=3.0):
    t = np.arange(int(RATE * seconds)) / RATE
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in
            ((220.0, .25), (277.18, .2), (329.63, .18)))
    return x[None, :].astype(np.float32)


CLICK_TIMES = (0.4, 1.1, 1.9, 2.6)


def clicks(seconds=3.0):
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    x = 0.05 * np.sin(2 * np.pi * 110.0 * t)
    for tc in CLICK_TIMES:
        i = int(tc * RATE)
        w = np.hanning(96)
        x[i:i + 96] += 0.9 * w * np.sin(
            2 * np.pi * 3000.0 * np.arange(96) / RATE
        )
    return x[None, :].astype(np.float32)


def am_vowel(seconds=3.0, f0=150.0):
    n = int(RATE * seconds)
    t = np.arange(n) / RATE
    sig = np.zeros(n)
    for h in range(1, 25):
        f = h * f0
        if f > 8000:
            break
        env = (np.exp(-((f - 700) / 300.0) ** 2)
               + 0.7 * np.exp(-((f - 1800) / 400.0) ** 2) + 0.05)
        sig += env * np.sin(2 * np.pi * f * t + 0.3 * h)
    sig *= 0.55 + 0.45 * np.sin(2 * np.pi * 3.5 * t)   # syllabic AM
    sig = 0.4 * sig / np.abs(sig).max()
    return sig[None, :].astype(np.float32)


def _run(x, rate, pitch, algo):
    out = soundtouch_like(None, _stream(x), rate=rate, pitch=pitch,
                          algorithm=algo)
    n = int(out.length)
    return np.asarray(out.data)[0, :n], n


def _envelope(y, win=960):
    return np.convolve(np.abs(y), np.ones(win) / win, mode="same")


def _env_corr(a, b):
    m = min(len(a), len(b))
    return float(np.corrcoef(_envelope(a[:m]), _envelope(b[:m]))[0, 1])


def _click_times(y):
    e = np.convolve(np.abs(y), np.ones(48) / 48, mode="same")
    th = 0.35 * e.max()
    idx = np.where(e > th)[0]
    groups = []
    for i in idx:
        if groups and i - groups[-1][-1] < int(0.05 * RATE):
            groups[-1].append(i)
        else:
            groups.append([i])
    return [g[int(np.argmax(e[g]))] / RATE for g in groups]


def _dominant(y):
    sp = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return float(np.argmax(sp)) * RATE / len(y)


def _spec_env(y, nfft=2048, hop=512):
    frames = np.lib.stride_tricks.sliding_window_view(y, nfft)[::hop]
    mag = np.abs(np.fft.rfft(frames * np.hanning(nfft), axis=-1)).mean(0)
    return np.log(mag + 1e-9)


@pytest.mark.parametrize("tempo", [0.75, 1.6])
def test_tempo_cross_algorithm(tempo):
    sig_chord, sig_clicks, sig_vowel = chord(), clicks(), am_vowel()

    # Shared exact length law: identical output length integers.
    for sig in (sig_chord, sig_clicks, sig_vowel):
        w, nw = _run(sig, tempo, 1.0 / tempo, "wsola")
        p, npv = _run(sig, tempo, 1.0 / tempo, "pv")
        assert nw == npv, "length law diverged between algorithms"
        expected = sig.shape[-1] / tempo
        assert abs(nw - expected) / expected < 0.01

        if sig is sig_chord:
            # Pitch preserved by both: dominant partial within 1%.
            for y in (w, p):
                mid = y[4000:len(y) - 4000]
                assert abs(_dominant(mid) - 220.0) / 220.0 < 0.01
        elif sig is sig_clicks:
            exp = [t / tempo for t in CLICK_TIMES]
            for y, least in ((w, 3), (p, 3)):
                got = _click_times(y)
                assert len(got) >= least, (tempo, got)
                for g in got:
                    assert min(abs(g - e) for e in exp) < 0.025, (got, exp)
            # Transients both algorithms detect agree within 15 ms.
            gw, gp = _click_times(w), _click_times(p)
            for a in gw:
                near = [b for b in gp if abs(b - a) < 0.03]
                if near:
                    assert min(abs(b - a) for b in near) < 0.015
        else:
            assert _env_corr(w, p) >= 0.90
            se_w, se_p = _spec_env(w), _spec_env(p)
            k = int(8000 / (RATE / 2) * len(se_w))
            assert float(
                np.corrcoef(se_w[:k], se_p[:k])[0, 1]
            ) >= 0.97


@pytest.mark.parametrize("semis", [5.0, -5.0])
def test_pitch_cross_algorithm(semis):
    pr = 2.0 ** (semis / 12.0)
    sig_chord, sig_vowel = chord(), am_vowel()

    w, nw = _run(sig_chord, 1.0, pr, "wsola")
    p, npv = _run(sig_chord, 1.0, pr, "pv")
    assert nw == npv
    assert abs(nw - sig_chord.shape[-1]) / sig_chord.shape[-1] < 0.01
    target = 220.0 * pr
    dw = _dominant(w[4000:len(w) - 4000])
    dp = _dominant(p[4000:len(p) - 4000])
    assert abs(dw - target) / target < 0.01
    assert abs(dp - target) / target < 0.01
    assert abs(dw - dp) / target < 0.005   # cross agreement

    w, nw = _run(sig_vowel, 1.0, pr, "wsola")
    p, npv = _run(sig_vowel, 1.0, pr, "pv")
    assert nw == npv
    assert _env_corr(w, p) >= 0.90
    se_w, se_p = _spec_env(w), _spec_env(p)
    k = int(8000 / (RATE / 2) * len(se_w))
    assert float(np.corrcoef(se_w[:k], se_p[:k])[0, 1]) >= 0.97
