"""Peak limiter — a serial IIR envelope made parallel (target-spec
extension; the reference ships no dynamics processing).

The classic peak limiter is the textbook "inherently serial" audio
recurrence: an instant-attack, exponential-release envelope

    env[n] = max(|x[n]|, env[n-1] * d),   d = exp(-1 / (release_s * rate))

followed by gain = min(1, T / env). On TPU that loop becomes a LOG-DEPTH
scan: in log domain the recurrence is env_log[n] = max(a[n],
env_log[n-1] - c) with a = log|x| and c = -log d, i.e. a prefix
maximum under a constant per-sample decrement — the max-plus analog of
the phase vocoder's phasor prefix product (ops/pv.py). The associative
combine carries (m, L): the segment's envelope at its END and its
length,

    (m1, L1) . (m2, L2) = (max(m1 - c*L2, m2), L1 + L2)

so ``lax.associative_scan`` evaluates the whole clip in O(log N) depth
of elementwise VPU work — no lax.scan, no sequential dependence, and the
chunked streaming carry is one scalar per channel-link (the envelope at
the previous chunk's last valid sample), combined with exactly the same
algebra.

Semantics notes:
* **Stereo-linked**: the envelope runs on the cross-channel peak, so a
  stereo image never skews (the industry default for bus limiters).
* **Below threshold the node is a bitwise passthrough**: gain is
  computed as min(1, T/env) and x * 1.0 is exact — pinned by test.
* f32 contract: the scan re-associates the c*L decrements, so envelope
  values agree with the sequential recurrence to last-ulp (~1e-6),
  never bit-exactly; tests bound the difference.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream

# Envelope floor (log domain) — also the streaming carry's initial value.
# exp(-60) ~ 9e-27: silence for any audio purpose, still far from f32
# denormals after a whole clip of decay.
_LOG_FLOOR = np.float32(-60.0)


def envelope_log_scan(a, c: float):
    """Prefix maximum of ``a`` [..., N] under per-step decrement ``c``.

    Returns env_log with env_log[..., n] = max_{k<=n} (a[..., k] -
    c*(n-k)) — the log-domain instant-attack / exponential-release
    envelope. Log-depth associative scan; see module docstring."""
    c32 = np.float32(c)

    def combine(x, y):
        mx, lx = x
        my, ly = y
        return (
            jnp.maximum(mx - c32 * ly.astype(jnp.float32), my),
            lx + ly,
        )

    lens = jnp.ones(a.shape, dtype=jnp.int32)
    m, _l = lax.associative_scan(combine, (a, lens), axis=-1)
    return m


def limiter_params(threshold_db: float, release_ms: float, rate: int):
    """(threshold_linear, per-sample log decrement c)."""
    threshold = float(10.0 ** (threshold_db / 20.0))
    release_samples = max(1.0, float(release_ms) * 1e-3 * rate)
    return threshold, 1.0 / release_samples


def limit_block(data, threshold: float, c: float, carry_log=None):
    """Limit [C, N] float32 samples; returns (out, env_log [N], new_carry).

    ``carry_log`` is the envelope (log) just before this block's first
    sample, or None for clip start. The returned carry is env_log at the
    LAST column — callers with a valid-count mask must gather their own
    (see limiter_stream_step)."""
    peak = jnp.abs(data).max(axis=0)                       # stereo-linked
    a = jnp.log(jnp.maximum(peak, np.float32(1e-26)))
    a = jnp.maximum(a, _LOG_FLOOR)
    env_log = envelope_log_scan(a, c)
    if carry_log is not None:
        n_idx = jnp.arange(1, data.shape[1] + 1, dtype=jnp.float32)
        env_log = jnp.maximum(env_log, carry_log - np.float32(c) * n_idx)
    env = jnp.exp(env_log)
    g = jnp.minimum(np.float32(1.0), np.float32(threshold) / env)
    return data * g[None, :], env_log, env_log[-1]


def limit_stream(stream: Stream, threshold_db: float,
                 release_ms: float) -> Stream:
    """Offline limiter over a whole Stream (padding past ``length`` is
    zero, so it never raises the envelope; output stays masked)."""
    threshold, c = limiter_params(threshold_db, release_ms, stream.rate)
    out, _env, _carry = limit_block(stream.data, threshold, c)
    return stream.with_data(out, fmt=FMT_FLT)


def limiter_stream_init(channels: int):
    """Streaming carry: the log envelope at the previous chunk's last
    valid sample (scalar; stereo-linked, so channel count is irrelevant
    but kept in the signature for uniformity with other stream inits)."""
    return (jnp.float32(_LOG_FLOOR),)


def limiter_stream_step(threshold: float, c: float, state, data, n):
    """One chunk: data [C, W], n valid. Returns (state', out [C, W]).

    Invalid trailing samples do not advance time: the carry is the
    envelope at sample n-1, so the next chunk continues exactly where
    the valid audio stopped (streamed output equals the offline render
    to the scan's last-ulp re-association)."""
    (carry,) = state
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)
    # Masked samples can't raise the envelope.
    masked = jnp.where((idx < n)[None, :], data, 0.0)
    out, env_log, _tail = limit_block(masked, threshold, c, carry_log=carry)
    last = jnp.clip(n - 1, 0, data.shape[1] - 1)
    new_carry = jnp.where(n > 0, env_log[last], carry)
    return (new_carry,), out


def limiter_reference(data: np.ndarray, threshold_db: float,
                      release_ms: float, rate: int) -> np.ndarray:
    """Sequential float64 mirror of the exact recurrence (the yardstick
    the log-depth scan is tested against)."""
    threshold, c = limiter_params(threshold_db, release_ms, rate)
    d = math.exp(-c)
    peak = np.abs(data).max(axis=0)
    env = 0.0
    g = np.ones(data.shape[1])
    for i in range(data.shape[1]):
        env = max(float(peak[i]), env * d)
        g[i] = min(1.0, threshold / env) if env > 0 else 1.0
    return (data.astype(np.float64) * g[None, :]).astype(np.float32)
