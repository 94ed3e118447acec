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


def limiter_sharded_local(x, threshold: float, c: float, axis_name: str,
                          sp: int):
    """Per-shard limiter body (runs under ``shard_map`` over ``axis_name``).

    ``x`` is this shard's [C, chunk] time slice (equal static chunks across
    shards; zero past the valid length, as every sharded stage guarantees).
    The cross-shard coupling is the same max-plus prefix the streaming
    carry uses, evaluated spatially: each shard reduces its chunk to one
    scalar summary (its local end-envelope under a floor carry), a
    log2(sp)-step Hillis-Steele ``ppermute`` doubling forms the exclusive
    max-plus prefix across shards — the combine is
    (m_l, L_l) . (m_r, L_r) = (max(m_l - c*L_r, m_r), L_l + L_r), and
    because every shard's span at doubling step d is exactly d*chunk, the
    length plane is static and only the scalar m rides ICI — then each
    shard merges the incoming prefix into its local envelope exactly the
    way ``limit_block`` merges a streaming carry. Same algebra, same
    elements, different bracketing: agreement vs the offline scan is
    f32-re-association-tight (the only re-associated term is c*L, one
    multiply either way).

    Zero samples cannot raise the envelope (their log-peak sits at the
    floor), so running on the full padded chunk matches ``limit_stream``'s
    full-capacity scan; masked output stays zero because 0 * g == 0.
    """
    from jax import lax as _lax  # local import keeps module import light

    chunk = x.shape[-1]
    peak = jnp.abs(x).max(axis=0)
    a = jnp.maximum(
        jnp.log(jnp.maximum(peak, np.float32(1e-26))), _LOG_FLOOR
    )
    env_local = envelope_log_scan(a, c)                    # [chunk]
    c32 = np.float32(c)

    # Inclusive Hillis-Steele max-plus scan over shard summaries. ppermute
    # fills un-addressed shards with zeros — 0.0 is NOT the max-plus
    # identity — so every step gates the combine on idx >= d, mirroring
    # pv_sharded._cross_shard_exclusive_phasor.
    idx = _lax.axis_index(axis_name)
    v = env_local[-1]
    d = 1
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        r = _lax.ppermute(v, axis_name, perm)
        # The received summary is combined as the LEFT operand; this
        # shard's running summary spans exactly d*chunk samples at step d
        # (static — the left-edge shards that span less never combine).
        nv = jnp.maximum(r - c32 * np.float32(d * chunk), v)
        v = jnp.where(idx >= d, nv, v)
        d *= 2
    # Exclusive: shift right one shard; shard 0 starts from the floor
    # (exactly limit_block's carry_log=None semantics — the floor minus
    # any positive decrement can never beat a local a >= floor).
    if sp > 1:
        prefix = _lax.ppermute(
            v, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        prefix = jnp.where(idx == 0, _LOG_FLOOR, prefix)
    else:
        prefix = jnp.full_like(v, _LOG_FLOOR)

    n_idx = jnp.arange(1, chunk + 1, dtype=jnp.float32)
    env_log = jnp.maximum(env_local, prefix - c32 * n_idx)
    g = jnp.minimum(
        np.float32(1.0), np.float32(threshold) / jnp.exp(env_log)
    )
    return x * g[None, :]


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
