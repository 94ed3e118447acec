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

so the scan engine (ops/scans.maxplus_scan — doubling or two-level
blocked) evaluates the whole clip in O(log N) depth of elementwise VPU
work — no lax.scan, no sequential dependence, and the
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

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import FMT_FLT, Stream

# Envelope floor (log domain) — also the streaming carry's initial value.
# exp(-60) ~ 9e-27: silence for any audio purpose, still far from f32
# denormals after a whole clip of decay.
_LOG_FLOOR = np.float32(-60.0)


def envelope_log_scan(a, c: float):
    """Prefix maximum of ``a`` [..., N] under per-step decrement ``c``.

    Returns env_log with env_log[..., n] = max_{k<=n} (a[..., k] -
    c*(n-k)) — the log-domain instant-attack / exponential-release
    envelope. Evaluated by ops/scans.maxplus_scan: single-plane
    Hillis-Steele doubling with host-exact c*d decrements (the span
    plane is static, so no length leaf rides the scan), switching to the
    two-level blocked form for long arrays."""
    from nodey_tpu.ops.scans import maxplus_scan

    return maxplus_scan(a, c)


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
    env_log = _sharded_env_log(x, c, axis_name, sp)
    g = jnp.minimum(
        np.float32(1.0), np.float32(threshold) / jnp.exp(env_log)
    )
    return x * g[None, :]


def _cross_shard_maxplus(m_end, chunk: int, c: float, axis_name: str,
                         sp: int):
    """Exclusive cross-shard max-plus prefix of per-shard envelope
    summaries: shard i receives the envelope at the END of shard i-1
    (the floor on shard 0 — exactly ``limit_block``'s carry_log=None
    semantics, since floor minus a positive decrement can never beat a
    local a >= floor).

    Inclusive Hillis-Steele doubling first: ppermute fills un-addressed
    shards with zeros — 0.0 is NOT the max-plus identity — so every step
    gates the combine on idx >= d, mirroring
    pv_sharded._cross_shard_exclusive_phasor. The received summary is the
    LEFT operand of (m_l, L_l) . (m_r, L_r) = (max(m_l - c*L_r, m_r),
    L_l + L_r); this shard's running span at step d is exactly d*chunk
    samples (static — left-edge shards that span less never combine), so
    only the scalar m rides ICI."""
    from jax import lax as _lax  # local import keeps module import light

    c32 = np.float32(c)
    idx = _lax.axis_index(axis_name)
    v = m_end
    d = 1
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        r = _lax.ppermute(v, axis_name, perm)
        nv = jnp.maximum(r - c32 * np.float32(d * chunk), v)
        v = jnp.where(idx >= d, nv, v)
        d *= 2
    if sp > 1:
        prefix = _lax.ppermute(
            v, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        return jnp.where(idx == 0, _LOG_FLOOR, prefix)
    return jnp.full_like(v, _LOG_FLOOR)


def _sharded_env_log(x, c: float, axis_name: str, sp: int):
    """This shard's exact global log envelope: local scan + cross-shard
    max-plus prefix merged the way ``limit_block`` merges a streaming
    carry. Zero samples cannot raise the envelope (their log-peak sits at
    the floor), so running on the full padded chunk matches the offline
    full-capacity scan."""
    chunk = x.shape[-1]
    peak = jnp.abs(x).max(axis=0)
    a = jnp.maximum(
        jnp.log(jnp.maximum(peak, np.float32(1e-26))), _LOG_FLOOR
    )
    env_local = envelope_log_scan(a, c)                    # [chunk]
    prefix = _cross_shard_maxplus(env_local[-1], chunk, c, axis_name, sp)
    n_idx = jnp.arange(1, chunk + 1, dtype=jnp.float32)
    return jnp.maximum(env_local, prefix - np.float32(c) * n_idx)


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


# ---------------------------------------------------------------------------
# Compressor — downward compression with soft knee, attack and release.
#
# The detector is the DECOUPLED design (cf. Giannoulis, Massberg &
# Reiss, "Digital Dynamic Range Compressor Design", JAES 2012): an
# instant-attack / exponential-release peak envelope followed by a
# one-pole attack smoother, both in the log domain. Each stage is an
# associative scan on TPU:
#
#   release:  e[n] = max(a[n], e[n-1] - c)        — the limiter's
#             max-plus prefix (envelope_log_scan);
#   attack:   s[n] = alpha*s[n-1] + (1-alpha)*e[n] — a constant-
#             coefficient affine recurrence whose combine
#             (w1, v1) . (w2, v2) = (w1*w2, v1*w2 + v2) is associative
#             (one_pole_log_scan), i.e. an exponential moving average
#             evaluated at log depth.
#
# The static gain computer runs on the smoothed level in dB: hard knee
# g_db = (1/R - 1) * max(0, L - T), or the standard quadratic soft knee
# over [T - W/2, T + W/2]. Below the knee g_db is EXACTLY 0.0 (selected
# by jnp.where, not computed), so with zero makeup the node is a bitwise
# passthrough on quiet material — the same contract the limiter pins.
#
# Streaming carries two scalars (e, s at the previous chunk's last valid
# sample); sharding runs both cross-shard prefixes spatially — the
# limiter's max-plus doubling plus an affine doubling whose per-step
# weight alpha^(d*chunk) is static (only the scalar v rides ICI).
# ---------------------------------------------------------------------------

_NAT_TO_DB = 20.0 / math.log(10.0)
_DB_TO_NAT = math.log(10.0) / 20.0


@dataclasses.dataclass(frozen=True)
class CompressorParams:
    threshold_db: float
    ratio: float
    knee_db: float
    alpha: float        # attack one-pole coefficient
    c: float            # release per-sample log decrement
    makeup: float       # linear makeup gain (exactly 1.0 for 0 dB)


def compressor_params(threshold_db: float, ratio: float, knee_db: float,
                      attack_ms: float, release_ms: float,
                      makeup_db: float, rate: int) -> CompressorParams:
    release_samples = max(1.0, float(release_ms) * 1e-3 * rate)
    attack_samples = max(1e-3, float(attack_ms) * 1e-3 * rate)
    return CompressorParams(
        threshold_db=float(threshold_db),
        ratio=max(1.0, float(ratio)),
        knee_db=max(0.0, float(knee_db)),
        alpha=math.exp(-1.0 / attack_samples),
        c=1.0 / release_samples,
        makeup=float(10.0 ** (float(makeup_db) / 20.0)),
    )


def one_pole_log_scan(e, alpha: float, init):
    """s[n] = alpha*s[n-1] + (1-alpha)*e[n] with s[-1] = ``init``.

    The affine recurrence IS an AR(1) with pole alpha on input
    (1-alpha)*e — evaluated by ops/scans.ar1_scan (blocked MXU GEMM for
    long arrays) — plus the init's contribution w[n] = alpha^(n+1),
    which is a STATIC decay curve computed on host in float64 (it
    underflows to 0 for n >> the attack time — the init is forgotten
    exactly as the recurrence forgets it)."""
    from nodey_tpu.ops.scans import ar1_scan, pole_powers

    a32 = np.float32(alpha)
    v = ar1_scan((np.float32(1.0) - a32) * e, alpha)
    w = pole_powers(alpha, e.shape[-1])[0]
    return v + w * init


def compressor_gain_db(level_db, p: CompressorParams):
    """Static gain computer (dB in, dB of gain out; <= 0). Below the
    knee the result is EXACTLY 0.0 via jnp.where."""
    slope = np.float32(1.0 / p.ratio - 1.0)
    over = level_db - np.float32(p.threshold_db)
    if p.knee_db > 0.0:
        w = np.float32(p.knee_db)
        knee = slope * jnp.square(over + w / 2) / (2 * w)
        g = jnp.where(over >= w / 2, slope * over, knee)
        return jnp.where(over <= -w / 2, np.float32(0.0), g)
    return jnp.where(over > 0, slope * over, np.float32(0.0))


def compress_block(data, p: CompressorParams, carry_env=None,
                   carry_s=None):
    """Compress [C, N] float32; returns (out, env_log, s_log).

    ``carry_env``/``carry_s`` are the two detector states just before
    this block's first sample (None = clip start: both at the floor)."""
    peak = jnp.abs(data).max(axis=0)                       # stereo-linked
    a = jnp.maximum(
        jnp.log(jnp.maximum(peak, np.float32(1e-26))), _LOG_FLOOR
    )
    env_log = envelope_log_scan(a, p.c)
    if carry_env is not None:
        n_idx = jnp.arange(1, data.shape[1] + 1, dtype=jnp.float32)
        env_log = jnp.maximum(
            env_log, carry_env - np.float32(p.c) * n_idx
        )
    init = _LOG_FLOOR if carry_s is None else carry_s
    s_log = one_pole_log_scan(env_log, p.alpha, init)
    g_db = compressor_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    gain = np.float32(p.makeup) * jnp.exp(g_db * np.float32(_DB_TO_NAT))
    return data * gain[None, :], env_log, s_log


def compress_stream(stream: Stream, threshold_db: float, ratio: float,
                    knee_db: float, attack_ms: float, release_ms: float,
                    makeup_db: float) -> Stream:
    """Offline compressor over a whole Stream (zero padding past
    ``length`` never raises the detector; output stays masked because
    0 * gain == 0)."""
    p = compressor_params(threshold_db, ratio, knee_db, attack_ms,
                          release_ms, makeup_db, stream.rate)
    out, _env, _s = compress_block(stream.data, p)
    return stream.with_data(out, fmt=FMT_FLT)


def compressor_stream_init(channels: int):
    """Streaming carry: (release envelope, attack smoother) at the
    previous chunk's last valid sample — two scalars (stereo-linked)."""
    return (jnp.float32(_LOG_FLOOR), jnp.float32(_LOG_FLOOR))


def compressor_stream_step(p: CompressorParams, state, data, n):
    """One chunk: data [C, W], n valid. Invalid trailing samples do not
    advance either detector (carries gather at sample n-1), so streamed
    output equals the offline render to scan re-association."""
    carry_env, carry_s = state
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)
    masked = jnp.where((idx < n)[None, :], data, 0.0)
    out, env_log, s_log = compress_block(
        masked, p, carry_env=carry_env, carry_s=carry_s
    )
    last = jnp.clip(n - 1, 0, data.shape[1] - 1)
    new_env = jnp.where(n > 0, env_log[last], carry_env)
    new_s = jnp.where(n > 0, s_log[last], carry_s)
    return (new_env, new_s), out


def compressor_sharded_local(x, p: CompressorParams, axis_name: str,
                             sp: int):
    """Per-shard compressor body (under ``shard_map`` over ``axis_name``).

    Two cross-shard prefixes, one per detector stage, each one scalar
    per shard riding ICI:

    1. the limiter's exclusive max-plus prefix corrects the local
       release envelope to the exact global one;
    2. an affine Hillis-Steele doubling forms the exclusive prefix of
       the attack smoother: combining at step d scales the received
       partial sum by the static weight alpha^(d*chunk) (the right
       operand's span — same static-span argument as the max-plus
       doubling), and the global init contributes alpha^(i*chunk) *
       floor, computed closed-form per shard.

    The one-pole runs on the CORRECTED envelope, so the sharded smoother
    sees exactly the offline input sequence; agreement vs the offline
    scan is re-association-tight."""
    s_log = _sharded_s_log(x, p.alpha, p.c, axis_name, sp)
    g_db = compressor_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    gain = np.float32(p.makeup) * jnp.exp(g_db * np.float32(_DB_TO_NAT))
    return x * gain[None, :]


def _sharded_s_log(x, alpha: float, c: float, axis_name: str, sp: int):
    """This shard's exact global SMOOTHED log level: the sharded release
    envelope (_sharded_env_log) fed through the one-pole attack smoother
    with an affine cross-shard prefix — the detector both the compressor
    and the gate share, spatialized."""
    from jax import lax as _lax

    chunk = x.shape[-1]
    env_log = _sharded_env_log(x, c, axis_name, sp)

    from nodey_tpu.ops.scans import ar1_scan, pole_powers

    a32 = np.float32(alpha)
    # Local inclusive affine scan (init contribution added after the
    # cross-shard prefix below); the weight plane alpha^(n+1) is a
    # static host decay curve.
    v_incl = ar1_scan((np.float32(1.0) - a32) * env_log, alpha)
    w_incl = pole_powers(alpha, env_log.shape[-1])[0]

    # Cross-shard exclusive prefix of the smoother value. ppermute fills
    # un-addressed shards with zeros — here 0.0 IS the additive
    # identity, but the idx >= d gate is still required so left-edge
    # shards keep their exact spans.
    idx = _lax.axis_index(axis_name)
    v = v_incl[-1]
    d = 1
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        r = _lax.ppermute(v, axis_name, perm)
        nv = r * np.float32(alpha ** (d * chunk)) + v
        v = jnp.where(idx >= d, nv, v)
        d *= 2
    if sp > 1:
        prev = _lax.ppermute(
            v, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        prev = jnp.where(idx == 0, np.float32(0.0), prev)
    else:
        prev = jnp.zeros_like(v)
    # s at the end of shard i-1 = its accumulated sum + the global
    # floor-init decayed over i*chunk samples.
    init_w = jnp.exp(
        idx.astype(jnp.float32)
        * np.float32(chunk * math.log(alpha))
    )
    s_prev = prev + init_w * _LOG_FLOOR
    return v_incl + w_incl * s_prev


def compressor_reference(data: np.ndarray, threshold_db: float,
                         ratio: float, knee_db: float, attack_ms: float,
                         release_ms: float, makeup_db: float,
                         rate: int) -> np.ndarray:
    """Sequential float64 mirror of the exact two-stage recurrence (the
    yardstick the log-depth scans are tested against)."""
    p = compressor_params(threshold_db, ratio, knee_db, attack_ms,
                          release_ms, makeup_db, rate)
    peak = np.abs(data).max(axis=0).astype(np.float64)
    a = np.maximum(np.log(np.maximum(peak, 1e-26)), float(_LOG_FLOOR))
    e = float(_LOG_FLOOR)
    s = float(_LOG_FLOOR)
    gain = np.ones(data.shape[1])
    slope = 1.0 / p.ratio - 1.0
    for i in range(data.shape[1]):
        e = max(float(a[i]), e - p.c)
        s = p.alpha * s + (1.0 - p.alpha) * e
        level_db = s * _NAT_TO_DB
        over = level_db - p.threshold_db
        if p.knee_db > 0.0:
            w = p.knee_db
            if over <= -w / 2:
                g_db = 0.0
            elif over >= w / 2:
                g_db = slope * over
            else:
                g_db = slope * (over + w / 2) ** 2 / (2 * w)
        else:
            g_db = slope * over if over > 0 else 0.0
        gain[i] = p.makeup * 10.0 ** (g_db / 20.0)
    return (data.astype(np.float64) * gain[None, :]).astype(np.float32)


# ---------------------------------------------------------------------------
# Noise gate — downward expansion below a threshold.
#
# Same decoupled detector as the compressor (instant-attack / exponential-
# release max-plus envelope + one-pole smoother, both log-domain
# associative scans), different static curve: at or above threshold the
# gain is EXACTLY 0 dB via jnp.where (bitwise passthrough on loud
# material — the standing transparency contract); below it the gain
# falls at (ratio - 1) dB per dB, floored at -range_db. The detector's
# instant attack means the gate OPENS within the attack smoother's time
# constant and CLOSES at the release rate — the musical convention.
#
# Streaming carries the same two scalars as the compressor; sharding
# reuses the spatialized detector (_sharded_s_log) verbatim.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GateParams:
    threshold_db: float
    ratio: float        # expansion ratio (>= 1); gain slope = ratio - 1
    range_db: float     # maximum attenuation
    alpha: float        # attack one-pole coefficient
    c: float            # release per-sample log decrement


def gate_params(threshold_db: float, ratio: float, range_db: float,
                attack_ms: float, release_ms: float,
                rate: int) -> GateParams:
    release_samples = max(1.0, float(release_ms) * 1e-3 * rate)
    attack_samples = max(1e-3, float(attack_ms) * 1e-3 * rate)
    return GateParams(
        threshold_db=float(threshold_db),
        ratio=max(1.0, float(ratio)),
        range_db=max(0.0, float(range_db)),
        alpha=math.exp(-1.0 / attack_samples),
        c=1.0 / release_samples,
    )


def gate_gain_db(level_db, p: GateParams):
    """Static gate curve (dB in, dB of gain out; <= 0). At or above the
    threshold the result is EXACTLY 0.0 via jnp.where."""
    slope = np.float32(p.ratio - 1.0)
    under = level_db - np.float32(p.threshold_db)
    g = jnp.maximum(slope * under, -np.float32(p.range_db))
    return jnp.where(under >= 0, np.float32(0.0), g)


def gate_block(data, p: GateParams, carry_env=None, carry_s=None):
    """Gate [C, N] float32; returns (out, env_log, s_log) — the same
    detector plumbing as compress_block with the gate's curve."""
    peak = jnp.abs(data).max(axis=0)                       # stereo-linked
    a = jnp.maximum(
        jnp.log(jnp.maximum(peak, np.float32(1e-26))), _LOG_FLOOR
    )
    env_log = envelope_log_scan(a, p.c)
    if carry_env is not None:
        n_idx = jnp.arange(1, data.shape[1] + 1, dtype=jnp.float32)
        env_log = jnp.maximum(
            env_log, carry_env - np.float32(p.c) * n_idx
        )
    init = _LOG_FLOOR if carry_s is None else carry_s
    s_log = one_pole_log_scan(env_log, p.alpha, init)
    g_db = gate_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    gain = jnp.exp(g_db * np.float32(_DB_TO_NAT))
    return data * gain[None, :], env_log, s_log


def gate_stream(stream: Stream, threshold_db: float, ratio: float,
                range_db: float, attack_ms: float,
                release_ms: float) -> Stream:
    """Offline gate over a whole Stream (zero padding past ``length``
    never raises the detector; output stays masked since 0 * gain == 0)."""
    p = gate_params(threshold_db, ratio, range_db, attack_ms,
                    release_ms, stream.rate)
    out, _env, _s = gate_block(stream.data, p)
    return stream.with_data(out, fmt=FMT_FLT)


def gate_stream_init(channels: int):
    """Streaming carry: (release envelope, attack smoother) at the
    previous chunk's last valid sample — two scalars (stereo-linked)."""
    return (jnp.float32(_LOG_FLOOR), jnp.float32(_LOG_FLOOR))


def gate_stream_step(p: GateParams, state, data, n):
    """One chunk: data [C, W], n valid — compressor_stream_step with the
    gate's curve (invalid trailing samples do not advance the detector)."""
    carry_env, carry_s = state
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)
    masked = jnp.where((idx < n)[None, :], data, 0.0)
    out, env_log, s_log = gate_block(
        masked, p, carry_env=carry_env, carry_s=carry_s
    )
    last = jnp.clip(n - 1, 0, data.shape[1] - 1)
    new_env = jnp.where(n > 0, env_log[last], carry_env)
    new_s = jnp.where(n > 0, s_log[last], carry_s)
    return (new_env, new_s), out


def gate_sharded_local(x, p: GateParams, axis_name: str, sp: int):
    """Per-shard gate body (under ``shard_map``): the compressor's
    spatialized two-stage detector (_sharded_s_log) with the gate's
    static curve."""
    s_log = _sharded_s_log(x, p.alpha, p.c, axis_name, sp)
    g_db = gate_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    gain = jnp.exp(g_db * np.float32(_DB_TO_NAT))
    return x * gain[None, :]


def gate_reference(data: np.ndarray, threshold_db: float, ratio: float,
                   range_db: float, attack_ms: float, release_ms: float,
                   rate: int) -> np.ndarray:
    """Sequential float64 mirror of the exact two-stage recurrence + gate
    curve (the yardstick the log-depth scans are tested against)."""
    p = gate_params(threshold_db, ratio, range_db, attack_ms,
                    release_ms, rate)
    peak = np.abs(data).max(axis=0).astype(np.float64)
    a = np.maximum(np.log(np.maximum(peak, 1e-26)), float(_LOG_FLOOR))
    e = float(_LOG_FLOOR)
    s = float(_LOG_FLOOR)
    gain = np.ones(data.shape[1])
    slope = p.ratio - 1.0
    for i in range(data.shape[1]):
        e = max(float(a[i]), e - p.c)
        s = p.alpha * s + (1.0 - p.alpha) * e
        level_db = s * _NAT_TO_DB
        under = level_db - p.threshold_db
        if under >= 0.0:
            g_db = 0.0
        else:
            g_db = max(slope * under, -p.range_db)
        gain[i] = 10.0 ** (g_db / 20.0)
    return (data.astype(np.float64) * gain[None, :]).astype(np.float32)


# ---------------------------------------------------------------------------
# De-esser — split-band sibilance compressor.
#
# The compressor's decoupled detector and static curve (no makeup — a
# de-esser only ever attenuates), keyed by a BANDPASS-filtered sidechain
# (ops/biquad.bandpass on the modal scan engine) and applied as band
# subtraction:
#
#     band = BP(x)                       (RBJ bandpass at freq, Q)
#     g    = compressor gain from the band's smoothed log level
#     out  = x - (1 - g) * band
#
# Below threshold g is EXACTLY 1 (compressor_gain_db's where), so the
# subtraction term is exactly 0.0 * band — a passthrough up to the sign
# of zero; above it only the sibilant band ducks, the rest of the
# spectrum is untouched (the split-band convention; a broadband
# de-esser is just a compressor keyed oddly, and audio_compressor
# already exists).
#
# Streaming carries the bandpass section state plus the detector's two
# scalars; sharding composes the exact pieces that already exist —
# biquad.cascade_sharded_local for the band, _sharded_s_log for the
# detector — with zero new collectives.
# ---------------------------------------------------------------------------


def deesser_params(threshold_db: float, ratio: float, attack_ms: float,
                   release_ms: float, rate: int) -> CompressorParams:
    """The de-esser reuses CompressorParams verbatim with no knee and
    no makeup (pure attenuation)."""
    return compressor_params(threshold_db, ratio, 0.0, attack_ms,
                             release_ms, 0.0, rate)


def deess_block(x, band, p: CompressorParams, carry_env=None,
                carry_s=None):
    """De-ess [C, N] float32 given its sidechain band; returns
    (out, env_log, s_log) — the same carry contract as
    ``compress_block``, but detecting on ``band`` and applying as band
    subtraction."""
    peak = jnp.abs(band).max(axis=0)                      # stereo-linked
    a = jnp.maximum(
        jnp.log(jnp.maximum(peak, np.float32(1e-26))), _LOG_FLOOR
    )
    env_log = envelope_log_scan(a, p.c)
    if carry_env is not None:
        n_idx = jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)
        env_log = jnp.maximum(
            env_log, carry_env - np.float32(p.c) * n_idx
        )
    init = _LOG_FLOOR if carry_s is None else carry_s
    s_log = one_pole_log_scan(env_log, p.alpha, init)
    g_db = compressor_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    g = jnp.exp(g_db * np.float32(_DB_TO_NAT))
    out = x - (np.float32(1.0) - g)[None, :] * band
    return out, env_log, s_log


def deess_stream(stream, threshold_db: float, ratio: float, freq: float,
                 q: float, attack_ms: float, release_ms: float):
    """Offline de-esser over a whole Stream."""
    from nodey_tpu.ops import biquad as bq

    sections = bq.prepare_all([bq.bandpass(freq, q, stream.rate)])
    p = deesser_params(threshold_db, ratio, attack_ms, release_ms,
                       stream.rate)
    idx = jnp.arange(stream.capacity, dtype=jnp.int32)
    x = jnp.where((idx < stream.length)[None, :], stream.data, 0.0)
    band, _ = bq.cascade_apply(x, sections)
    out, _, _ = deess_block(x, band, p)
    out = jnp.where((idx < stream.length)[None, :], out, 0.0)
    return stream.with_data(out, fmt="flt")


def deesser_stream_init(channels: int, sections):
    from nodey_tpu.ops import biquad as bq

    return (bq.cascade_stream_init(channels, sections),
            jnp.float32(_LOG_FLOOR), jnp.float32(_LOG_FLOOR))


def deesser_stream_step(sections, p: CompressorParams, state, data, n):
    """One chunk [C, W], n valid: band through the carried bandpass
    state, detector through the carried scalars — all gathers at sample
    n-1 (the compressor/biquad streaming contracts composed)."""
    from nodey_tpu.ops import biquad as bq

    bq_state, carry_env, carry_s = state
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    new_bq, band = bq.cascade_stream_step(sections, bq_state, x, n)
    band = jnp.where((idx < n)[None, :], band, 0.0)
    out, env_log, s_log = deess_block(
        x, band, p, carry_env=carry_env, carry_s=carry_s
    )
    last = jnp.clip(n - 1, 0, data.shape[1] - 1)
    new_env = jnp.where(n > 0, env_log[last], carry_env)
    new_s = jnp.where(n > 0, s_log[last], carry_s)
    return (new_bq, new_env, new_s), out


def deesser_sharded_local(x, sections, p: CompressorParams,
                          axis_name: str, sp: int):
    """Per-shard de-esser body: the exact sharded band
    (biquad.cascade_sharded_local) feeding the exact spatialized
    detector (_sharded_s_log on the band), then the same static curve
    and band subtraction."""
    from nodey_tpu.ops import biquad as bq

    band = bq.cascade_sharded_local(x, list(sections), axis_name, sp)
    s_log = _sharded_s_log(band, p.alpha, p.c, axis_name, sp)
    g_db = compressor_gain_db(s_log * np.float32(_NAT_TO_DB), p)
    g = jnp.exp(g_db * np.float32(_DB_TO_NAT))
    return x - (np.float32(1.0) - g)[None, :] * band


def deesser_reference(data: np.ndarray, threshold_db: float,
                      ratio: float, freq: float, q: float,
                      attack_ms: float, release_ms: float,
                      rate: int) -> np.ndarray:
    """Sequential float64 mirror: the biquad mirror's band (same
    f32-rounded coefficients as the device) through the compressor
    mirror's detector, applied as band subtraction."""
    from nodey_tpu.ops import biquad as bq

    sections = bq.prepare_all([bq.bandpass(freq, q, rate)])
    band = bq.cascade_reference(data, sections).astype(np.float64)
    p = deesser_params(threshold_db, ratio, attack_ms, release_ms, rate)
    peak = np.abs(band).max(axis=0)
    a = np.maximum(np.log(np.maximum(peak, 1e-26)), float(_LOG_FLOOR))
    e = float(_LOG_FLOOR)
    s = float(_LOG_FLOOR)
    gain = np.ones(data.shape[1])
    slope = 1.0 / p.ratio - 1.0
    for i in range(data.shape[1]):
        e = max(float(a[i]), e - p.c)
        s = p.alpha * s + (1.0 - p.alpha) * e
        over = s * _NAT_TO_DB - p.threshold_db
        g_db = slope * over if over > 0 else 0.0
        gain[i] = 10.0 ** (g_db / 20.0)
    out = data.astype(np.float64) - (1.0 - gain)[None, :] * band
    return out.astype(np.float32)
