"""Generate frozen phase-vocoder goldens (run manually; output committed).

    JAX_PLATFORMS=cpu python tests/make_pv_goldens.py

Captures, for a (rate, tempo) matrix on a seeded deterministic signal
and BOTH lock settings: the exact output length plus three sparse
waveform windows (head / middle / pre-tail) and a float64 |out| sum —
from the PRODUCTION CPU path (ops/pv.pv_stretch_at_rate). PV has no
external sample-level oracle (see ops/pv.py module docstring), so the
committed goldens are the drift anchor: a refactor that changes peak
picking, phase propagation, or DFT numerics fails
tests/test_pv.py::test_frozen_goldens instead of drifting silently
(mirrors the WSOLA goldens from round-1 VERDICT item 7)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

CASES = [
    (48_000, 0.8), (48_000, 1.25), (48_000, 2.0),
    (44_100, 1.25), (44_100, 2.0),
]
WIN = 2048


def case_signal(rate: int) -> np.ndarray:
    n = int(rate * 1.2)
    t = np.arange(n, dtype=np.float64) / rate
    sig = (
        0.35 * np.sin(2 * np.pi * 220.0 * t)
        + 0.2 * np.sin(2 * np.pi * 513.0 * t + 0.7)
        + 0.1 * np.sin(2 * np.pi * 1877.0 * t + 1.3)
    )
    rng = np.random.default_rng(20260818)
    noise = 0.05 * rng.standard_normal((2, n))
    return (np.stack([sig, sig * 0.85]) + noise).astype(np.float32)


def windows(out: np.ndarray, out_len: int) -> dict:
    mid = max(0, out_len // 2 - WIN // 2)
    tail = max(0, out_len - 1024 - WIN)
    return {
        "head": out[:, :WIN].copy(),
        "mid": out[:, mid:mid + WIN].copy(),
        "tail": out[:, tail:tail + WIN].copy(),
        "absum": np.float64(np.abs(out[:, :out_len], dtype=np.float64).sum()),
    }


# Non-default option paths (VERDICT r2 weak #6: goldens must also pin
# the documented-precision-floor configurations so a refactor cannot
# silently widen them): onset phase reset and the cepstral formant
# pre-warp, each frozen at one (rate, tempo).
OPTION_CASES = [
    # (key suffix, rate, tempo, kwargs)
    ("T", 48_000, 1.25, {"transient": True}),
    ("F", 48_000, 1.25, {"formant_ratio": 2 ** (4 / 12.0)}),
    ("TF", 48_000, 2.0,
     {"transient": True, "formant_ratio": 2 ** (-3 / 12.0)}),
]


def main() -> None:
    from nodey_tpu.ops import pv as pv_ops

    blobs = {}
    for rate, tempo in CASES:
        data = case_signal(rate)
        N = data.shape[1]
        for lock in (True, False):
            out, out_len = pv_ops.pv_stretch_at_rate(
                jnp.asarray(data), jnp.int32(N), tempo, rate, lock=lock
            )
            out, out_len = np.asarray(out), int(out_len)
            key = f"{rate}_{tempo}_{'L' if lock else 'U'}"
            blobs[f"{key}_len"] = np.int64(out_len)
            for name, arr in windows(out, out_len).items():
                blobs[f"{key}_{name}"] = arr
            print(f"{key}: len={out_len} absum={blobs[f'{key}_absum']:.3f}")

    for suffix, rate, tempo, kwargs in OPTION_CASES:
        data = case_signal(rate)
        N = data.shape[1]
        out, out_len = pv_ops.pv_stretch_at_rate(
            jnp.asarray(data), jnp.int32(N), tempo, rate, lock=True,
            **kwargs,
        )
        out, out_len = np.asarray(out), int(out_len)
        key = f"{rate}_{tempo}_{suffix}"
        blobs[f"{key}_len"] = np.int64(out_len)
        for name, arr in windows(out, out_len).items():
            blobs[f"{key}_{name}"] = arr
        print(f"{key}: len={out_len} absum={blobs[f'{key}_absum']:.3f}")

    path = os.path.join(os.path.dirname(__file__), "goldens", "pv.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **blobs)
    print("wrote", path)


if __name__ == "__main__":
    # In-process pin (see make_wsola_goldens.py): the rig's sitecustomize
    # re-pins jax_platforms at interpreter start, so the env var alone is
    # ignored; goldens must come from the CPU backend. Kept out of module
    # scope so the regression test can import case_signal/windows without
    # repinning the pytest process.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nodey_tpu.config import enable_compile_cache

    enable_compile_cache()
    main()
