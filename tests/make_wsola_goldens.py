"""Generate frozen WSOLA goldens (run manually; output is committed).

    JAX_PLATFORMS=cpu python tests/make_wsola_goldens.py

Captures, for a (rate, tempo) matrix on a seeded deterministic signal:
the chosen splice offsets (the full decision record of the serial WSOLA
chain), the first 2048 output samples, and the exact output length —
from the PRODUCTION CPU path (ops/stretch.wsola_stretch_at_rate). A
refactor that changes splice decisions (reference behavior anchor:
/root/reference/src/processor/audio-velocity.cpp:369-427) now fails
tests/test_stretch.py::test_frozen_goldens instead of drifting silently
(round-1 VERDICT item 7)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from nodey_tpu.ops import stretch as stretch_ops

CASES = [
    (48_000, 0.8), (48_000, 1.25), (48_000, 2.0), (48_000, 1.1037),
    (44_100, 0.8), (44_100, 1.25), (44_100, 2.0),
]
HEAD = 2048


def case_signal(rate: int) -> np.ndarray:
    n = int(rate * 1.2)
    t = np.arange(n, dtype=np.float64) / rate
    sig = (
        0.35 * np.sin(2 * np.pi * 220.0 * t)
        + 0.2 * np.sin(2 * np.pi * 513.0 * t + 0.7)
        + 0.1 * np.sin(2 * np.pi * 1877.0 * t + 1.3)
    )
    rng = np.random.default_rng(20260817)
    noise = 0.05 * rng.standard_normal((2, n))
    return (np.stack([sig, sig * 0.85]) + noise).astype(np.float32)


def main() -> None:
    blobs = {}
    for rate, tempo in CASES:
        data = case_signal(rate)
        N = data.shape[1]
        out, out_len = stretch_ops.wsola_stretch_at_rate(
            jnp.asarray(data), jnp.int32(N), tempo, rate
        )
        out = np.asarray(out)
        out_len = int(out_len)

        # Decision record via the blocked chain (decision-equal to the
        # scan; same padded geometry as _wsola_impl).
        seq, seek, overlap = stretch_ops._params(rate)
        K = stretch_ops._out_chunks(N, tempo, seq, overlap)
        num = int(round((seq - overlap) * tempo * 65536))
        den = 65536
        last_pos = ((K - 1) * num + den // 2) // den
        pad_to = last_pos + seek + seq + 2
        x = jnp.pad(jnp.asarray(data), ((0, 0), (0, max(0, pad_to - N))))
        bs, _body = stretch_ops.wsola_chain_blocked(
            x, x[:, :overlap], jnp.int32(0), K, num, den, seq, seek, overlap
        )
        key = f"{rate}_{tempo}"
        blobs[f"{key}_bs"] = np.asarray(bs, np.int32)
        blobs[f"{key}_head"] = out[:, :HEAD]
        blobs[f"{key}_len"] = np.int64(out_len)
        print(f"{key}: K={K} len={out_len} bs[:8]={np.asarray(bs)[:8]}")

    path = os.path.join(os.path.dirname(__file__), "goldens", "wsola.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **blobs)
    print("wrote", path)


if __name__ == "__main__":
    # In-process pin: this rig's sitecustomize re-pins jax_platforms at
    # interpreter start, so the env var alone is ignored (goldens must
    # come from the CPU backend, never a remote device). Kept OUT of
    # module scope: the regression test imports case_signal, and a
    # module-level config update would silently repin the whole pytest
    # process to CPU.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nodey_tpu.config import enable_compile_cache

    enable_compile_cache()
    main()
