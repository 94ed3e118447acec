"""Corrupt/hostile input files through the decode surface: every failure
must be a structured ProcessorRuntimeError (the reference's 3-part error
shape, processor.hpp:64-77) — never a raw ZeroDivisionError/struct.error/
segfault — and valid-prefix truncations must not hang or over-read."""

import numpy as np
import pytest

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import native_lib

from conftest import make_tone

needs_native = pytest.mark.skipif(
    not native_lib.available(), reason="native host runtime unavailable"
)


def _valid_wav_bytes(tmp_path, seconds=0.5):
    tone = make_tone(rate=22_050, seconds=seconds, channels=2)
    p = tmp_path / "ok.wav"
    host_decode.write_wav_s16(str(p), tone, 22_050)
    return p.read_bytes()


# Inputs that can never yield audio — these MUST raise the structured
# error. (A file cut mid-data still contains a decodable valid prefix and
# is covered by the tolerant test below, matching FFmpeg's behavior.)
CORRUPTIONS = [
    ("empty", lambda b: b""),
    ("garbage", lambda b: b"\x00\xff" * 600),
    ("riff-only", lambda b: b[:4]),
    ("header-only", lambda b: b[:12]),
    ("truncated-fmt", lambda b: b[:20]),
    ("wrong-magic", lambda b: b"XXXX" + b[4:]),
    ("not-audio", lambda b: b"%PDF-1.4 " + b"A" * 2000),
]


@needs_native
@pytest.mark.parametrize("name,mutate", CORRUPTIONS)
def test_native_decode_structured_errors(tmp_path, name, mutate):
    ok = _valid_wav_bytes(tmp_path)
    bad = tmp_path / f"{name}.wav"
    bad.write_bytes(mutate(ok))
    with pytest.raises(ProcessorRuntimeError) as exc:
        host_decode.decode_file(str(bad))
    # The 3-part shape survives: message + explanation + detail.
    assert exc.value.message and exc.value.explanation


@needs_native
@pytest.mark.parametrize("name,mutate", CORRUPTIONS)
def test_native_stream_decode_structured_errors(tmp_path, name, mutate):
    ok = _valid_wav_bytes(tmp_path)
    bad = tmp_path / f"{name}.wav"
    bad.write_bytes(mutate(ok))
    with pytest.raises(ProcessorRuntimeError):
        with host_decode.StreamDecoder(str(bad)) as dec:
            for _ in dec.blocks(4096):
                pass


@needs_native
def test_native_decode_mid_data_truncation(tmp_path):
    """A file cut mid-data (valid header) decodes the valid prefix without
    hanging or fabricating samples beyond the file."""
    ok = _valid_wav_bytes(tmp_path, seconds=0.5)
    cut = tmp_path / "cut.wav"
    cut.write_bytes(ok[: len(ok) // 2])
    try:
        decoded = host_decode.decode_file(str(cut))
    except ProcessorRuntimeError:
        return  # structured rejection is also acceptable
    assert decoded.data.shape[0] == 2
    # Roughly half the samples — and definitely not more than the whole.
    n_full = int(22_050 * 0.5)
    assert 0 < decoded.data.shape[1] <= n_full
    assert np.isfinite(decoded.data).all()
