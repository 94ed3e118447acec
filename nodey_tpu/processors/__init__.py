"""Built-in node processors.

The eight reference node types with exact identifiers, pin names and serde
(reference: src/register.cpp:14-24):

    audio_input, audio_output, audio_volume_adjust, velocity_modifier,
    pitch_modifier, audio_amix, audio_bimix, audio_bimix_v2

plus four target-spec extensions (three the reference promised but never
shipped — BASELINE configs 2/4/5; FFTW declared-but-unused, reference
xmake.lua:15 — and the master-bus dynamics stages):

    audio_split, audio_resample, audio_spectrum, audio_limiter,
    audio_compressor, audio_eq, audio_filter, audio_reverb,
    audio_delay, audio_gate, audio_tremolo, audio_chorus,
    audio_phaser, audio_pan, audio_width, audio_fade, audio_crossfade,
    audio_normalize, audio_deesser, audio_generator, audio_trim,
    audio_reverse
"""

from __future__ import annotations

from nodey_tpu.core.registry import register_processor


def register_builtin_processors() -> None:
    """Register every built-in node (reference: src/register.cpp:14-24)."""
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput
    from nodey_tpu.processors.audio_vol import AudioVol
    from nodey_tpu.processors.velocity import PitchModifier, VelocityModifier
    from nodey_tpu.processors.amix import AudioAmix
    from nodey_tpu.processors.bimix import AudioBimix, AudioBimixV2
    from nodey_tpu.processors.split import AudioSplit
    from nodey_tpu.processors.resample_node import AudioResample
    from nodey_tpu.processors.spectrum import AudioSpectrum
    from nodey_tpu.processors.limiter import AudioLimiter
    from nodey_tpu.processors.compressor import AudioCompressor
    from nodey_tpu.processors.equalizer import AudioEq, AudioFilter
    from nodey_tpu.processors.reverb import AudioReverb
    from nodey_tpu.processors.delay import AudioDelay
    from nodey_tpu.processors.gate import AudioGate
    from nodey_tpu.processors.modulation import (
        AudioChorus,
        AudioPhaser,
        AudioTremolo,
    )
    from nodey_tpu.processors.pan import AudioPan, AudioWidth
    from nodey_tpu.processors.fade import AudioFade
    from nodey_tpu.processors.crossfade import AudioCrossfade
    from nodey_tpu.processors.normalize import AudioNormalize
    from nodey_tpu.processors.deesser import AudioDeesser
    from nodey_tpu.processors.generator import AudioGenerator
    from nodey_tpu.processors.editnodes import AudioReverse, AudioTrim

    for cls in (
        AudioInput,
        AudioOutput,
        AudioVol,
        VelocityModifier,
        PitchModifier,
        AudioAmix,
        AudioBimix,
        AudioBimixV2,
        AudioSplit,
        AudioResample,
        AudioSpectrum,
        AudioLimiter,
        AudioCompressor,
        AudioEq,
        AudioFilter,
        AudioReverb,
        AudioDelay,
        AudioGate,
        AudioTremolo,
        AudioChorus,
        AudioPhaser,
        AudioPan,
        AudioWidth,
        AudioFade,
        AudioCrossfade,
        AudioNormalize,
        AudioDeesser,
        AudioGenerator,
        AudioTrim,
        AudioReverse,
    ):
        register_processor(cls)
