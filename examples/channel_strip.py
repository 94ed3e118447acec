"""A full channel strip through the extension nodes, streamed to MP3.

    audio_input -> gate -> EQ -> compressor -> phaser -> width -> pan
                -> delay -> reverb -> fade -> limiter -> audio_output

Every stage is one of the target-spec extension processors: the gate
and compressor run their detectors as log-depth associative scans, the
EQ's biquads as modal first-order scans, the phaser's swept allpass
cascade as time-varying-pole scans, the width as a mid/side channel
matrix, the pan as a constant-power placement, the delay as an exact
K-echo comb, the reverb as partitioned real-DFT GEMM convolution, the
fade as an int32-exact analytic envelope, and the limiter as a max-plus
prefix (ops/{dynamics,biquad,phaser,fadepan,delay,reverb}.py).
The export is chunk-streamed end to end; the delay and reverb tails
grow the output past the input and flush after EOF.

Run:  python examples/channel_strip.py [input.wav ...] [-o out.mp3]
With no arguments it synthesizes a gated test signal first (tone
phrases with near-silent gaps, so the gate audibly works).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_graph(paths):
    from nodey_tpu import Graph, processor_map, register_all_processors

    register_all_processors()
    g = Graph()
    src = g.add_node(processor_map["audio_input"].generate())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)

    def node(ident, **params):
        nid = g.add_node(processor_map[ident].generate())
        proc = g.nodes[nid].processor
        for key, value in params.items():
            setter = getattr(proc, f"set_{key}", None)
            if setter is not None:
                setter(value)
            else:
                proc.set_param(key, value)
        return nid

    gate = node("audio_gate", threshold_db=-45.0, ratio=6.0,
                release_ms=150.0)
    eq = node("audio_eq", ls_gain_db=2.0, p2_freq=2500.0, p2_gain_db=3.0,
              hs_gain_db=1.5)
    comp = node("audio_compressor", threshold_db=-16.0, ratio=3.0,
                attack_ms=5.0, release_ms=120.0, makeup_db=2.0)
    phs = node("audio_phaser", rate_hz=0.4, f_min_hz=300.0,
               f_max_hz=2500.0, wet=0.5)
    wid = node("audio_width", width=1.4)
    pan = node("audio_pan", pan=-0.25)
    dly = node("audio_delay", delay_ms=240.0, feedback=0.35, wet=0.18)
    rev = node("audio_reverb", decay_s=1.2, wet=0.2)
    fade = node("audio_fade", in_ms=120.0, out_start_s=3.5, out_ms=600.0)
    lim = node("audio_limiter", threshold_db=-1.0, release_ms=60.0)
    out = g.add_node(processor_map["audio_output"].generate())

    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    chain = [src, gate, eq, comp, phs, wid, pan, dly, rev, fade, lim,
             out]
    prev, prev_pin = src, "output_0"
    for nid in chain[1:]:
        g.add_link(pin(prev, prev_pin), pin(nid, "input"))
        prev, prev_pin = nid, "output"
    g.check_graph()
    return g


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="*", help="input audio files")
    parser.add_argument("-o", "--output", default="channel_strip_out.mp3")
    parser.add_argument("--kbps", type=int, default=320)
    args = parser.parse_args(argv)

    paths = args.inputs
    if not paths:
        from nodey_tpu.host import decode as host_decode

        rate, seconds = 44_100, 4.0
        t = np.arange(int(rate * seconds)) / rate
        tone = np.stack([
            0.4 * np.sin(2 * np.pi * 330.0 * t),
            0.4 * np.sin(2 * np.pi * 495.0 * t),
        ]).astype(np.float32)
        # Phrase / near-silence / phrase — material for the gate.
        env = np.ones_like(t, dtype=np.float32)
        q = len(t) // 4
        env[q: 2 * q] = 0.002
        env[3 * q:] = 0.002
        tone *= env[None, :]
        wav = "channel_strip_tone.wav"
        host_decode.write_wav_s16(wav, tone, rate)
        paths = [wav]
        print(f"(no inputs given — synthesized ./{wav})")

    from nodey_tpu.core.runner import Runner

    g = build_graph(paths)
    runner = Runner(g)
    metrics = runner.export_streamed(args.output, kbps=args.kbps)
    print(
        f"exported {metrics.audio_seconds:.1f} audio-s to {args.output} "
        f"in {metrics.wall_seconds:.1f} s (RTF {metrics.rtf:.1f}x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
