"""Phase-vocoder tempo stage with transient preservation.

The PV tempo stage (``algorithm: "pv"`` — the second algorithm family
beside the reference-parity WSOLA chain) smears sharp attacks like
every phase vocoder: by the time an onset arrives, the accumulated
synthesis phase has forgotten the waveform's alignment. Setting
``pv_transient`` applies the standard fix — at detected onsets the
synthesis phase snaps back to that frame's analysis phase — expressed
TPU-natively as a segmented phasor prefix scan (ops/pv.py), so it costs
no extra passes, communication, or control flow.

    audio_input -> velocity(1.3x, keep pitch, pv + transients)
                -> audio_output

Run:  python examples/pv_transients.py [input.wav] [-o out.mp3]
With no arguments it synthesizes a 4 s plucked-melody test signal
(sharp attacks + exponential decay — the material transient reset is
for) and also renders the non-transient PV for comparison.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_graph(path, transient: bool):
    from nodey_tpu import Graph, processor_map, register_all_processors

    register_all_processors()
    g = Graph()
    src = g.add_node(processor_map["audio_input"].generate())
    g.nodes[src].processor.file_paths = [path]
    g.update_node_pin(src)
    vel = g.add_node(processor_map["velocity_modifier"].generate())
    p = g.nodes[vel].processor
    p.set_velocity(1.3)
    p.keep_pitch = True
    p.set_algorithm("pv")
    p.pv_transient = transient
    out = g.add_node(processor_map["audio_output"].generate())
    pin = lambda n, pn: g.nodes[n].pin_name_map[pn]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vel, "input"))
    g.add_link(pin(vel, "output"), pin(out, "input"))
    g.check_graph()
    return g


def synthesize_plucks(path):
    """Sharp attacks + exponential decays: each pluck's onset is a
    spectral-flux spike far past the reset threshold."""
    from nodey_tpu.host import decode as host_decode

    rate, seconds = 48_000, 4.0
    n = int(rate * seconds)
    t = np.arange(n) / rate
    sig = np.zeros(n)
    for i, semi in enumerate([0, 4, 7, 12, 7, 4, 0, -5]):
        start = int(i * 0.5 * rate)
        dur = min(int(0.45 * rate), n - start)
        tt = np.arange(dur) / rate
        f = 220.0 * 2 ** (semi / 12.0)
        pluck = np.exp(-6.0 * tt) * (
            0.5 * np.sin(2 * np.pi * f * tt)
            + 0.25 * np.sin(2 * np.pi * 2 * f * tt)
            + 0.12 * np.sin(2 * np.pi * 3 * f * tt)
        )
        sig[start:start + dur] += pluck
    tone = np.stack([sig, sig * 0.85]).astype(np.float32)
    host_decode.write_wav_s16(path, np.clip(tone, -1, 1), rate)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", nargs="?", help="input audio file")
    parser.add_argument("-o", "--output", default="example_pv_transient.mp3")
    parser.add_argument("--kbps", type=int, default=256)
    args = parser.parse_args(argv)

    path = args.input
    compare = False
    if not path:
        path = "example_plucks.wav"
        synthesize_plucks(path)
        compare = True
        print(f"(no input given — synthesized ./{path})")

    from nodey_tpu.core.runner import Runner

    metrics = Runner(build_graph(path, True)).export_streamed(
        args.output, kbps=args.kbps
    )
    print(
        f"exported {metrics.audio_seconds:.1f} audio-s (pv tempo 1.3x, "
        f"transient reset ON) to {args.output} in "
        f"{metrics.wall_seconds:.1f} s (RTF {metrics.rtf:.1f}x)"
    )
    if compare:
        plain = str(pathlib.Path(args.output).with_suffix("")) + "_plain.mp3"
        Runner(build_graph(path, False)).export_streamed(
            plain, kbps=args.kbps
        )
        print(f"comparison render without transient reset: {plain}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
