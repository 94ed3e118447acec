"""Streamed export of a TIME-VARIANT graph: pitch shift + tempo change.

The velocity/pitch nodes drive the WSOLA engine (the SoundTouch
replacement — reference: src/processor/audio-velocity.cpp:384-385, 457),
and since round 2 such graphs stream on every backend by default: the
chunk-flow executor runs the blocked WSOLA chain with bounded device
state, emitting MP3 audio while later chunks are still computing —
exactly the reference's always-live pipeline, in fused-XLA form.

    audio_input -> pitch(+3 semitones) -> velocity(1.25x, keep pitch)
                -> audio_output

Run:  python examples/pitch_shift_streamed.py [input.wav] [-o out.mp3]
With no arguments it synthesizes a 5 s test melody first.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_graph(path):
    from nodey_tpu import Graph, processor_map, register_all_processors

    register_all_processors()
    g = Graph()
    src = g.add_node(processor_map["audio_input"].generate())
    g.nodes[src].processor.file_paths = [path]
    g.update_node_pin(src)
    pitch = g.add_node(processor_map["pitch_modifier"].generate())
    g.nodes[pitch].processor.pitch = 3.0
    vel = g.add_node(processor_map["velocity_modifier"].generate())
    g.nodes[vel].processor.set_velocity(1.25)
    g.nodes[vel].processor.keep_pitch = True
    out = g.add_node(processor_map["audio_output"].generate())

    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(pitch, "input"))
    g.add_link(pin(pitch, "output"), pin(vel, "input"))
    g.add_link(pin(vel, "output"), pin(out, "input"))
    g.check_graph()
    return g


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", nargs="?", help="input audio file")
    parser.add_argument("-o", "--output", default="example_pitch.mp3")
    parser.add_argument("--kbps", type=int, default=256)
    args = parser.parse_args(argv)

    path = args.input
    if not path:
        from nodey_tpu.host import decode as host_decode

        rate, seconds = 48_000, 5.0
        t = np.arange(int(rate * seconds)) / rate
        notes = 220.0 * 2 ** (np.floor(t * 2.0) / 4.0)
        tone = np.stack([
            0.4 * np.sin(2 * np.pi * notes * t),
            0.4 * np.sin(2 * np.pi * notes * t * 1.5),
        ]).astype(np.float32)
        path = "example_melody.wav"
        host_decode.write_wav_s16(path, tone, rate)
        print(f"(no input given — synthesized ./{path})")

    from nodey_tpu.core.runner import Runner

    g = build_graph(path)
    runner = Runner(g)
    metrics = runner.export_streamed(args.output, kbps=args.kbps)
    print(
        f"exported {metrics.audio_seconds:.1f} audio-s (pitch +3, tempo "
        f"1.25x) to {args.output} in {metrics.wall_seconds:.1f} s "
        f"(RTF {metrics.rtf:.1f}x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
