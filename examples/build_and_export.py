"""Build a graph through the public node API and export it to MP3.

The programmatic counterpart of drawing this graph in the editor
(reference workflow: add nodes from the registry, link pins, export —
src/frontend/app.cpp:1700-1839, 2042-2094):

    audio_input -> volume(1.5x) -> spectrum tap -> audio_output

Run:  python examples/build_and_export.py [input.wav ...] [-o out.mp3]
With no arguments it synthesizes a 3 s test tone first.
"""

import argparse
import pathlib
import sys

# Running from the source tree (not pip-installed): make the repo root
# importable no matter the working directory.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_graph(paths):
    from nodey_tpu import Graph, processor_map, register_all_processors

    register_all_processors()
    g = Graph()
    src = g.add_node(processor_map["audio_input"].generate())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)  # materialize one output pin per file slot
    vol = g.add_node(processor_map["audio_volume_adjust"].generate())
    g.nodes[vol].processor.set_volume(1.5)
    spec = g.add_node(processor_map["audio_spectrum"].generate())
    out = g.add_node(processor_map["audio_output"].generate())

    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(spec, "input"))
    g.add_link(pin(spec, "output"), pin(out, "input"))
    g.check_graph()  # full validation: types, fan-in, cycles, reachability
    return g


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="*", help="input audio files")
    parser.add_argument("-o", "--output", default="example_out.mp3")
    parser.add_argument("--kbps", type=int, default=320)
    args = parser.parse_args(argv)

    paths = args.inputs
    if not paths:
        from nodey_tpu.host import decode as host_decode

        rate, seconds = 44_100, 3.0
        t = np.arange(int(rate * seconds)) / rate
        tone = np.stack([
            0.4 * np.sin(2 * np.pi * 440.0 * t),
            0.4 * np.sin(2 * np.pi * 660.0 * t),
        ]).astype(np.float32)
        wav = "example_tone.wav"  # cwd: visible, race-free, no /tmp litter
        host_decode.write_wav_s16(wav, tone, rate)
        paths = [wav]
        print(f"(no inputs given — synthesized ./{wav})")

    from nodey_tpu.core.runner import Runner

    g = build_graph(paths)
    runner = Runner(g)
    # Fully pipelined: decode || device chunk-step || d2h || LAME.
    metrics = runner.export_streamed(args.output, kbps=args.kbps)
    print(
        f"exported {metrics.audio_seconds:.1f} audio-s to {args.output} "
        f"in {metrics.wall_seconds:.1f} s (RTF {metrics.rtf:.1f}x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
