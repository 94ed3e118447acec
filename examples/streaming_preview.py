"""Real-time preview through the streaming session: pull 48 kHz stereo
blocks at 1.0x pacing, exactly what the editor's audible preview and the
playback sink consume (the reference's SDL-paced preview loop,
audio-io.cpp:504-637, as a Python iterator).

Run:  python examples/streaming_preview.py [input.wav] [--no-realtime]
With no input it synthesizes a 2 s sweep. Blocks stream with bounded
memory (O(chunk), not O(clip)) for any clip length.
"""

import argparse
import pathlib
import sys

# Running from the source tree (not pip-installed): make the repo root
# importable no matter the working directory.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", nargs="?", help="input audio file")
    parser.add_argument(
        "--no-realtime", action="store_true",
        help="run unpaced (as fast as the pipeline allows)",
    )
    args = parser.parse_args(argv)

    path = args.input
    if not path:
        from nodey_tpu.host import decode as host_decode

        rate, seconds = 44_100, 2.0
        t = np.arange(int(rate * seconds)) / rate
        sweep = 0.4 * np.sin(
            2 * np.pi * (200.0 + 1800.0 * t / seconds) * t
        ).astype(np.float32)
        path = "example_sweep.wav"  # cwd: visible, race-free, no /tmp litter
        host_decode.write_wav_s16(path, np.stack([sweep, sweep]), rate)
        print(f"(no input given — synthesized ./{path})")

    from nodey_tpu import Graph, processor_map, register_all_processors
    from nodey_tpu.core.streaming import StreamingSession

    register_all_processors()
    g = Graph()
    src = g.add_node(processor_map["audio_input"].generate())
    g.nodes[src].processor.file_paths = [path]
    g.update_node_pin(src)
    out = g.add_node(processor_map["audio_output"].generate())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(out, "input"))
    g.check_graph()

    session = StreamingSession(g)
    session.start(streamed=True)
    total = 0
    peak = 0.0
    for block in session.blocks(realtime=not args.no_realtime):
        total += block.shape[1]
        peak = max(peak, float(np.abs(block).max()))
        print(
            f"\rblock {block.shape} | {total / 48_000.0:6.2f} s | "
            f"peak {peak:.3f} | queue fill "
            f"{session.queue.stats.fill_ratio:.2f}",
            end="", flush=True,
        )
    print(f"\ndone: {total / 48_000.0:.2f} s of 48 kHz stereo preview")
    return 0


if __name__ == "__main__":
    sys.exit(main())
