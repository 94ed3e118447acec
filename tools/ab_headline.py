"""Headline attribution: the 5-node flagship's 13.4 ms (300 s stereo),
split by ablation — full graph, no-spectrum (4-node), 48 kHz inputs
(no resample), and both.  Uses bench.py's own builders + probe-corrected
measurement so numbers line up with the official metric.

Run: python tools/ab_headline.py [seconds]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def _build(tmp, seconds, rate, spectrum):
    import __graft_entry__ as graft
    from nodey_tpu.core.graph import Graph  # noqa: F401

    paths = bench._write_tracks(tmp, 2, seconds, rate, 2)
    g, _src = graft._flagship_graph(paths)
    if not spectrum:
        # remove the spectrum node, rewire amix -> output
        spec_id = next(
            nid for nid, n in g.nodes.items()
            if n.processor.__class__.__name__ == "AudioSpectrum"
        )
        amix_out = None
        out_in = None
        for link_id, link in list(g.links.items()):
            if g.pins[link.to_pin].parent == spec_id:
                amix_out = link.from_pin
                g.remove_link(link_id)
            elif g.pins[link.from_pin].parent == spec_id:
                out_in = link.to_pin
                g.remove_link(link_id)
        g.remove_node(spec_id)
        g.add_link(amix_out, out_in)
    return g


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    import jax

    with tempfile.TemporaryDirectory() as tmp:
        for name, rate, spectrum in (
            ("full (44.1k + spectrum)", 44_100, True),
            ("no-spectrum (44.1k)", 44_100, False),
            ("no-resample (48k + spectrum)", 48_000, True),
            ("neither (48k, 4-node)", 48_000, False),
        ):
            g = _build(tmp, seconds, rate, spectrum)
            rtf, d = bench.measure_device_rtf(g, "export", 8)
            print(f"{name:30s}: {d['pipeline_ms']:7.2f} ms  RTF={rtf:,.0f}x")


if __name__ == "__main__":
    main()
