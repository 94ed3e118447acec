"""Cross-host (DCN) execution harness (SURVEY.md §5.8, VERDICT r2 #6).

The single-process mesh in :mod:`nodey_tpu.parallel.sharded` scales a graph
over the chips one host can address (ICI). Multi-host TPU pods add a second
transport — DCN between hosts — which JAX reaches through
``jax.distributed.initialize``: every process contributes its local chips,
``jax.devices()`` becomes the GLOBAL device list, and the same
``shard_map`` programs run unchanged with XLA routing collectives over
ICI within a host and DCN across hosts.

This module proves that path without pod hardware: ``launch_dcn_dryrun``
spawns N coordinator-connected CPU processes (each forcing K local XLA
host devices — the cross-host analog of the single-host 8-device
simulation, SURVEY.md §4.4), builds ONE global sp mesh spanning all N*K
devices, and executes the REAL flagship graph via
``sharded.compile_graph_sharded`` with the sample axis sharded ACROSS the
process boundary — the resampler's ppermute halo exchange crosses hosts,
i.e. rides DCN. Each process then asserts its addressable output shards
are bitwise equal to the single-device program's same samples (the
framework's standing offline==sharded contract).

No reference counterpart: the reference is a single desktop process
(SURVEY.md §2.6); this is TPU-native scaling surface.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from typing import List, Optional

# Child-side defaults (overridden through NODEY_DCN_* env vars set by the
# launcher; env keeps the child a bare ``python -c`` with no argv parsing).
_ENV_SPEC = "NODEY_DCN_SPEC"


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def child_main() -> None:
    """Entry point executed inside each spawned process."""
    spec = json.loads(os.environ[_ENV_SPEC])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=spec["coordinator"],
        num_processes=spec["num_processes"],
        process_id=spec["process_id"],
    )
    try:
        _run_dcn_step(
            num_processes=spec["num_processes"],
            local_devices=spec["local_devices"],
        )
    finally:
        jax.distributed.shutdown()


def _run_dcn_step(num_processes: int, local_devices: int) -> None:
    """One sharded step over the global (cross-process) mesh, verified
    bitwise against the single-device program on this process's shards."""
    import jax
    import numpy as np

    from nodey_tpu.core import compiler, registry
    from nodey_tpu.core.graph import Graph
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh
    from nodey_tpu.processors.amix import AudioAmix
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput
    from nodey_tpu.processors.audio_vol import AudioVol

    n_global = num_processes * local_devices
    devices = jax.devices()
    assert len(devices) == n_global, (
        f"global device view wrong: {len(devices)} != {n_global}"
    )
    assert jax.process_count() == num_processes

    # The flagship LTI pipeline (input x2 -> gain -> amix@48k): the amix
    # path's 44.1->48k polyphase needs halo samples from the neighboring
    # sp shard — with sp spanning processes, that ppermute crosses the
    # process boundary (the DCN hop).
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav", "b.wav"]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.5)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.6, 0.4]
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(amix, "input_1"))
    g.add_link(pin(src, "output_1"), pin(amix, "input_2"))
    g.add_link(pin(amix, "output"), pin(out, "input"))

    rate, channels = 44_100, 2
    n = rate // 2
    mesh = make_mesh({"sp": n_global}, devices=devices)
    capacity = sharded.plan_capacity_for(g, rate, n, mesh)
    sources = {
        (src, f"output_{i}"): compiler.SourceSpec(
            rate, channels, "flt", capacity
        )
        for i in range(2)
    }

    # Deterministic inputs, identical on every process (same seed) — the
    # precondition for handing the same host array to a global sharding.
    rng = np.random.default_rng(7)
    arrays = {}
    lengths = {}
    sc = sharded.compile_graph_sharded(g, sources, mesh, mode="export")
    for key in sc.input_keys:
        x = np.zeros((channels, capacity), dtype=np.float32)
        x[:, :n] = 0.3 * rng.standard_normal((channels, n))
        arrays[key] = x
        lengths[key] = n

    from jax.sharding import NamedSharding, PartitionSpec as P

    args = {}
    for key in sc.input_keys:
        dspec, lspec = sc._arg_specs(2)
        args[key] = (
            jax.device_put(
                arrays[key], NamedSharding(mesh, dspec)
            ),
            jax.device_put(
                np.int32(lengths[key]), NamedSharding(mesh, lspec)
            ),
        )
    out_tree = sc.fn(args)
    master, glen = out_tree["master"]

    # Single-device reference (local jit, full clip) for bitwise checks of
    # THIS process's addressable time shards.
    ref_compiled = compiler.compile_graph(g, sources, mode="export")
    ref_out = ref_compiled.run_device(arrays, lengths)
    ref_master, ref_len = ref_out["master"]
    ref_master = np.asarray(ref_master)

    out_len = int(np.asarray(glen.addressable_shards[0].data)) \
        if glen.is_fully_addressable or glen.addressable_shards \
        else 0
    assert out_len == int(np.asarray(ref_len)), (out_len, int(np.asarray(ref_len)))

    shard_w = master.shape[-1] // n_global
    for s in master.addressable_shards:
        data = np.asarray(s.data)
        t0 = s.index[-1].start or 0
        ref_slice = ref_master[..., t0:t0 + data.shape[-1]]
        valid = max(0, min(data.shape[-1], out_len - t0))
        if valid:
            np.testing.assert_array_equal(
                data[..., :valid], ref_slice[..., :valid]
            )
        assert np.isfinite(data).all()
    assert shard_w > 0

    # All processes agree before exiting (a straggler failing after the
    # leader exits would otherwise be lost).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("nodey_dcn_dryrun_done")


def launch_dcn_dryrun(
    num_processes: int = 2,
    local_devices: int = 2,
    timeout: float = 300.0,
    extra_env: Optional[dict] = None,
) -> None:
    """Spawn the N-process DCN dryrun and raise if any process fails."""
    port = _free_port()
    procs: List[subprocess.Popen] = []
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(extra_env or {})
        env["JAX_PLATFORMS"] = "cpu"
        env["NODEY_DCN_CHILD"] = "1"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={local_devices}"
        )
        env["XLA_FLAGS"] = " ".join(flags)
        env[_ENV_SPEC] = json.dumps({
            "coordinator": f"127.0.0.1:{port}",
            "num_processes": num_processes,
            "process_id": pid,
            "local_devices": local_devices,
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "from nodey_tpu.parallel.dcn import child_main; child_main()"],
            cwd=repo_root,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        ))
    failures = []
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            failures.append((pid, "timeout", out))
            continue
        if proc.returncode != 0:
            failures.append((pid, f"rc={proc.returncode}", out))
    if failures:
        msgs = "\n".join(
            f"-- process {pid} ({why}):\n{(out or b'').decode(errors='replace')[-2000:]}"
            for pid, why, out in failures
        )
        raise RuntimeError(f"DCN dryrun failed:\n{msgs}")
