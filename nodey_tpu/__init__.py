"""nodey_tpu — a TPU-native node-graph audio DSP framework.

A ground-up re-design of the capabilities of Stehsaer/nodey-audio-editor
(reference: /root/reference) for TPU hardware:

* The processor DAG (reference: src/infra/runner.cpp, one Boost.Fiber per node
  with bounded channels per edge) lowers instead to a SINGLE fused, jitted XLA
  computation over ``[channels, N]`` float32 sample buffers
  (:mod:`nodey_tpu.core.compiler`).
* Per-node DSP (gain, mixers, polyphase resample, WSOLA tempo/pitch, STFT)
  lives in :mod:`nodey_tpu.ops` as JAX/Pallas kernels with CPU-testable
  reference implementations.
* Host-bound I/O (FFmpeg decode, LAME MP3 encode) is a native C++ runtime in
  :mod:`nodey_tpu.host` fed through double-buffered staging queues.
* Multi-chip scaling uses ``jax.sharding`` meshes (:mod:`nodey_tpu.parallel`),
  not per-node threads.

Public node API, JSON project format and graph semantics match the reference
(see individual docstrings for file:line citations).
"""

__version__ = "0.1.0"

from nodey_tpu.core import errors, graph, registry  # noqa: F401
from nodey_tpu.core.graph import Graph  # noqa: F401
from nodey_tpu.core.registry import (  # noqa: F401
    PinAttribute,
    Processor,
    ProcessorInfo,
    processor_map,
    register_all_processors,
    register_processor,
)
