"""Multi-chip scaling: device meshes, sharded pipelines, halo exchange.

The reference's only concurrency is fiber-per-node on one thread
(reference: src/infra/runner.cpp:65-154). The TPU counterparts
(SURVEY.md §2.6):

* data parallelism  — independent tracks/clips sharded over a ``dp`` mesh
  axis (the analog of Audio_input's per-file fan-out, audio-io.cpp:242-279)
* sequence parallelism — the time axis sharded over ``sp`` with ppermute
  halo exchange sized by each kernel's receptive field (the analog of the
  reference's frame streaming, SURVEY.md §5.7). LTI graphs shard via
  ``sharded.compile_graph_sharded``; time-variant CHAINS shard via
  ``tv_sharded.compile_chain_sp_tv`` (PV tempo stages,
  ``pv_sharded.pv_stretch_sharded`` underneath); WSOLA-algorithm graphs
  ride the mesh as whole clips via ``sharded.compile_graph_dp``.
"""

from nodey_tpu.parallel.mesh import make_mesh  # noqa: F401
