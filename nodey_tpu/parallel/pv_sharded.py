"""Sequence-parallel (sp) phase-vocoder time stretch over a device mesh.

Why this exists: the tempo stage is the one node family the sharded graph
runtime could not split along the SAMPLE axis — WSOLA's defining data
dependence (frame k scores against the tail CHOSEN at frame k-1,
/root/reference/src/processor/audio-velocity.cpp:384-457) makes every
sample of its output transitively depend on all earlier input, so
time-variant graphs ride the mesh only as whole clips over dp
(parallel/sharded.compile_graph_dp). The phase vocoder (ops/pv.py) has no
such chain: per-frame analysis/synthesis is independent and the single
cross-frame coupling — the synthesis phasor — is an associative prefix
product. That algebra shards:

* **frames** split contiguously over ``sp``: shard i owns the K_per frames
  [i*K_per, (i+1)*K_per) and emits exactly ``K_per * hop`` output samples,
  so the output stays evenly sharded along time with no re-layout;
* **input halo** — each shard's analysis windows read
  [pos(i*K_per - 1), pos((i+1)*K_per - 1) + n_fft); with the input sharded
  in equal chunks the worst-case overhang on either side is computed
  statically from the exact 16.16 position law and fetched from neighbors
  via the multi-hop ``halo_exchange_nd`` (ICI ``ppermute``);
* **phasor prefix across shards** — each shard reduces its local advances
  to one total rotation [C, bins], then a log2(sp)-step Hillis-Steele
  doubling over ``ppermute`` forms the exclusive cross-shard prefix
  (identity on shard 0). Traffic per step is a single [C, bins] complex
  pair — a few KB riding ICI, the textbook "prefix sum as collective"
  shape (scaling-book recipe; cf. jax-ml.github.io/scaling-book);
* **one extra left frame** per shard supplies the previous analysis phase
  for instantaneous-frequency estimation — recomputed locally (cheaper
  than shipping [C, bins] phases and keeps the halo algebra the only
  input-side coupling);
* **OLA tail handoff** — frames K_per-3..K_per-1 of shard i spill 3*hop
  samples into shard i+1's first rows: one ``ppermute`` + add.

Agreement contract: identical analysis geometry (the shared 16.16 law,
ops/stretch.frame_pos) and identical locking decisions as the offline
render; output equals ops/pv._pv_impl up to f32 re-association of the
phasor products (the offline path accumulates in one associative_scan
tree, the sharded path per-shard + cross-shard combine) — the same caveat
as the chunked streaming path, asserted >= 70 dB in tests on the 8-device
CPU mesh. Locking re-phases bins rigidly against peers chosen by local
magnitude comparisons, which are bitwise-equal across both paths, so the
peak PICKS never drift — only last-ulp phasor values do.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nodey_tpu.ops import pv as pv_ops
from nodey_tpu.ops.stretch import frame_pos, scale_length_by_num
from nodey_tpu.parallel.ops import halo_exchange_nd, shard_map

_TWO_PI = 2.0 * math.pi


@dataclasses.dataclass(frozen=True)
class PvShardPlan:
    """Static geometry for one sp-sharded PV stretch."""

    tempo: float
    rate: int
    n_fft: int
    hop: int
    num: int          # analysis-hop numerator (16.16), pv_hop_num
    num_t: int        # round(tempo * 65536) — output-length law
    sp: int
    capacity: int     # global input capacity (sp * chunk_in)
    chunk_in: int     # input samples per shard
    k_per: int        # frames owned per shard
    left: int         # input halo, samples
    right: int

    @property
    def out_chunk(self) -> int:
        return self.k_per * self.hop

    @property
    def out_capacity(self) -> int:
        return self.sp * self.out_chunk


def plan_pv_sharded(tempo: float, rate: int, capacity: int,
                    sp: int, k_per_align: int = 1) -> PvShardPlan:
    """Frame/halo decomposition for stretching a [C, capacity] clip by
    ``tempo`` over ``sp`` time shards.

    ``capacity`` must be a multiple of ``sp`` (pad with
    ``pv_sharded_capacity``). Frames are distributed exactly evenly:
    K_per = ceil(K_offline / sp), so every shard runs the identical
    program. The input halos are the exact worst case of the 16.16
    position law over all shard boundaries — computed here in int64
    numpy, not estimated.

    ``k_per_align`` rounds K_per UP to a multiple — chain composition
    (parallel/tv_sharded.py) uses it to make the per-shard output chunk
    ``K_per * hop`` divisible by a downstream stage's alignment quantum.
    Extra frames past the offline frame count are safe: their OLA rows
    land at or beyond the masked output length (frame k only writes
    output rows k..k+3, and every junk frame has k >= K_offline >=
    ceil(out_len / hop))."""
    if capacity % sp:
        raise ValueError(f"capacity {capacity} not divisible by sp={sp}")
    n_fft, hop = pv_ops.pv_params(rate)
    num = pv_ops.pv_hop_num(hop, tempo)
    chunk_in = capacity // sp

    out_cap = int(math.ceil(capacity / tempo)) + hop
    k_off = max(2, -(-out_cap // hop) + 1)
    k_per = -(-k_off // sp)
    if k_per_align > 1:
        k_per = -(-max(k_per, 3) // k_per_align) * k_per_align
    if k_per < 3:
        # The OLA tail spans 3 rows; k_per >= 3 keeps the spill within one
        # neighbor (single ppermute). Tiny clips should use fewer shards.
        raise ValueError(
            f"clip too short for sp={sp}: {k_per} frames/shard < 3"
        )

    def pos(k: int) -> int:
        return int((np.int64(k) * num + 32768) >> 16)

    left = right = 0
    for i in range(sp):
        left = max(left, i * chunk_in - pos(max(i * k_per - 1, 0)))
        right = max(
            right,
            pos((i + 1) * k_per - 1) + n_fft - (i + 1) * chunk_in,
        )
    return PvShardPlan(
        tempo=float(tempo), rate=int(rate), n_fft=n_fft, hop=hop, num=num,
        num_t=int(round(tempo * 65536)), sp=sp, capacity=capacity,
        chunk_in=chunk_in, k_per=k_per, left=left, right=max(right, 0),
    )


def pv_sharded_capacity(length: int, sp: int) -> int:
    """Smallest capacity >= length divisible by sp."""
    return -(-max(length, 1) // sp) * sp


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cross_shard_exclusive_phasor(tc, ts, axis_name: str, sp: int,
                                  tr=None):
    """Exclusive prefix product of per-shard total rotations.

    Hillis-Steele doubling over ``ppermute``: after the inclusive pass,
    shard i holds prod_{m<=i} T_m; one final shift turns it exclusive
    (identity on shard 0). ppermute fills un-addressed shards with zeros,
    which is NOT the identity rotation — every step gates the combine on
    ``idx >= d`` so zeros never enter the product.

    With ``tr`` (per-shard "contains a transient reset" flags, transient
    mode) the combine is the segmented one — a shard whose rotation is
    post-reset ABSOLUTE discards everything received from the left —
    and the return gains the exclusive flag plane."""
    idx = lax.axis_index(axis_name)
    vc, vs = tc, ts
    vr = tr
    d = 1
    while d < sp:
        perm = [(m, m + d) for m in range(sp - d)]
        rc = lax.ppermute(vc, axis_name, perm)
        rs = lax.ppermute(vs, axis_name, perm)
        nc, ns = _cmul((rc, rs), (vc, vs))
        take = idx >= d
        if vr is not None:
            rr = lax.ppermute(vr, axis_name, perm)
            nc = jnp.where(vr, vc, nc)
            ns = jnp.where(vr, vs, ns)
            vr = jnp.where(take, vr | rr, vr)
        vc = jnp.where(take, nc, vc)
        vs = jnp.where(take, ns, vs)
        d *= 2
    perm1 = [(m, m + 1) for m in range(sp - 1)]
    ec = lax.ppermute(vc, axis_name, perm1)
    es = lax.ppermute(vs, axis_name, perm1)
    first = lax.axis_index(axis_name) == 0
    ec = jnp.where(first, 1.0, ec)
    es = jnp.where(first, 0.0, es)
    if tr is None:
        return ec, es
    er = lax.ppermute(vr, axis_name, perm1) & ~first
    return ec, es, er


def pv_sharded_local_step(plan: PvShardPlan, x_local, length,
                          axis_name: str, lock: bool = True,
                          transient: bool = False,
                          formant_ratio: float = 1.0):
    """The per-shard body: stretch this shard's frames given its local
    input chunk [C, chunk_in] (runs under shard_map over ``axis_name``).

    Returns (out_local [C, k_per*hop], out_len_global int32). Exposed
    separately from :func:`pv_stretch_sharded` so graph-level sharded
    programs can inline it between LTI stages."""
    n_fft, hop = plan.n_fft, plan.hop
    K = plan.k_per
    bins = n_fft // 2 + 1
    C = x_local.shape[0]

    idx = lax.axis_index(axis_name)
    ext = halo_exchange_nd(x_local, plan.left, plan.right, axis_name)

    # Frame positions for the K owned frames plus one preceding frame
    # (instantaneous-frequency context; shard 0's is masked by the seed).
    k0 = idx * K
    ks = k0 - 1 + jnp.arange(K + 1, dtype=jnp.int32)
    pos = frame_pos(jnp.maximum(ks, 0), plan.num)
    # ext index 0 is global sample idx*chunk_in - left.
    rel = jnp.clip(pos - (idx * plan.chunk_in - plan.left),
                   0, ext.shape[-1] - n_fft)

    w = jnp.asarray(pv_ops._pv_window(n_fft))
    frames = jax.vmap(
        lambda s: lax.dynamic_slice(ext, (0, s), (C, n_fft)), out_axes=1
    )(rel) * w[None, None, :]                        # [C, K+1, n_fft]

    cos_m, sin_m = pv_ops._dft_matrices(n_fft)
    re = jnp.einsum(
        "ckn,nb->ckb", frames, jnp.asarray(cos_m),
        preferred_element_type=jnp.float32, precision=pv_ops.PV_PRECISION,
    )
    im = jnp.einsum(
        "ckn,nb->ckb", frames, jnp.asarray(sin_m),
        preferred_element_type=jnp.float32, precision=pv_ops.PV_PRECISION,
    )
    mag_all = jnp.sqrt(re * re + im * im)
    ph_all = jnp.arctan2(im, re)                     # [C, K+1, bins]
    mag = mag_all[:, 1:]
    ph = ph_all[:, 1:]
    if formant_ratio != 1.0:
        # Flux (below) keeps reading the raw mag_all; locking/synthesis
        # use corrected magnitudes — per-frame and stateless, identical
        # to the offline/streamed paths.
        mag = pv_ops._formant_correction(mag, n_fft, formant_ratio)

    # Phase advance over each owned frame's ACTUAL integer hop — the same
    # exact-mod + O(1)-deviation split as ops/pv (docstring there).
    dpos = jnp.maximum(pos[1:] - pos[:-1], 1)        # [K]
    b_i = jnp.arange(bins, dtype=jnp.int32)
    omega_dpos = (
        (b_i[None, :] * dpos[:, None]) % n_fft
    ).astype(jnp.float32) * np.float32(_TWO_PI / n_fft)
    dphi = ph_all[:, 1:] - ph_all[:, :-1] - omega_dpos[None]
    wrapped = dphi - _TWO_PI * jnp.round(dphi / _TWO_PI)
    omega_hop = np.mod(
        np.arange(bins) * hop, n_fft
    ).astype(np.float64) * (_TWO_PI / n_fft)
    adv = (
        jnp.asarray(omega_hop.astype(np.float32))[None, None, :]
        + wrapped * (np.float32(hop) / dpos[None, :, None].astype(jnp.float32))
    )
    # Global frame 0 seeds the chain with its own analysis phase: its
    # "advance" rotates the identity carry straight to ph[0].
    owned = ks[1:]
    adv = jnp.where((owned == 0)[None, :, None], ph, adv)

    if transient:
        # Same decisions as the offline path: each owned frame's flux vs
        # its predecessor — the context frame (index 0 of mag_all) covers
        # the shard boundary. Frame 0 of the whole clip is the seed.
        reset = (
            pv_ops.transient_resets(mag_all[:, :-1], mag_all[:, 1:])
            & (owned > 0)[None, :]
        )[..., None]
        adv = jnp.where(reset, ph, adv)
        ca, sa = jnp.cos(adv), jnp.sin(adv)
        pc, ps, pr = lax.associative_scan(
            pv_ops._cmul_seg,
            (ca, sa, jnp.broadcast_to(reset, ca.shape)), axis=1,
        )
        ec, es, _er = _cross_shard_exclusive_phasor(
            pc[:, -1, :], ps[:, -1, :], axis_name, plan.sp,
            tr=pr[:, -1, :],
        )
        cos_phi = jnp.where(
            pr, pc, ec[:, None, :] * pc - es[:, None, :] * ps
        )
        sin_phi = jnp.where(
            pr, ps, ec[:, None, :] * ps + es[:, None, :] * pc
        )
    else:
        ca, sa = jnp.cos(adv), jnp.sin(adv)
        pc, ps = lax.associative_scan(_cmul, (ca, sa), axis=1)
        # Exclusive cross-shard prefix of the shard-total rotations.
        ec, es = _cross_shard_exclusive_phasor(
            pc[:, -1, :], ps[:, -1, :], axis_name, plan.sp
        )
        cos_phi = ec[:, None, :] * pc - es[:, None, :] * ps
        sin_phi = ec[:, None, :] * ps + es[:, None, :] * pc

    if lock:
        cos_phi, sin_phi = pv_ops.lock_phases(cos_phi, sin_phi, ph, mag)

    icos_m, isin_m = pv_ops._idft_matrices(n_fft)
    y = jnp.einsum(
        "ckb,bn->ckn", mag * cos_phi, jnp.asarray(icos_m),
        preferred_element_type=jnp.float32, precision=pv_ops.PV_PRECISION,
    ) + jnp.einsum(
        "ckb,bn->ckn", mag * sin_phi, jnp.asarray(isin_m),
        preferred_element_type=jnp.float32, precision=pv_ops.PV_PRECISION,
    )
    y = y * w[None, None, :]

    # Local OLA of K frames over K+3 rows; the 3-row tail spills into the
    # right neighbor (k_per >= 3 guarantees one hop).
    y4 = y.reshape(C, K, 4, hop)
    acc = None
    for j in range(4):
        part = jnp.pad(y4[:, :, j, :], ((0, 0), (j, 3 - j), (0, 0)))
        acc = part if acc is None else acc + part    # [C, K+3, hop]
    acc = acc.reshape(C, (K + 3) * hop)
    tail = acc[:, K * hop:]
    if plan.sp > 1:
        recv = lax.ppermute(
            tail, axis_name, [(m, m + 1) for m in range(plan.sp - 1)]
        )
    else:
        recv = jnp.zeros_like(tail)
    acc = acc.at[:, : 3 * hop].add(recv)
    out = acc[:, : K * hop]

    # Coverage: start partials live only in global rows 0..2; every other
    # emitted row has the full interior sum (the trimmed output never
    # reaches the end-partial rows — same argument as pv_stream_step).
    P1 = jnp.asarray(pv_ops._ola_row_partials(n_fft))   # [4, hop]
    rows = k0 + jnp.arange(K, dtype=jnp.int32)
    den = P1[jnp.clip(rows, 0, 3)].reshape(K * hop)
    out = out / den[None, :]

    out_total = scale_length_by_num(length, plan.num_t)
    local_n = jnp.clip(out_total - k0 * hop, 0, K * hop)
    mask = jnp.arange(K * hop, dtype=jnp.int32)[None, :] < local_n
    return jnp.where(mask, out, 0.0), out_total


def pv_stretch_sharded(mesh: Mesh, data, length, tempo: float, rate: int,
                       sp_axis: str = "sp", lock: bool = True,
                       transient: bool = False,
                       formant_ratio: float = 1.0):
    """Stretch [C, capacity] by ``tempo`` with the time axis sharded over
    ``sp_axis``; returns (out [C, out_capacity] sharded along time,
    out_len int32).

    ``data`` must be zero-padded past ``length`` and its capacity divisible
    by the sp size (``pv_sharded_capacity``)."""
    sp = mesh.shape[sp_axis]
    plan = plan_pv_sharded(tempo, rate, int(data.shape[-1]), sp)

    def local_fn(x_local, length_r):
        return pv_sharded_local_step(plan, x_local, length_r, sp_axis,
                                     lock=lock, transient=transient,
                                     formant_ratio=formant_ratio)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, sp_axis), P()),
        out_specs=(P(None, sp_axis), P()),
        check_vma=False,
    )
    data = jax.device_put(data, NamedSharding(mesh, P(None, sp_axis)))
    out, out_len = fn(data, jnp.int32(length))
    return out, out_len
