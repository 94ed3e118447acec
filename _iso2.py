import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nodey_tpu.ops import stretch as st

rate = 48000; n = rate*30
rng = np.random.default_rng(0)
seq, seek, ov = st._params(rate)
stride = seq - ov
num = int(round(stride*(1/1.1892)*65536))
K = st._out_chunks(n, 1/1.1892, seq, ov)
last_pos = ((K-1)*num + 32768)//65536
x = jnp.asarray((0.2*rng.standard_normal((2, last_pos + seek + seq + 16))).astype(np.float32))
n_cand = seek + 1
block = 32
nblk = -(-K//block)
C = 2
win_w = seek + seq

def probe(o):
    while isinstance(o, (tuple, list)): o = o[0]
    return jax.device_get(jnp.ravel(o)[:4])

def bench(f, name):
    t0=time.perf_counter(); out=f(x); probe(out); warm=time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(2): out=f(x)
        probe(out)
        ts.append((time.perf_counter()-t0)/2)
    print(f"{name}: warm {warm:.0f}s run {min(ts)*1e3:.1f} ms", flush=True)

# span width per block: frames k0-1..k0+block-1 → pos span + window
span_w = (block + 1) * (num // 65536 + 1) + win_w + 64

def windows_from_span(xx, b):
    k0 = b * block
    span_start = jnp.clip(st.frame_pos(k0 - 1, num, 65536), 0, xx.shape[1] - span_w)
    span = lax.dynamic_slice(xx, (0, span_start), (C, span_w))
    def one(k):
        pos = jnp.clip(st.frame_pos(k, num, 65536) - span_start, 0, span_w - win_w)
        return lax.dynamic_slice(span, (0, pos), (C, win_w))
    return jax.vmap(one)(k0 - 1 + jnp.arange(block + 1, dtype=jnp.int32))

def im2col_native(w, start):
    """[F, C, n_cand_padded, ov] patch rows, construction-native layout."""
    s = 32
    nq = -(-n_cand // s)
    k_shifts = -(-ov // s) + 1
    width = (nq + k_shifts) * s
    F = w.shape[0]
    z = w[:, :, start:]
    z = jnp.pad(z, ((0,0),(0,0),(0, max(0, width + s - z.shape[2]))))
    rows = []
    for r in range(s):
        segs = z[:, :, r:r+width].reshape(F, C, nq + k_shifts, s)
        rows.append(jnp.concatenate([segs[:, :, i:i+nq, :] for i in range(k_shifts)], axis=-1)[:, :, :, :ov])
    # rows: s x [F, C, nq, ov]; a = q*s + r -> stack on axis 3
    pat = jnp.stack(rows, axis=3).reshape(F, C, nq*s, ov)
    return pat

# E1: span windows only
def e1(xx):
    def blk(carry, b):
        w = windows_from_span(xx, b)
        return carry, jnp.sum(w)
    _, sums = lax.scan(blk, jnp.float32(0), jnp.arange(nblk, dtype=jnp.int32))
    return sums
bench(jax.jit(e1), "E1 span windows")

# E2: span windows + native im2col x2
def e2(xx):
    def blk(carry, b):
        w = windows_from_span(xx, b)
        cand = im2col_native(w[1:], 0)
        tails = im2col_native(w[:-1], stride)
        return carry, jnp.sum(cand) + jnp.sum(tails)
    _, sums = lax.scan(blk, jnp.float32(0), jnp.arange(nblk, dtype=jnp.int32))
    return sums
bench(jax.jit(e2), "E2 + native im2col x2")

# E3: + native-layout GEMM + argmax (DEFAULT precision)
def e3(xx):
    def blk(carry, b):
        w = windows_from_span(xx, b)
        cand = im2col_native(w[1:], 0)
        tails = im2col_native(w[:-1], stride)
        energy = jnp.sum(cand*cand, axis=(1, 3))  # [F, b]
        scores = jnp.einsum("fcav,fcbv->fab", tails, cand, preferred_element_type=jnp.float32) * lax.rsqrt(energy + 1e-9)[:, None, :]
        F = jnp.argmax(scores[:, :n_cand, :n_cand], axis=-1).astype(jnp.int32)
        return carry, jnp.sum(F)
    _, sums = lax.scan(blk, jnp.int32(0), jnp.arange(nblk, dtype=jnp.int32))
    return sums
bench(jax.jit(e3), "E3 + native gemm/argmax")
