import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def probe(o):
    while isinstance(o, (tuple, list)): o = o[0]
    return jax.device_get(jnp.ravel(o)[:4])

def bench(f, *args, iters=4, name=""):
    t0=time.perf_counter(); out=f(*args); probe(out); warm=time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(iters): out=f(*args)
        probe(out)
        ts.append((time.perf_counter()-t0)/iters)
    print(f"{name}: warm {warm:.0f}s run {min(ts)*1e3:.2f} ms", flush=True)

# Geometry for 30s @48k tempo 0.841: ~937 frames, block 32 -> ~30 blocks
B, n_cand, ov, C = 32, 721, 384, 2
W = C*ov
win_w = 720 + 2304   # seek + seq
nblk = 30
rng = np.random.default_rng(0)

# 1. patches im2col via conv_general_dilated_patches (what _wsola_blocked does, x2 per block)
wins = jnp.asarray(rng.standard_normal((nblk, B+1, C, win_w)).astype(np.float32))
def patches_only(ws):
    def blk(w):
        def one(start):
            pat = lax.conv_general_dilated_patches(
                w[:, :, start:start+720+ov], filter_shape=(ov,), window_strides=(1,), padding=[(0,0)])
            return jnp.transpose(pat, (0, 2, 1))
        return one(0)[1:], one(1536)[:-1]
    return jax.vmap(blk)(ws)
bench(jax.jit(patches_only), wins, name="im2col x2 per block (30 blocks)")

# 2. scoring GEMM alone
T = jnp.asarray(rng.standard_normal((nblk, B, n_cand, W)).astype(np.float32))
f_g = jax.jit(lambda t: jnp.einsum("nkaw,nkbw->nkab", t, t, preferred_element_type=jnp.float32, precision=lax.Precision.HIGH))
bench(f_g, T, name="scoring GEMM (30 blocks)")

# 3. frame-window extraction (vmapped dynamic_slice over ~937 frames)
x = jnp.asarray(rng.standard_normal((C, 48000*31)).astype(np.float32))
ks = jnp.arange(nblk*(B+1), dtype=jnp.int32)
f_w = jax.jit(lambda x, ks: jax.vmap(lambda k: lax.dynamic_slice(x, (0, jnp.clip(k*1834, 0, x.shape[1]-win_w)), (C, win_w)))(ks))
bench(f_w, x, ks, name="frame windows (990 gathers)")

# 4. row argmax
S = jnp.asarray(rng.standard_normal((nblk, B, n_cand, n_cand)).astype(np.float32))
bench(jax.jit(lambda s: jnp.argmax(s, axis=-1)), S, name="row argmax (30 blocks)")
