import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nodey_tpu.ops import stretch as stretch_ops

rate = 48000; n = rate*30
rng = np.random.default_rng(0)
x = jnp.asarray((0.2*rng.standard_normal((2, n))).astype(np.float32))

def probe(o): return jax.device_get(o[0].ravel()[:4])

seq, seek, ov = stretch_ops._params(rate)
num = int(round((seq-ov)*(1/1.1892)*65536))
K = stretch_ops._out_chunks(n, 1/1.1892, seq, ov)
last_pos = ((K-1)*num + 32768)//65536
xp = jnp.pad(x, ((0,0),(0, max(0, last_pos + seek + seq + 2 - n))))

stretch_ops.SCORE_PRECISION = lax.Precision.DEFAULT
for block in (32, 64, 128):
    f = jax.jit(functools.partial(stretch_ops._wsola_blocked, K=K, num=num, den=65536, seq=seq, seek=seek, overlap=ov, block=block))
    g = lambda d: f(d)
    t0=time.perf_counter(); out=f(xp); probe((out,)); warm=time.perf_counter()-t0
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(2): out=f(xp)
        probe((out,))
        ts.append((time.perf_counter()-t0)/2)
    print(f"blocked 30s block={block}: warm {warm:.0f}s run {min(ts)*1e3:.1f} ms RTF {30/min(ts):.0f}x", flush=True)
