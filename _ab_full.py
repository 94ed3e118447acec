import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from nodey_tpu.ops import stretch as st

rate = 48000; n = rate*30
rng = np.random.default_rng(0)
x = jnp.asarray((0.2*rng.standard_normal((2, n))).astype(np.float32))
def probe(o): return jax.device_get(o[0].ravel()[:4])
f = jax.jit(lambda d: st.wsola_stretch_at_rate(d, jnp.int32(n), 1/1.1892, rate))
t0=time.perf_counter(); out=f(x); probe(out); warm=time.perf_counter()-t0
ts=[]
for _ in range(3):
    t0=time.perf_counter()
    for _ in range(2): out=f(x)
    probe(out)
    ts.append((time.perf_counter()-t0)/2)
print(f"FULL wsola (kernel+assembly) 30s: warm {warm:.0f}s run {min(ts)*1e3:.1f} ms (stage RTF {30/min(ts):.0f}x)", flush=True)
