import sys, time, importlib.util
import numpy as np, jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
spec = importlib.util.spec_from_file_location("pw_dbg", "/tmp/_pw_dbg.py")
pw = importlib.util.module_from_spec(spec); spec.loader.exec_module(pw)
from nodey_tpu.ops import stretch as st

rate = 48000; n = rate*30
rng = np.random.default_rng(0)
seq, seek, ov = st._params(rate)
num = int(round((seq-ov)*(1/1.1892)*65536))
K = st._out_chunks(n, 1/1.1892, seq, ov)
last_pos = ((K-1)*num + 32768)//65536
x = jnp.asarray((0.2*rng.standard_normal((2, last_pos + seek + seq + 16))).astype(np.float32))
def probe(o): return jax.device_get(jnp.ravel(o)[:4])
f = jax.jit(lambda d: pw.wsola_score_table(d, K, num, 65536, seq, seek, ov, precision=lax.Precision.DEFAULT))
t0=time.perf_counter(); out=f(x); probe(out); warm=time.perf_counter()-t0
ts=[]
for _ in range(3):
    t0=time.perf_counter()
    for _ in range(2): out=f(x)
    probe(out)
    ts.append((time.perf_counter()-t0)/2)
print(f"NO-GEMM variant 30s: warm {warm:.0f}s run {min(ts)*1e3:.1f} ms", flush=True)
