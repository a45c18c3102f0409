"""Compile + time the epiband kernel on the real TPU at production scale."""
import sys, time
sys.path.insert(0,"/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from cermvs_tpu.ops.pallas.epiband import epiband_resample

def bench(V,h_r,w_r,ws,C,D,slo,shi,label):
    rng=np.random.RandomState(0)
    s_max=ws-w_r-16
    fr=jnp.asarray(rng.randn(V,h_r,w_r,C).astype(np.float32)).astype(jnp.bfloat16)
    fs=jnp.asarray(rng.randn(V,h_r,ws,C).astype(np.float32)).astype(jnp.bfloat16)
    base=jnp.asarray(rng.uniform(0,s_max*0.8,(V,h_r,w_r)).astype(np.float32))
    sigma=jnp.asarray(rng.uniform(slo,shi,(V,h_r,w_r)).astype(np.float32))
    f=jax.jit(lambda a,b,c,d: epiband_resample(a,b,c,d,D,s_max,sigma_lo=slo,sigma_hi=shi).sum())
    t0=time.perf_counter(); v=float(f(fr,fs,base,sigma)); t1=time.perf_counter()
    print(f"{label}: compiled+first run {t1-t0:.1f}s (sum={v:.3e})")
    n=5
    t0=time.perf_counter()
    for _ in range(n): v=float(f(fr,fs,base,sigma))
    dt=(time.perf_counter()-t0)/n
    print(f"{label}: {dt*1e3:.1f} ms/call (incl ~29ms dispatch)")

# DTU scale-1 stage-0-like
bench(9, 304, 512, 896, 64, 64, 2.4, 3.1, "stage0")
# stage-1-like
bench(9, 304, 512, 896, 64, 44, 0.45, 0.62, "stage1")
