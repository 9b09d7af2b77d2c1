import sys, time, faulthandler
sys.path.insert(0, "/root/repo")
faulthandler.enable(); faulthandler.dump_traceback_later(420, exit=True)
from tpu_msm.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk import kernels

C = BN254_S12; L = C.num_limbs
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.integers(0, 1<<12, (L, 65536), dtype=np.int32))
t0=time.time(); out = kernels.encode_mont(xs, C); v = np.asarray(out)
print("encode_mont 2^16 compile+run+fetch", round(time.time()-t0,1), flush=True)
t0=time.time(); out = kernels.encode_mont(xs, C); v = np.asarray(out)
print("encode_mont steady", round((time.time()-t0)*1e3,1), "ms", flush=True)

# batched padd kernel on a bigger shape
p = jnp.stack([jnp.asarray(rng.integers(0,1<<12,(L, 4096),dtype=np.int32)) for _ in range(3)])
t0=time.time(); s = kernels.padd_batch(p, p, C); v = np.asarray(s)
print("padd_batch compile+run+fetch", round(time.time()-t0,1), flush=True)
