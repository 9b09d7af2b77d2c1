import sys, time, faulthandler
sys.path.insert(0, "/root/repo")
faulthandler.enable(); faulthandler.dump_traceback_later(900, exit=True)
from tpu_msm.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk import kernels

C = BN254_S12; L = C.num_limbs
rng = np.random.default_rng(1)
# prefix_scan: (L*8, R*F8) with F8=128, R=4
F8, R = 128, 4
sx = jnp.asarray(rng.integers(0, 1<<12, (L*8, R*F8), dtype=np.int32))
sy = jnp.asarray(rng.integers(0, 1<<12, (L*8, R*F8), dtype=np.int32))
sg = jnp.asarray(rng.integers(0, 2, (8, R*F8), dtype=np.int32))
t0=time.time(); out = kernels.prefix_scan(sx, sy, sg, C, F8); v = np.asarray(out[:8])
print("prefix_scan OK", round(time.time()-t0,1), flush=True)

# col_prefix: (3, L, 4, 128)
ct = jnp.asarray(rng.integers(0, 1<<12, (3, L, 4, 128), dtype=np.int32))
t0=time.time(); out = kernels.col_prefix(ct, C); v = np.asarray(out[0][:2])
print("col_prefix OK", round(time.time()-t0,1), flush=True)

# pbpr_full: (3, L, 4, 128), T=32
bk = jnp.asarray(rng.integers(0, 1<<12, (3, L, 4, 128), dtype=np.int32))
t0=time.time(); out = kernels.pbpr_full(bk, C, 32); v = np.asarray(out)
print("pbpr_full OK", round(time.time()-t0,1), flush=True)

# decompose_digits
hw = jnp.asarray(rng.integers(0, 1<<16, (18, 4096), dtype=np.int32))
t0=time.time(); out = kernels.decompose_digits(hw, 13, 20); v = np.asarray(out)
print("decompose_digits OK", round(time.time()-t0,1), flush=True)
