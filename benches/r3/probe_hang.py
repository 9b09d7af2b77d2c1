import os, sys, time, faulthandler
sys.path.insert(0, "/root/repo")
faulthandler.enable()
faulthandler.dump_traceback_later(360, exit=True)
from tpu_msm.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from tpu_msm.config import default_config
from tpu_msm.constants import CURVES
from tpu_msm.cuzk.pipeline import get_pipeline
from tpu_msm.utils import preprocess

n = 1 << 16
curve = CURVES["bn254_s12"]
cfg = default_config(n, curve)
pipe = get_pipeline(cfg)
t0=time.time()
xs, ys, hw, _ = preprocess.gen_planar_inputs(curve, n, seed=3)
hw = np.concatenate([hw, np.zeros((2, n), np.uint32)], axis=0)
xs, ys = xs.astype(np.int32), ys.astype(np.int32)
print("vectors", round(time.time()-t0,1), flush=True)
t0=time.time()
xd, yd, hd = (jax.device_put(a) for a in (xs, ys, hw))
jax.block_until_ready((xd, yd, hd))
print("h2d done", round(time.time()-t0,1), flush=True)
t0=time.time()
lowered = pipe._fn.lower(xd, yd, hd)
print("lowered", round(time.time()-t0,1), flush=True)
t0=time.time()
compiled = lowered.compile()
print("compiled", round(time.time()-t0,1), flush=True)
t0=time.time()
g = compiled(xd, yd, hd)
print("dispatched", round(time.time()-t0,1), flush=True)
t0=time.time()
jax.block_until_ready(g)
print("executed", round(time.time()-t0,1), flush=True)
t0=time.time()
_ = np.asarray(g.x)
print("fetched", round(time.time()-t0,1), flush=True)
for i in range(3):
    t0=time.time(); g = compiled(xd, yd, hd); jax.block_until_ready(g)
    print("steady run", round((time.time()-t0)*1e3,1), "ms", flush=True)
