import sys, time, faulthandler
sys.path.insert(0, "/root/repo")
faulthandler.enable(); faulthandler.dump_traceback_later(1300, exit=True)
from tpu_msm.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, numpy as np
from tpu_msm.config import default_config
from tpu_msm.constants import BN254_S12
from tpu_msm.cuzk.pipeline import get_pipeline
from tpu_msm.utils import preprocess

def run(n, overrides=None):
    import dataclasses
    cfg = default_config(n, BN254_S12)
    if overrides: cfg = dataclasses.replace(cfg, **overrides)
    pipe = get_pipeline(cfg)
    np_ = pipe.padded_size(n)
    xs, ys, hw, _ = preprocess.gen_planar_inputs(BN254_S12, np_, seed=7)
    hw = np.concatenate([hw, np.zeros((2, np_), np.uint32)], axis=0)
    xs, ys = xs.astype(np.int32), ys.astype(np.int32)
    t0=time.time()
    w = pipe.window_sums(xs, ys, hw)
    print(f"n=2^{n.bit_length()-1} cfg s={cfg.window_size} C={cfg.columns} backend={cfg.backend} first {round(time.time()-t0,1)}s", flush=True)
    t0=time.time(); w = pipe.window_sums(xs, ys, hw)
    print(f"   steady {round((time.time()-t0)*1e3,1)} ms", flush=True)

run(1 << 13)
print("2^13 done", flush=True)
run(1 << 16, {"backend": "xla"})
print("2^16 xla done", flush=True)
