import sys, os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/tpu_exp")
import importlib.util
spec = importlib.util.spec_from_file_location("exph", "/root/repo/tools/tpu_exp/exp_h_mod.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
