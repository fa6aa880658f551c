import sys, time, jax, jax.numpy as jnp
sys.argv_pallas = None
import importlib.util
spec = importlib.util.spec_from_file_location("me", "/root/repo/tools/micro_encode_lib.py")
