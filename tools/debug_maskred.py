"""Temp: dense mask-reduce table lookup vs gather, 16.7M elems, 128-entry table."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
rng = np.random.default_rng(0)
E = 261120 * 64
sym = jnp.asarray(rng.integers(0, 4096, E, dtype=np.int32).reshape(-1, 64))
hot = jnp.asarray(rng.choice(4096, 127, replace=False).astype(np.int32))
fused = jnp.asarray(rng.integers(0, 1 << 22, 127, dtype=np.int32))
table = jnp.asarray(rng.integers(0, 1 << 22, 4096, dtype=np.int32))

@jax.jit
def f_gather(sym):
    return table[sym]

@jax.jit
def f_maskred(sym):
    eq = sym[:, :, None] == hot[None, None, :]
    val = jnp.sum(jnp.where(eq, fused[None, None, :], 0), axis=-1)
    is_hot = jnp.any(eq, axis=-1)
    return jnp.where(is_hot, val, -1)

def tmeas(f, *a, n=5):
    for _ in range(2): jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

print(f"gather 4096-table: {tmeas(f_gather, sym):7.1f} ms")
print(f"mask-reduce 127:   {tmeas(f_maskred, sym):7.1f} ms")
