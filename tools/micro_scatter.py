import time, jax, jax.numpy as jnp

def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

N = 32640 * 64  # ~2.1M
key = jax.random.PRNGKey(0)
vals = jax.random.randint(key, (N,), 0, 1000, dtype=jnp.int32)
# monotone unique-ish destinations (compaction-like)
dst = jnp.cumsum(jax.random.randint(key, (N,), 0, 2, dtype=jnp.int32)) - 1

@jax.jit
def scat(vals, dst):
    return jnp.zeros((N,), jnp.int32).at[dst].add(vals, mode="drop")

@jax.jit
def scat_set(vals, dst):
    return jnp.zeros((N,), jnp.int32).at[dst].set(vals, mode="drop")

@jax.jit
def ssorted(csum, q):
    return jnp.searchsorted(csum, q, side="right")

csum = jnp.sort(jax.random.randint(key, (N,), 0, 10**9, dtype=jnp.int32))
q = jax.random.randint(key, (N // 50,), 0, 10**9, dtype=jnp.int32)  # words << syms
q2 = jax.random.randint(key, (N,), 0, 10**9, dtype=jnp.int32)

print(f"backend={jax.default_backend()}")
t = timeit(scat, vals, dst);      print(f"scatter-add {N}:        {t*1e3:7.2f} ms ({t/N*1e9:.2f} ns/elem)")
t = timeit(scat_set, vals, dst);  print(f"scatter-set {N}:        {t*1e3:7.2f} ms ({t/N*1e9:.2f} ns/elem)")
t = timeit(ssorted, csum, q);     print(f"searchsorted {q.size} in {N}: {t*1e3:7.2f} ms")
t = timeit(ssorted, csum, q2);    print(f"searchsorted {q2.size} in {N}: {t*1e3:7.2f} ms")
# cumsum at scale
t = timeit(jax.jit(lambda v: jnp.cumsum(v)), vals); print(f"cumsum {N}:             {t*1e3:7.2f} ms")
