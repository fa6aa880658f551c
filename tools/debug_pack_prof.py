"""Temp: pack sub-phase profile at bench shape."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from functools import partial
from ivclab_tpu.models.fastvideo import FusedVideoCodec, EOB
from ivclab_tpu.ops.zerorun import zerorun_encode_blocks_dense, zerorun_counts
from ivclab_tpu.ops.transform import pack_symbols_grouped_cap, PACK_GROUP, group_words_for_cap, block_words_for_cap
from ivclab_tpu.ops.bitpack import _u32
from ivclab_tpu.utils import fixtures

H, W, T = 1088, 1920, 8
frames = fixtures.video("bench", num_frames=T, shape=(H, W))
y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
codec = FusedVideoCodec(quantization_scale=1.0)
codec.train(y[:2])
qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(jax.device_put(y))
CAP = 64
flat = qsyms.reshape(-1, 64)
lo = jnp.int32(codec.residual_code.lower_bound)

f_zr = jax.jit(lambda q: zerorun_encode_blocks_dense(q, 64, EOB, CAP))
buf, valid = f_zr(flat)

f_cnt = jax.jit(lambda q: zerorun_counts(q))
f_pack = jax.jit(lambda b, v: pack_symbols_grouped_cap(b - lo, v, codec._enc_fused, CAP))
gw, gb, bo, tot = f_pack(buf, valid)

# pack internals split
N, S = buf.shape
GWW = group_words_for_cap(CAP)
BW = block_words_for_cap(CAP)

@jax.jit
def f_gather(buf, valid):
    pos = jnp.arange(S, dtype=jnp.int32)
    mask = pos[None, :] < valid[:, None]
    fused = codec._enc_fused[jnp.clip(buf - lo, 0, codec._enc_fused.shape[0] - 1)]
    lens = jnp.where(mask, (fused & 63).astype(jnp.int32), 0)
    codes = jnp.where(mask, fused >> 6, 0)
    return codes, lens
codes, lens = f_gather(buf, valid)

@jax.jit
def f_deposit(codes, lens):
    csum = jnp.cumsum(lens, axis=1)
    off = csum - lens
    shift_lj = _u32((32 - lens) & 31)
    lj = jnp.where(lens > 0, codes << shift_lj, _u32(0))
    word = off >> 5
    sh = _u32(off & 31)
    p1 = lj >> sh
    p2 = jnp.where(sh == 0, _u32(0), lj << (_u32(32) - sh))
    iota = jnp.arange(BW, dtype=jnp.int32)[None, :]
    max_slots = jnp.max(jnp.sum((lens > 0).astype(jnp.int32), axis=1))
    def cond_body(carry):
        i, acc = carry
        wi = word[:, i][:, None]
        acc = acc + jnp.where(iota == wi, p1[:, i][:, None], _u32(0))
        acc = acc + jnp.where(iota == wi + 1, p2[:, i][:, None], _u32(0))
        return i + 1, acc
    acc0 = jnp.zeros((N, BW), dtype=_u32(0).dtype)
    _, acc = jax.lax.while_loop(lambda c: c[0] < max_slots, cond_body, (jnp.int32(0), acc0))
    return acc, csum[:, -1]
acc, block_bits = f_deposit(codes, lens)

@jax.jit
def f_place(acc, block_bits):
    G = N // PACK_GROUP
    Lg = block_bits.reshape(G, PACK_GROUP)
    O = jnp.cumsum(Lg, axis=1) - Lg
    shp = _u32((O & 31).reshape(N))[:, None]
    acc_prev = jnp.concatenate([jnp.zeros((N, 1), jnp.uint32), acc[:, :-1]], axis=1)
    shifted = jnp.where(shp == 0, acc, (acc >> shp) | (acc_prev << (_u32(32) - shp)))
    spill = jnp.where(shp[:, 0] == 0, _u32(0), acc[:, -1] << (_u32(32) - shp[:, 0]))
    shifted = jnp.concatenate([shifted, spill[:, None]], axis=1)
    P = (O >> 5).reshape(G, PACK_GROUP)
    pad_w = 1024
    out = jnp.zeros((G, GWW), dtype=jnp.uint32)
    shifted_g = shifted.reshape(G, PACK_GROUP, BW + 1)
    for b in range(PACK_GROUP):
        x = jnp.zeros((G, pad_w), jnp.uint32).at[:, : BW + 1].set(shifted_g[:, b])
        pb = P[:, b]
        for k in range(10):
            bit = ((pb >> k) & 1) == 1
            x = jnp.where(bit[:, None], jnp.roll(x, 1 << k, axis=1), x)
        out = out + x[:, :GWW]
    return out
outw = f_place(acc, block_bits)

def tmeas(f, *a, n=5):
    for _ in range(2): jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

print(f"zerorun dense enc: {tmeas(f_zr, flat):7.1f} ms")
print(f"counts prepass:    {tmeas(f_cnt, flat):7.1f} ms")
print(f"full pack:         {tmeas(f_pack, buf, valid):7.1f} ms")
print(f"  code gather:     {tmeas(f_gather, buf, valid):7.1f} ms")
print(f"  deposit loop:    {tmeas(f_deposit, codes, lens):7.1f} ms")
print(f"  place (rolls):   {tmeas(f_place, acc, block_bits):7.1f} ms")
