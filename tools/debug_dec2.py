"""Temp: decode sub-phase profile v2 (pair decode + dense MC)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from ivclab_tpu.models.fastvideo import FusedVideoCodec, EOB
from ivclab_tpu.ops.bitpack import decode_blocks_lut_pair
from ivclab_tpu.ops.transform import cap_from_group_words
from ivclab_tpu.ops.zerorun import zerorun_decode_blocks_dense
from ivclab_tpu.ops.dct import idct2_fused
from ivclab_tpu.ops.motion import motion_compensate_dense
from ivclab_tpu.utils import fixtures

H, W, T = 1088, 1920, 8
frames = fixtures.video("bench", num_frames=T, shape=(H, W))
y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
codec = FusedVideoCodec(quantization_scale=1.0)
codec.train(y[:2])
qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(jax.device_put(y))
words, totals, offsets, counts = codec.pack_gop(qsyms)
cap = cap_from_group_words(words.shape[-1])
lo = jnp.int32(codec.residual_code.lower_bound)
G, GW = words.shape[1], words.shape[2]
frame_base = (jnp.arange(T, dtype=jnp.int32) * (G * GW * 32))[:, None]
offs = (offsets + frame_base).reshape(-1)
cnts = counts.reshape(-1)
wflat = words.reshape(-1)

f_lut = jax.jit(lambda w, o, c: decode_blocks_lut_pair(w, o, c, codec._dec_lut, cap))
sym_idx = f_lut(wflat, offs, cnts)

@jax.jit
def f_zr(sym_idx, cnts):
    syms = jnp.where(jnp.arange(cap)[None, :] < cnts[:, None], sym_idx + lo, 0)
    return zerorun_decode_blocks_dense(syms, cnts, 64, EOB)
blocks, ok = f_zr(sym_idx, cnts)

@jax.jit
def f_idct(blocks):
    deq = (blocks.astype(jnp.float32) * codec.qt[None, :]).astype(jnp.int32)
    pix = idct2_fused(deq.astype(jnp.float32))
    return pix.reshape(T, H // 8, W // 8, 8, 8).transpose(0, 1, 3, 2, 4).reshape(T, H, W)
planes = f_idct(blocks)

@jax.jit
def f_rebuild(planes, mvs):
    def rebuild(recon_prev, inputs):
        t, residual, mv = inputs
        pred = jnp.where(t == 0, jnp.zeros_like(recon_prev), motion_compensate_dense(recon_prev, mv, 4))
        return pred + residual, pred + residual
    ts = jnp.arange(T, dtype=jnp.int32)
    _, recons = jax.lax.scan(rebuild, jnp.zeros((H, W), jnp.float32), (ts, planes, mvs))
    return recons
recons = f_rebuild(planes, mvs)
err = float(abs(np.asarray(recons) - np.asarray(enc_recons)).max())
print("split max err:", err, "ok:", bool(ok))

def tmeas(f, *a, n=5):
    for _ in range(2): jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

print(f"pair lut:   {tmeas(f_lut, wflat, offs, cnts):7.1f} ms")
print(f"zerorun:    {tmeas(f_zr, sym_idx, cnts):7.1f} ms")
print(f"idct:       {tmeas(f_idct, blocks):7.1f} ms")
print(f"rebuild MC: {tmeas(f_rebuild, planes, mvs):7.1f} ms")
