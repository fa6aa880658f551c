"""Temp: rate impact of hot-K + escape coding vs full-alphabet Huffman."""
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from ivclab_tpu.models.fastvideo import FusedVideoCodec, EOB
from ivclab_tpu.ops.zerorun import zerorun_encode_blocks_dense
from ivclab_tpu.entropy.codebook import build_canonical_code
from ivclab_tpu.utils import fixtures

H, W, T = 1088, 1920, 8
frames = fixtures.video("bench", num_frames=T, shape=(H, W))
y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
codec = FusedVideoCodec(quantization_scale=1.0)
codec.train(y[:2])
qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(jax.device_put(y))
buf, valid = zerorun_encode_blocks_dense(qsyms.reshape(-1, 64), 64, EOB, 64)
buf, valid = np.asarray(buf), np.asarray(valid)
lo = codec.residual_code.lower_bound
mask = np.arange(64)[None, :] < valid[:, None]
syms = (buf - lo)[mask]
A = codec.residual_code.n
hist = np.bincount(syms, minlength=A).astype(np.float64)
total = hist.sum()
print(f"symbols {int(total)}, alphabet {A}, distinct {int((hist>0).sum())}")

full_bits = (hist * codec.residual_code.lengths).sum()
print(f"full huffman: {full_bits/total:.3f} bits/sym, {full_bits/ (H*W*T):.4f} bpp")

raw_bits = int(np.ceil(np.log2(A)))
for K in (32, 63, 127, 255):
    order = np.argsort(-hist)
    hot = order[:K]
    hot_mass = hist[hot].sum()
    esc_mass = total - hot_mass
    pmf = np.concatenate([hist[hot], [max(esc_mass, 1e-9)]]) / total
    code = build_canonical_code(np.maximum(pmf, 1e-12) / np.maximum(pmf, 1e-12).sum(), max_len=16)
    bits = (hist[hot] * code.lengths[:K]).sum() + esc_mass * (code.lengths[K] + raw_bits)
    print(f"hot{K}+esc: coverage {hot_mass/total:.4f}, {bits/total:.3f} bits/sym, bpp {bits/(H*W*T):.4f} ({(bits/full_bits-1)*100:+.2f}%)")
