"""Temp: pack sub-phase profile v2 (hot path)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from ivclab_tpu.models.fastvideo import FusedVideoCodec, EOB, _map_gop_hot, _gop_counts_max, _bucket, CAP_BUCKETS, BW_BUCKETS, GW_BUCKETS
from ivclab_tpu.ops.transform import pack_extents, pack_grouped_sized
from ivclab_tpu.utils import fixtures

H, W, T = 1088, 1920, 8
frames = fixtures.video("bench", num_frames=T, shape=(H, W))
y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
codec = FusedVideoCodec(quantization_scale=1.0)
codec.train(y[:2])
qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(jax.device_put(y))
code = codec.residual_code
lo = jnp.int32(code.lower_bound)
counts_max = int(_gop_counts_max(qsyms))
cap = _bucket(counts_max, CAP_BUCKETS)
f_map = lambda q: _map_gop_hot(q, codec._hot_vals, codec._hot_fused, codec._esc_code, codec._esc_len, lo, cap, code.raw_bits)
codes, lens, valid = f_map(qsyms)
bw_max, gw_max = pack_extents(lens)
bw = _bucket(int(bw_max) + 2, BW_BUCKETS)
gw = _bucket(int(gw_max), GW_BUCKETS)
print(f"cap={cap} bw={bw} (max {int(bw_max)}) gw={gw} (max {int(gw_max)})")
f_place = lambda c, l: pack_grouped_sized(c, l, gw, bw)
out = f_place(codes, lens)

def tmeas(f, *a, n=5):
    for _ in range(2): jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3

print(f"counts prepass: {tmeas(_gop_counts_max, qsyms):7.1f} ms")
print(f"map (zr+hot):   {tmeas(f_map, qsyms):7.1f} ms")
print(f"extents:        {tmeas(pack_extents, lens):7.1f} ms")
print(f"place:          {tmeas(f_place, codes, lens):7.1f} ms")
