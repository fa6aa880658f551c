"""Build + load the C++ serial entropy engine via ctypes.

Compiled lazily (g++ -O3) into ``ivclab_tpu/runtime/native/_build`` with a
source-hash cache key. Every entry point has a pure-NumPy fallback so the
framework works where no toolchain exists; the C++ path is the default
host engine and the correctness oracle for the device kernels.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native" / "entropy.cpp"
_BUILD_DIR = Path(__file__).parent / "native" / "_build"
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _compile() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _BUILD_DIR / f"libivclab_native_{tag}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    os.replace(tmp, out)
    return out


def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        path = _compile()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32

        lib.ivc_pack_bits.restype = i64
        lib.ivc_pack_bits.argtypes = [u32p, i32p, i64, u32p]

        lib.ivc_decode_symbols.restype = i64
        lib.ivc_decode_symbols.argtypes = [
            u32p, i64, i64, i64, u32p, u32p, i32p, i32p, i32, i32, i32p,
        ]

        lib.ivc_zerorun_encode.restype = i64
        lib.ivc_zerorun_encode.argtypes = [i32p, i64, i32, i32, i32p]

        lib.ivc_zerorun_decode.restype = i64
        lib.ivc_zerorun_decode.argtypes = [i32p, i64, i64, i32, i32, i32p]

        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.ivc_huffman_depths.restype = i64
        lib.ivc_huffman_depths.argtypes = [f64p, i64, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------- pack bits

def pack_bits(codes: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, int]:
    """Serial MSB-first pack; returns (u32 words, total_bits)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    cap = (int(np.sum(lens.clip(min=0))) + 31) // 32 + 1
    out = np.zeros(max(cap, 1), dtype=np.uint32)
    lib = get_lib()
    if lib is not None:
        total = lib.ivc_pack_bits(codes, lens, codes.size, out)
    else:
        total = _pack_bits_np(codes, lens, out)
    nwords = (int(total) + 31) // 32
    return out[: max(nwords, 0)], int(total)


def _pack_bits_np(codes, lens, out):
    bitpos = 0
    for c, l in zip(codes.tolist(), lens.tolist()):
        if l <= 0:
            continue
        lj = (int(c) << (32 - l)) & 0xFFFFFFFF if l < 32 else int(c)
        w, sh = bitpos >> 5, bitpos & 31
        out[w] |= (lj >> sh) & 0xFFFFFFFF
        if sh:
            out[w + 1] |= (lj << (32 - sh)) & 0xFFFFFFFF
        bitpos += l
    return bitpos


# ------------------------------------------------------------ decode symbols

def decode_symbols(words: np.ndarray, num_symbols: int, code, start_bit: int = 0) -> np.ndarray:
    """Serial canonical decode -> 0-based alphabet indices."""
    words = np.ascontiguousarray(words, dtype=np.uint32)
    out = np.empty(num_symbols, dtype=np.int32)
    lib = get_lib()
    fc = np.ascontiguousarray(code.first_code, dtype=np.uint32)
    go = np.ascontiguousarray(code.group_offset, dtype=np.int32)
    ss = np.ascontiguousarray(code.sorted_syms, dtype=np.int32)
    lj = np.ascontiguousarray(code.lj_next_minus1, dtype=np.uint32)
    if lib is not None:
        used = lib.ivc_decode_symbols(
            words, words.size, start_bit, num_symbols, lj, fc, go, ss, ss.size,
            code.min_len, out
        )
        if used < 0:
            raise ValueError("canonical decode failed: corrupt bitstream")
        return out
    return _decode_symbols_np(words, num_symbols, lj, fc, go, ss, start_bit, code.min_len)


def _decode_symbols_np(words, num_symbols, lj, fc, go, ss, start_bit, min_len=1):
    out = np.empty(num_symbols, dtype=np.int32)
    bitpos = start_bit
    total_bits = words.size * 32
    for i in range(num_symbols):
        if bitpos >= total_bits:
            raise ValueError("canonical decode failed: stream exhausted")
        w, sh = bitpos >> 5, bitpos & 31
        window = (int(words[w]) << sh) & 0xFFFFFFFF
        if sh and w + 1 < words.size:
            window |= int(words[w + 1]) >> (32 - sh)
        length = min_len
        while length < 32 and window > int(lj[length - 1]):
            length += 1
        code_val = window >> (32 - length) if length < 32 else window
        pos = int(go[length]) + code_val - int(fc[length])
        if pos < 0 or pos >= ss.size:
            raise ValueError("canonical decode failed: corrupt bitstream")
        out[i] = ss[pos]
        bitpos += length
    return out


# ------------------------------------------------------------ huffman depths

def huffman_depths(leaf_w_sorted: np.ndarray) -> np.ndarray | None:
    """Two-queue prefix-code depths for ascending-sorted leaf weights.

    Bit-identical merge order/tie-breaking to the Python path in
    ``entropy/codebook.py``; returns None when the native engine is
    unavailable (caller falls back to the Python loop). Per-frame adaptive
    coding builds a tree per frame, so this loop is on the encode critical
    path (measured ~25 ms/frame in Python at 1080p alphabets vs ~0.1 ms
    here).
    """
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(leaf_w_sorted, dtype=np.float64)
    out = np.empty(w.size, dtype=np.int32)
    if lib.ivc_huffman_depths(w, w.size, out) != 0:
        raise ValueError("huffman_depths: need at least one leaf")
    return out


# ---------------------------------------------------------------- zero-run

def zerorun_encode(blocks: np.ndarray, eob: int) -> np.ndarray:
    """Serial zero-run encode of [N, block_size] -> compact symbol stream."""
    blocks = np.ascontiguousarray(blocks, dtype=np.int32)
    n, bs = blocks.shape
    out = np.empty(n * (bs // 2 * 3 + 2), dtype=np.int32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native engine unavailable (use the device path)")
    k = lib.ivc_zerorun_encode(blocks, n, bs, eob, out)
    return out[:k].copy()


def zerorun_decode(symbols: np.ndarray, nblocks: int, block_size: int, eob: int) -> np.ndarray:
    """Serial zero-run decode -> [nblocks, block_size]."""
    symbols = np.ascontiguousarray(symbols, dtype=np.int32)
    out = np.zeros((nblocks, block_size), dtype=np.int32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native engine unavailable (use the device path)")
    used = lib.ivc_zerorun_decode(symbols, symbols.size, nblocks, block_size, eob, out)
    if used < 0:
        raise ValueError("zero-run decode failed: corrupt stream")
    return out
