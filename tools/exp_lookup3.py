"""Re-measure v0 vs v2 carefully: per-iter blocking + varying inputs."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from phyngsc_tpu.ops import lookup
from tools.exp_lookup2 import v2_f32, v3_int8

R, L, A = 65536, 36, 256


def bench_vary(label, fn, syms, tab, n=8):
    jax.block_until_ready(fn(syms[0], tab))
    # (a) same input, block each iter
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(syms[0], tab))
    same_ms = (time.perf_counter() - t0) / n * 1e3
    # (b) varying input, block each iter
    for s in syms:
        jax.block_until_ready(fn(s, tab))  # warm transfer
    t0 = time.perf_counter()
    for s in syms:
        jax.block_until_ready(fn(s, tab))
    vary_ms = (time.perf_counter() - t0) / len(syms) * 1e3
    print(f"{label:34s} same={same_ms:7.2f} ms  vary={vary_ms:7.2f} ms",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    lens_np = rng.integers(2, 13, size=(L, A)).astype(np.int64)
    codes_np = rng.integers(0, 1 << 20, size=(L, A)) & ((1 << lens_np) - 1)
    tab = jnp.array(((lens_np << lookup.CODE_BITS) | codes_np).astype(np.int32))
    syms = [jnp.array(rng.integers(33, 74, size=(R, L)).astype(np.uint8))
            for _ in range(8)]
    jax.block_until_ready(syms)

    bench_vary("v0 current bf16 2-dot", lookup.fused_lookup, syms, tab)
    bench_vary("v2 f32 single", v2_f32, syms, tab)
    bench_vary("v3 int8 3-plane", v3_int8, syms, tab)


if __name__ == "__main__":
    main()
