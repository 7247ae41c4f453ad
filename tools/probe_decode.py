"""On-chip: single-walk vs pair-LUT quality decode at bench shapes."""
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

from phyngsc_tpu.config import CodecConfig
from phyngsc_tpu.models import quality as qmod


def bench(label, fn, *args, n=5, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    print(f"{label:38s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return r


def main():
    cfg = CodecConfig()
    R, L, G = 65536, 36, 64
    rng = np.random.default_rng(0)
    qual = rng.integers(33, 74, size=(R, L)).astype(np.uint8)
    lens = jnp.array(np.full(R, L, np.int32))
    qj = jnp.array(qual)
    counts = np.asarray(qmod.analyze(qj, lens))
    tables, q_group = qmod.build_tables_adaptive(counts, cfg)
    cap = R * L // 2 + R // G + 8
    words, sub, _ = qmod.encode_device(
        qj, lens, jnp.array(tables.codes), jnp.array(tables.lens),
        G, cap, q_group, "rows_compact")
    wj, sj = jnp.asarray(words), jnp.asarray(sub)
    print("backend:", jax.devices()[0], "maxlen:", int(tables.lens.max()))
    single = bench("decode single walk (uniform)", qmod.decode_device,
                   wj, sj, lens, jnp.array(tables.luts(cfg.max_code_len)),
                   L, G, cfg.max_code_len, L)
    t0 = time.perf_counter()
    luts2, pair_ids, half_ids, pb = qmod.pair_plan(tables, L)
    print(f"pair_plan host build: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"(U={luts2.shape[0]}, W={pb})")
    pv, hv = qmod.pair_step_vectors(pair_ids, half_ids, L, (G * L) // 2)
    paired = bench("decode pair walk", qmod.decode_device_pairs,
                   wj, sj, lens, luts2, jnp.array(pv), jnp.array(hv),
                   L, L, G, pb)
    ok = np.array_equal(np.asarray(single), np.asarray(paired))
    print("match:", ok, "| correct:", np.array_equal(np.asarray(paired), qual))


if __name__ == "__main__":
    main()
