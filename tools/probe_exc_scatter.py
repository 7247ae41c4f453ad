"""Probe: cost of the SEQ_2BIT_EXC device scatter on TPU.

One process, one claim. Slope-times _analyze_all in three upload modes on a
realistic 65536x36 IUPAC-rich sub-block: RAW (old fallback), EXC (2-bit +
exception scatter), and pure-ACGT 2BIT (floor). Prints one JSON line per
measurement.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    t0 = time.perf_counter()
    np.asarray(jax.device_put(np.zeros(8, np.uint32)))
    print(json.dumps({"claim_s": round(time.perf_counter() - t0, 1),
                      "backend": jax.default_backend()}), flush=True)

    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp

    from phyngsc_tpu.ops import transfer
    from phyngsc_tpu.pipeline import subblock as sbmod

    R, L = 65536, 36
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq_np = acgt[rng.integers(0, 4, size=(R, L))].copy()
    flat = seq_np.reshape(-1)
    exc_pos = rng.choice(flat.size, 4700, replace=False)  # bench-like 0.2%
    flat[exc_pos] = np.frombuffer(b"NYRWSKMDVHBXU.-", np.uint8)[
        rng.integers(0, 15, size=exc_pos.size)]
    qual_np = rng.integers(33, 41, size=(R, L)).astype(np.uint8)
    q_mode, q_words = transfer.pack_qual_np(qual_np)
    lens = jnp.array(np.full(R, L, np.int32))

    def slope(blob_in, s_mode, n_it=8):
        def step():
            return sbmod._analyze_all(blob_in, lens, seq_mode=s_mode,
                                      qual_mode=q_mode, L=L)

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = step()
            np.asarray(r[3].reshape(-1)[:8])
            return time.perf_counter() - t0

        timed(1)  # compile + first execution
        return (timed(1 + n_it) - timed(1)) / n_it

    for label, packer in (
        ("exc", transfer.pack_seq_np),
        ("raw", lambda s: (transfer.SEQ_RAW,
                           transfer._pack_fixed_np(s.reshape(-1), 8))),
    ):
        s_mode, s_words = packer(seq_np)
        blob_in = jnp.array(np.concatenate([s_words, q_words]))
        per = slope(blob_in, s_mode)
        print(json.dumps({"mode": label, "s_mode": int(s_mode),
                          "seq_words_mb": round(s_words.nbytes / 1e6, 3),
                          "analyze_ms": round(per * 1e3, 2)}), flush=True)

    # pure-ACGT floor
    seq2 = acgt[rng.integers(0, 4, size=(R, L))]
    s_mode, s_words = transfer.pack_seq_np(seq2)
    blob_in = jnp.array(np.concatenate([s_words, q_words]))
    per = slope(blob_in, s_mode)
    print(json.dumps({"mode": "2bit", "s_mode": int(s_mode),
                      "seq_words_mb": round(s_words.nbytes / 1e6, 3),
                      "analyze_ms": round(per * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
