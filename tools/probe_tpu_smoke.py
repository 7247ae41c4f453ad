"""TPU compile smoke + EXC-scatter timing. ONE process, ONE claim.

Exercises every pallas kernel on the real TPU toolchain (Mosaic versions
change under us — interpret-mode CPU tests cannot catch lowering
regressions like the i8 minor-dim insert the histogram kernel hit):
  1. tiny end-to-end compress+decompress (hist pallas, lookup bf16x2,
     uniform walk, masked walk incl. plain2)
  2. the pallas int8 MXU lookup variant (L=80 path)
  3. EXC-vs-RAW _analyze_all slope timing on a full 65536x36 sub-block
Prints one JSON line per check.
"""

import json
import os
import sys
import time
import traceback

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

    from phyngsc_tpu.config import CodecConfig
    from phyngsc_tpu.ops import lookup, transfer
    from phyngsc_tpu.pipeline import subblock as sbmod
    from phyngsc_tpu.pipeline.compress import compress_bytes
    from phyngsc_tpu.pipeline.decompress import decompress_bytes
    from phyngsc_tpu.utils.fastq import synthesize_fastq

    ok = True

    def check(name, fn):
        nonlocal ok
        t0 = time.perf_counter()
        try:
            extra = fn() or {}
            print(json.dumps({"check": name, "ok": True,
                              "s": round(time.perf_counter() - t0, 1),
                              **extra}), flush=True)
        except Exception as e:
            ok = False
            print(json.dumps({"check": name, "ok": False,
                              "error": str(e)[:500]}), flush=True)
            traceback.print_exc()

    # 1. tiny e2e round trip (IUPAC-rich: EXC upload, walks, masked walk)
    def e2e():
        data = synthesize_fastq(20000, read_len=36, style="ERR005195", seed=7)
        cfg = CodecConfig(max_records_per_subblock=1 << 14,
                          records_per_substream=64)
        comp = compress_bytes(data, cfg, 1)
        back = decompress_bytes(comp)
        return {"roundtrip": back == data, "ratio": round(len(data) / len(comp), 2)}

    check("e2e_tiny", e2e)

    # 2. pallas int8 MXU lookup (the L>=64 variant)
    def pl_lookup():
        rng = np.random.default_rng(0)
        sym = jnp.array(rng.integers(0, 256, (4096, 80)).astype(np.uint8))
        tab = jnp.array(rng.integers(0, 1 << 16, (80, 256)).astype(np.int32))
        a = np.asarray(lookup.fused_lookup_pallas(sym, tab))
        b = np.asarray(tab)[np.arange(80)[None, :], np.asarray(sym)]
        return {"bit_exact": bool((a == b).all())}

    check("pallas_lookup_int8", pl_lookup)

    # 3. EXC vs RAW analyze on a full sub-block (scatter cost)
    R, L = 65536, 36
    rng = np.random.default_rng(0)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    seq_np = acgt[rng.integers(0, 4, size=(R, L))].copy()
    flat = seq_np.reshape(-1)
    exc_pos = rng.choice(flat.size, 4700, replace=False)
    flat[exc_pos] = np.frombuffer(b"NYRWSKMDVHBXU.-", np.uint8)[
        rng.integers(0, 15, size=exc_pos.size)]
    qual_np = rng.integers(33, 41, size=(R, L)).astype(np.uint8)
    q_mode, q_words = transfer.pack_qual_np(qual_np)
    lens = jnp.array(np.full(R, L, np.int32))

    def slope(blob_in, s_mode, n_it=8):
        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = sbmod._analyze_all(blob_in, lens, seq_mode=s_mode,
                                       qual_mode=q_mode, L=L)
            np.asarray(r[3].reshape(-1)[:8])
            return time.perf_counter() - t0

        timed(1)
        return (timed(1 + n_it) - timed(1)) / n_it

    for label, packer in (
        ("exc", transfer.pack_seq_np),
        ("raw", lambda s: (transfer.SEQ_RAW,
                           transfer._pack_fixed_np(s.reshape(-1), 8))),
    ):
        def one(label=label, packer=packer):
            s_mode, s_words = packer(seq_np)
            blob_in = jnp.array(np.concatenate([s_words, q_words]))
            per = slope(blob_in, s_mode)
            return {"mode": label, "s_mode": int(s_mode),
                    "seq_mb": round(s_words.nbytes / 1e6, 2),
                    "analyze_ms": round(per * 1e3, 2)}

        check(f"analyze_{label}", one)

    print(json.dumps({"smoke_ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
