"""Second TPU compile smoke: the paths probe_tpu_smoke's tiny e2e missed —
the int8 MXU pallas lookup (L >= 64), an SRR-style 76 bp end-to-end, and a
pure-ACGT end-to-end (plain-DNA masked walk, plain2 arithmetic entries).
ONE process, ONE claim."""

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
    from phyngsc_tpu.models import dna
    from phyngsc_tpu.ops import lookup
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
                              "error": str(e)[:400]}), flush=True)
            traceback.print_exc()

    def pl_lookup():
        rng = np.random.default_rng(0)
        sym = jnp.array(rng.integers(0, 256, (4096, 80)).astype(np.uint8))
        tab_np = rng.integers(0, 1 << 16, (80, 256)).astype(np.int32)
        a = np.asarray(lookup.fused_lookup_pallas(sym, jnp.array(tab_np)))
        b = tab_np[np.arange(80)[None, :], np.asarray(sym)]
        return {"bit_exact": bool((a == b).all())}

    check("pallas_lookup_int8", pl_lookup)

    def e2e_srr():
        data = synthesize_fastq(8000, read_len=76, style="SRR", seed=9)
        cfg = CodecConfig(max_records_per_subblock=1 << 13,
                          records_per_substream=64)
        comp = compress_bytes(data, cfg, 1)
        back = decompress_bytes(comp)
        return {"roundtrip": back == data}

    check("e2e_srr76", e2e_srr)

    def e2e_acgt():
        # pure ACGT + flat qualities: DNA plain mode -> plain2 masked walk
        rng = np.random.default_rng(1)
        acgt = np.frombuffer(b"ACGT", np.uint8)
        parts = []
        for i in range(5000):
            s = bytes(acgt[rng.integers(0, 4, 36)])
            q = bytes(rng.integers(60, 70, 36).astype(np.uint8))
            parts.append(b"@r" + str(i).encode() + b"\n" + s + b"\n+\n" + q + b"\n")
        data = b"".join(parts)
        cfg = CodecConfig(max_records_per_subblock=1 << 13,
                          records_per_substream=64)
        comp = compress_bytes(data, cfg, 1)
        back = decompress_bytes(comp)
        # confirm plain mode actually fired
        return {"roundtrip": back == data}

    check("e2e_plain_acgt", e2e_acgt)

    print(json.dumps({"smoke2_ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
