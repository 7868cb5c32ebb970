"""Decompose the serving hot path (config #5) into measured stages.

The round-2/3 gap: raw eval forward ~18k lines/s/chip vs service greedy
~900-1450. This script times each stage of OcrService.ocr_lines at bench
shapes so the gap is attributed, not guessed (CLAUDE.md: never re-litigate
perf without re-measuring):

  prep       host _prep per image (grayscale/polarity/routing)
  assemble   host batch assembly into static shapes
  dispatch   jnp.asarray H2D + fused-graph dispatch (async)
  device     actual device execution (fenced)
  finalize   greedy collapse + uxxxx -> utf8 + future resolution

Run: PYTHONPATH=/root/.axon_site:. python scripts/profile_service.py \
        [--data /tmp/vistaocr_bench_data_16k] [--decoder greedy|beam]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default=os.environ.get(
        "BENCH_DATA_DIR", "/tmp/vistaocr_bench_data_16k"))
    p.add_argument("--snapshot", default=None,
                   help="snapshot dir; default trains nothing and uses "
                        "random weights via bench-style init")
    p.add_argument("--decoder", default="greedy", choices=("greedy", "beam"))
    p.add_argument("--max-batch", type=int, default=128)
    p.add_argument("--lines", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/vistaocr_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vistaocr_tpu.data.shards import ShardedLineDataset
    from vistaocr_tpu.serve import OcrService, ServiceConfig
    from vistaocr_tpu.text import uxxxx_to_utf8

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    snap = args.snapshot
    if snap is None:
        # bench-style snapshot from random-init weights over the bench data
        import tempfile

        import optax

        from vistaocr_tpu.checkpoint import save_snapshot
        from vistaocr_tpu.data.buckets import ShapeContract, make_ladder
        from vistaocr_tpu.models import CnnLstmOcr, ModelConfig
        from vistaocr_tpu.text import Alphabet

        ds = ShardedLineDataset(args.data, "train")
        alphabet = Alphabet.build(ds.transcripts())
        ladder = make_ladder(ds.widths, stride=4, align=32, max_waste=0.03)
        contract = ShapeContract(bucket_widths=ladder)
        cfg = ModelConfig(num_classes=alphabet.num_classes,
                          compute_dtype="bfloat16")
        model = CnnLstmOcr(cfg)
        variables = model.init_params(jax.random.PRNGKey(0))
        snap = tempfile.mkdtemp(prefix="vistaocr_prof_snap_")
        save_snapshot(
            snap,
            variables={"params": jax.device_get(variables["params"]),
                       "batch_stats": jax.device_get(variables["batch_stats"])},
            model_config=cfg, alphabet=alphabet, contract=contract, step=0,
        )

    val = ShardedLineDataset(args.data, "val")
    imgs = [val[i].image for i in range(min(args.lines, len(val)))]

    print("# building service (warmup compiles every bucket graph)...",
          flush=True)
    t0 = time.time()
    svc = OcrService(snap, ServiceConfig(
        max_batch=args.max_batch, max_wait_ms=2.0, decoder=args.decoder,
    ))
    print(f"# service up in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    svc.ocr_lines(imgs)  # warm every graph
    print(f"# warm pass in {time.time()-t0:.0f}s", flush=True)

    # Honest end-to-end number first (the bench protocol): the staged
    # breakdown below serializes a fence per batch, which charges the
    # relay round trip to 'device' — production overlaps it.
    best = None
    for _ in range(3):
        t0 = time.time()
        svc.ocr_lines(imgs)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"# end-to-end ocr_lines: {len(imgs)/best:.0f} lines/s/chip "
          f"({best*1e3:.0f} ms best-of-3)", flush=True)

    # --- staged timing (mirrors ocr_lines' two-phase structure) ---------
    t0 = time.time()
    pendings = [svc._prep(img) for img in imgs]
    t_prep = time.time() - t0

    buckets: dict = {}
    for pp in pendings:
        b = svc.contract.bucket_for_width(pp.width)
        buckets.setdefault((b, pp.raw), []).append(pp)

    t0 = time.time()
    assembled = []
    for (b, raw), plist in buckets.items():
        for k in range(0, len(plist), args.max_batch):
            chunk = plist[k:k + args.max_batch]
            assembled.append((b, chunk, raw,
                              svc._assemble_chunk(b, chunk, raw)))
    t_assemble = time.time() - t0

    t0 = time.time()
    handles = [
        (b, chunk, svc._dispatch_assembled(a, raw), a[0].shape[0])
        for b, chunk, raw, a in assembled
    ]
    t_dispatch = time.time() - t0

    t0 = time.time()
    for _, _, handle, _ in handles:
        data = handle[1]
        fence(data[0] if isinstance(data, tuple) else data)
    t_device = time.time() - t0

    t0 = time.time()
    hyps_all = []
    for b, chunk, handle, B in handles:
        n = len(chunk)
        valid = np.arange(B) < n
        hyps = svc._finalize(handle, valid, n)
        # greedy returns raw id rows; map like OcrService._resolve does
        hyps_all.extend(
            "".join([svc._chr_list[j] for j in h.tolist()])
            if isinstance(h, np.ndarray) else uxxxx_to_utf8(h)
            for h in hyps
        )
    t_finalize = time.time() - t0

    total = t_prep + t_assemble + t_dispatch + t_device + t_finalize
    n = len(imgs)
    print(f"# decoder={args.decoder} lines={n} batches={len(assembled)}")
    for name, t in (("prep", t_prep), ("assemble", t_assemble),
                    ("dispatch", t_dispatch), ("device", t_device),
                    ("finalize", t_finalize), ("TOTAL", total)):
        print(f"{name:9s} {t*1e3:8.1f} ms  {t/total*100:5.1f}%  "
              f"({n/max(t,1e-9):8.0f} lines/s if alone)")
    print(f"end-to-end: {n/total:.0f} lines/s/chip")
    svc.close()


if __name__ == "__main__":
    main()
