"""Round-5 diagnostic for the BENCH_r04 submit collapse (VERDICT weak #2:
mb=128 read 193.8 lines/s, p99 1972 ms on a 384-line window).

Reconstructs the bench's submit setup exactly (same ladder, snapshot
shape, flood pattern), instruments the service's batch lifecycle
(assemble / dispatch / finalize wall-times per (bucket, B) batch), and
runs the flood REPEATEDLY in one service so cold-window stalls separate
from steady state.

Run on the chip:  PYTHONPATH=/root/.axon_site:. python scripts/diag_submit.py
"""

import json
import os
import threading
import time

import numpy as np

from vistaocr_tpu.runtime import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

from vistaocr_tpu.checkpoint import save_snapshot  # noqa: E402
from vistaocr_tpu.data import ShardedLineDataset, ShapeContract  # noqa: E402
from vistaocr_tpu.data.buckets import make_ladder  # noqa: E402
from vistaocr_tpu.models import CnnLstmOcr, ModelConfig  # noqa: E402
from vistaocr_tpu.serve import OcrService, ServiceConfig  # noqa: E402
from vistaocr_tpu.text import Alphabet  # noqa: E402

BENCH_DATA = os.environ.get("BENCH_DATA_DIR", "/tmp/vistaocr_bench_data_16k")

t_init0 = time.time()
ds = ShardedLineDataset(BENCH_DATA, "train")
alphabet = Alphabet.build(ds.transcripts())
ladder = make_ladder(ds.widths, stride=4, align=32, max_waste=0.03)
contract = ShapeContract(bucket_widths=ladder)
cfg = ModelConfig(num_classes=alphabet.num_classes, compute_dtype="bfloat16")
model = CnnLstmOcr(cfg)
variables = model.init_params(jax.random.PRNGKey(0))
snap = "/tmp/vistaocr_diag_snap"
save_snapshot(snap, variables=jax.device_get(variables), model_config=cfg,
              alphabet=alphabet, contract=contract, step=0)
val = ShardedLineDataset(BENCH_DATA, "val")
imgs = [val[i].image for i in range(len(val))]
print(f"setup {time.time()-t_init0:.1f}s; ladder {ladder}", flush=True)

EVENTS = []


class InstrumentedService(OcrService):
    def _start_batch(self, bucket_idx, pendings, raw=False):
        t0 = time.time()
        ctx = super()._start_batch(bucket_idx, pendings, raw)
        if ctx is not None:
            B = len(ctx[3])
            EVENTS.append(["start", t0, time.time() - t0, bucket_idx,
                           len(pendings), B])
        return ctx

    def _complete_batch(self, ctx):
        t0 = time.time()
        super()._complete_batch(ctx)
        EVENTS.append(["complete", t0, time.time() - t0, ctx[0],
                       ctx[4], len(ctx[3])])


mb = 128
t0 = time.time()
svc = InstrumentedService(snap, ServiceConfig(max_batch=mb, max_wait_ms=2.0))
print(f"service init (warmup incl.): {time.time()-t0:.1f}s", flush=True)
svc.ocr_lines(imgs[:mb])  # the bench's extra warm line
print("bench-style ocr_lines warm done", flush=True)

sub = imgs[:384]
nclients = 8

for rep in range(4):
    EVENTS.clear()
    lat = []
    lock = threading.Lock()

    def client(shard):
        fs = [svc.submit(img) for img in shard]
        ls = [f.result(timeout=300).latency_ms for f in fs]
        with lock:
            lat.extend(ls)

    shards = [sub[i::nclients] for i in range(nclients)]
    t0 = time.time()
    ths = [threading.Thread(target=client, args=(s,)) for s in shards]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.time() - t0
    stats = {
        "lines_per_sec": round(len(sub) / dt, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p99_ms": round(float(np.percentile(lat, 99)), 1),
        "max_ms": round(float(np.max(lat)), 1),
        "wall_s": round(dt, 2),
    }
    print(f"flood {rep}: {json.dumps(stats)}", flush=True)
    # slowest phases this flood
    ev = sorted(EVENTS, key=lambda e: -e[2])[:6]
    base = min(e[1] for e in EVENTS)
    for kind, ts, dur, b, n, B in ev:
        print(f"   {kind:9s} t+{ts-base:6.3f}s dur={dur*1000:7.1f}ms "
              f"bucket={b}({svc.contract.bucket_widths[b]}px) n={n} B={B}",
              flush=True)
    nb = len([e for e in EVENTS if e[0] == "start"])
    print(f"   batches={nb}", flush=True)

svc.close()
print("done", flush=True)
