"""HTTP serving wrapper: real socket round-trips against the batched
service (config #5's network face)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from vistaocr_tpu.data import build_synthetic_dataset
from vistaocr_tpu.data.synth import SynthConfig, SyntheticLineGenerator
from vistaocr_tpu.serve import OcrService, ServiceConfig
from vistaocr_tpu.serve.http_server import make_handler
from vistaocr_tpu.train import PRESETS, TrainConfig, fit

from http.server import ThreadingHTTPServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("http_data")
    cfg = SynthConfig(language="charset", charset="abcdeo ", min_words=1,
                      max_words=2)
    data = build_synthetic_dataset(str(d), num_train=96, num_val=8,
                                   height=32, max_width=256, config=cfg,
                                   seed=61)
    run = str(tmp_path_factory.mktemp("http_run"))
    base = dict(PRESETS["synth-tiny"])
    base.update(data_dir=data, snapshot_dir=run, epochs=10**6, max_steps=200,
                val_interval_steps=100, log_interval=200,
                batch_pixels=2**16, bucket_widths=(128, 256), seed=7)
    fit(TrainConfig(**base), log=lambda *a: None)

    svc = OcrService(run + "/best", ServiceConfig(max_batch=4, warmup=False))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", cfg
    httpd.shutdown()
    svc.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, data, content_type):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestHttpServer:
    def test_healthz(self, server):
        base, _ = server
        status, body = _get(base + "/healthz")
        assert status == 200 and body == {"ok": True}

    def test_ocr_png_roundtrip(self, server):
        base, cfg = server
        gen = SyntheticLineGenerator(cfg, seed=77)
        img, text = gen.sample(height=32, max_width=250)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        status, body = _post(base + "/ocr", buf.getvalue(), "image/png")
        assert status == 200, body
        assert body["text"] == text
        assert body["latency_ms"] > 0

    def test_ocr_json_b64(self, server):
        base, cfg = server
        gen = SyntheticLineGenerator(cfg, seed=78)
        img, text = gen.sample(height=32, max_width=250)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payload = json.dumps(
            {"image_b64": base64.b64encode(buf.getvalue()).decode()}
        ).encode()
        status, body = _post(base + "/ocr", payload, "application/json")
        assert status == 200, body
        assert body["text"] == text

    def test_bad_payload_400(self, server):
        base, _ = server
        status, body = _post(base + "/ocr", b"not an image", "image/png")
        assert status == 400 and "error" in body

    def test_stats(self, server):
        base, _ = server
        status, body = _get(base + "/stats")
        assert status == 200 and body["lines"] >= 2


class TestBatchEndpoint:
    def test_ocr_batch_roundtrip(self, server):
        base, cfg = server
        gen = SyntheticLineGenerator(cfg, seed=79)
        pairs = [gen.sample(height=32, max_width=250) for _ in range(5)]
        b64s = []
        for img, _ in pairs:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            b64s.append(base64.b64encode(buf.getvalue()).decode())
        payload = json.dumps({"images_b64": b64s}).encode()
        status, body = _post(base + "/ocr_batch", payload,
                             "application/json")
        assert status == 200, body
        assert body["lines"] == 5 and body["wall_ms"] > 0
        texts = [r["text"] for r in body["results"]]
        # order check against the single-image endpoint (same model, same
        # decode path — exact agreement expected even where the 200-step
        # fixture model misreads)
        singles = []
        for b64 in b64s:
            payload1 = json.dumps({"image_b64": b64}).encode()
            s1, one = _post(base + "/ocr", payload1, "application/json")
            assert s1 == 200
            singles.append(one["text"])
        assert texts == singles
        # and the model still gets most of them right
        assert sum(t == ref for t, (_, ref) in zip(texts, pairs)) >= 3
        for r in body["results"]:
            assert r["confidence"] is None or 0 < r["confidence"] <= 1.0

    def test_ocr_batch_empty_400(self, server):
        base, _ = server
        payload = json.dumps({"images_b64": []}).encode()
        status, body = _post(base + "/ocr_batch", payload,
                             "application/json")
        assert status == 400 and "error" in body

    def test_ocr_batch_bad_payload_400(self, server):
        base, _ = server
        status, body = _post(base + "/ocr_batch", b"{broken",
                             "application/json")
        assert status == 400 and "error" in body
