"""On-chip serving capture: end-to-end HTTP latency under concurrency.

Starts the embedding server in-process (one chip owner), drives it with N
client threads posting text and image batches, and reports the /metrics
snapshot (QPS, batch fill, p50/p99) plus client-side percentiles.

    python scripts/bench_serve.py --threads 8 --requests 24 --out reports/bench_serve.json
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
from http.client import HTTPConnection
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24, help="per thread")
    ap.add_argument("--texts-per-request", type=int, default=64)
    ap.add_argument("--image-requests", type=int, default=8)
    ap.add_argument("--images-per-request", type=int, default=64)
    ap.add_argument("--encoding", default=None, choices=[None, "b64_f32"],
                    help="response encoding (b64_f32 = binary embeddings)")
    ap.add_argument("--out", default="reports/bench_serve.json")
    args = ap.parse_args()

    from http.server import ThreadingHTTPServer

    from spatial_clip_tpu.serve import EmbeddingService, make_handler

    svc = EmbeddingService(args.model, batch_size=args.batch_size,
                           precision="bf16")
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    texts = [f"tile expressing gene set {i}" for i in range(args.texts_per_request)]
    req = {"texts": texts}
    if args.encoding:
        req["encoding"] = args.encoding
    body_text = json.dumps(req)

    # warm both encoders (first request compiles)
    conn = HTTPConnection("127.0.0.1", port, timeout=3000)
    t0 = time.time()
    conn.request("POST", "/embed_text", body_text)
    _r = conn.getresponse()
    _r.read()  # drain: keep-alive connections are reused
    assert _r.status == 200
    print(f"text warm/compile: {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    size = svc.bundle.cfg.vision_cfg.image_size
    from PIL import Image

    def png_b64():
        img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    imgs = [png_b64() for _ in range(args.images_per_request)]
    body_img = json.dumps({"images_b64": imgs})
    t0 = time.time()
    conn.request("POST", "/embed_image", body_img)
    _r = conn.getresponse()
    _r.read()  # drain: keep-alive connections are reused
    assert _r.status == 200
    print(f"image warm/compile: {time.time() - t0:.1f}s", flush=True)
    # drop the warm/compile requests from the /metrics window so server-side
    # percentiles reflect steady-state traffic, not one-off XLA compiles
    conn.request("POST", "/metrics/reset", "{}")
    _r = conn.getresponse()
    _r.read()  # drain: keep-alive connections are reused
    assert _r.status == 200

    def stress(path: str, body, n_threads: int, n_requests: int):
        """n_threads clients, n_requests each; returns (lats, wall, errors).
        ``body`` is str (JSON) or bytes (raw tile payload)."""
        lats, errors = [], []

        def worker():
            try:
                c = HTTPConnection("127.0.0.1", port, timeout=600)
                for _ in range(n_requests):
                    t = time.perf_counter()
                    c.request("POST", path, body)
                    r = c.getresponse()
                    r.read()
                    assert r.status == 200, r.status
                    lats.append(time.perf_counter() - t)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

        t_start = time.time()
        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return lats, time.time() - t_start, errors

    lat, wall, errors = stress("/embed_text", body_text, args.threads,
                               args.requests)

    def get_metrics():
        conn.request("GET", "/metrics")
        return json.loads(conn.getresponse().read())

    pct = lambda v, p: round(1000 * float(np.percentile(v, p)), 1)  # noqa: E731
    text_metrics = get_metrics()

    # image path under the SAME concurrency (host-decode pool + chip lock
    # under contention), with its own clean metrics window
    conn.request("POST", "/metrics/reset", "{}")
    _r = conn.getresponse()
    _r.read()  # drain: keep-alive connections are reused
    assert _r.status == 200
    img_lat, img_wall, img_errors = stress(
        "/embed_image", body_img, args.threads, args.image_requests)
    img_metrics = get_metrics()

    # raw binary request path (no JSON/b64/codec host work)
    body_raw = rng.integers(0, 255,
                            (args.images_per_request, size, size, 3),
                            dtype=np.uint8).tobytes()
    conn.request("POST", "/metrics/reset", "{}")
    _r = conn.getresponse()
    _r.read()  # drain: keep-alive connections are reused
    assert _r.status == 200
    raw_lat, raw_wall, raw_errors = stress(
        "/embed_image_raw", body_raw, args.threads, args.image_requests)
    raw_metrics = get_metrics()
    # throughput counts only COMPLETED requests (len(lats)) — a worker that
    # errors out aborts its remaining requests, and counting those would
    # inflate the headline number
    n_img = len(img_lat)
    n_req = len(lat)
    out = {
        "model": args.model,
        "server_batch": args.batch_size,
        "encoding": args.encoding or "json",
        "text": {
            "threads": args.threads,
            "requests": n_req,
            "items_per_request": args.texts_per_request,
            "wall_s": round(wall, 2),
            "texts_per_sec": round(n_req * args.texts_per_request / wall, 1),
            "latency_ms_p50": pct(lat, 50),
            "latency_ms_p99": pct(lat, 99),
            "errors": errors,
            "server_metrics": text_metrics,
        },
        "image_concurrent": {
            "threads": args.threads,
            "requests": n_img,
            "items_per_request": args.images_per_request,
            "wall_s": round(img_wall, 2),
            "tiles_per_sec": round(
                n_img * args.images_per_request / img_wall, 1),
            "latency_ms_p50": pct(img_lat, 50),
            "latency_ms_p99": pct(img_lat, 99),
            "errors": img_errors,
            "server_metrics": img_metrics,
        },
        "image_raw": {
            "threads": args.threads,
            "requests": len(raw_lat),
            "items_per_request": args.images_per_request,
            "wall_s": round(raw_wall, 2),
            "tiles_per_sec": round(
                len(raw_lat) * args.images_per_request / raw_wall, 1),
            "latency_ms_p50": pct(raw_lat, 50),
            "latency_ms_p99": pct(raw_lat, 99),
            "errors": raw_errors,
            "server_metrics": raw_metrics,
        },
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    server.shutdown()


if __name__ == "__main__":
    main()
