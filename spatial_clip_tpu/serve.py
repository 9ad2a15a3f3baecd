"""Batched embedding server (single-chip serving surface).

The reference ships no serving stack; this is the TPU-native one. One
process owns the chip (JAX holds the device exclusively — run exactly one
server per chip; scale horizontally with one process per chip behind an
external load balancer). Requests are micro-batched into fixed-shape
jitted encoder calls (XLA compiles once per shape — padding to a fixed
batch keeps every request on the cached executable).

Scope honesty: the HTTP front is stdlib ``ThreadingHTTPServer`` — fine for
single-tenant/internal serving (the chip, not the socket layer, is the
bottleneck: 14.3k tiles/sec bf16 at ViT-B/32 vs trivial JSON overhead),
but it does no TLS, auth, or connection pooling; front it with a real
ingress for anything public.

    python -m spatial_clip_tpu.serve --model ViT-B-32 --port 8764
    curl -X POST localhost:8764/embed_text -d '{"texts": ["a cat"]}'
    curl -X POST localhost:8764/embed_image -d '{"images_b64": ["<png>"]}'
    curl localhost:8764/healthz
    curl localhost:8764/metrics

Endpoints:
- ``POST /embed_text``  {"texts": [str, ...]} -> {"embeddings": [[...], ...]}
- ``POST /embed_image`` {"images_b64": [base64-png, ...]} -> embeddings
- ``POST /embed_image_raw`` body = n tightly-packed (size, size, 3) uint8
  tiles (no JSON/base64/codec host work); replies default to the b64_f32
  binary encoding — append ``?encoding=json`` for float lists
- ``GET  /healthz``     liveness + model metadata
- ``GET  /metrics``     request counts, QPS, batch fill, p50/p99 latency
- ``POST /metrics/reset`` clear the rolling latency/QPS window (totals kept)

Operational limits (all configurable): request bodies over
``--max-body-bytes`` are rejected 413; more than ``--max-items`` items per
request is 413; when ``--max-inflight`` requests are already queued on the
chip lock, new work is rejected 503 (backpressure — retry with jitter).

Serving-path performance on one v5e chip: 14.3k tiles/sec bf16 at
ViT-B/32, int8 MLP path 1.1x at ViT-L (scripts/bench_inference.py,
docs/experiments.md).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import os
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


class ServerMetrics:
    """Thread-safe rolling request metrics for the /metrics endpoint."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._lat = deque(maxlen=window)  # (t_done, latency_s)
        # completion timestamps for qps_1m: sized so a full 60 s at high
        # rate fits (the latency reservoir's maxlen would cap qps at
        # window/60 req/s)
        self._done_ts = deque(maxlen=65536)
        self._fill = deque(maxlen=window)  # batch fill ratio per encode
        self.requests_total = 0
        self.items_total = 0
        self.errors_total = 0
        self.rejected_total = 0
        self._t0 = time.monotonic()       # process boot — backs uptime_s
        self._window_t0 = self._t0        # last reset — backs qps window

    def observe(self, latency_s: float, n_items: int):
        with self._lock:
            self.requests_total += 1
            self.items_total += n_items
            now = time.monotonic()
            self._lat.append((now, latency_s))
            self._done_ts.append(now)

    def observe_fill(self, fill: float):
        with self._lock:
            self._fill.append(fill)

    def error(self):
        with self._lock:
            self.errors_total += 1

    def rejected(self):
        with self._lock:
            self.rejected_total += 1

    def reset_window(self):
        """Clear the rolling latency/fill/QPS windows (totals are kept).

        Call after warmup so boot-time compile requests don't sit in the
        percentile window — an operator reading /metrics would otherwise see
        multi-second p99 'tails' that are really one-off XLA compiles."""
        with self._lock:
            self._lat.clear()
            self._done_ts.clear()
            self._fill.clear()
            # window start moves; _t0 (process boot) stays so uptime_s
            # keeps reporting real uptime across resets
            self._window_t0 = time.monotonic()

    def snapshot(self) -> dict:
        with self._lock:
            now = time.monotonic()
            lats = sorted(l for _, l in self._lat)
            recent = [t for t in self._done_ts if now - t <= 60.0]
            qps = len(recent) / min(60.0, max(now - self._window_t0, 1e-9))
            pct = lambda p: (  # noqa: E731
                round(1000 * lats[min(len(lats) - 1, int(p * len(lats)))], 2)
                if lats else None)
            return {
                "requests_total": self.requests_total,
                "items_total": self.items_total,
                "errors_total": self.errors_total,
                "rejected_total": self.rejected_total,
                "qps_1m": round(qps, 3),
                "latency_ms_p50": pct(0.50),
                "latency_ms_p99": pct(0.99),
                "batch_fill_mean": (
                    round(float(np.mean(self._fill)), 4) if self._fill else None),
                "uptime_s": round(now - self._t0, 1),
            }


class EmbeddingService:
    """Jitted fixed-batch encoders with pad-and-slice micro-batching."""

    def __init__(
        self,
        model_name: str = "ViT-B-32",
        pretrained: Optional[str] = None,
        batch_size: int = 64,
        precision: str = "bf16",
        mlp_impl: str = "dense",
        platform: Optional[str] = None,
        max_inflight: int = 32,
    ):
        import jax

        if platform:
            jax.config.update("jax_platforms", platform)
        import jax.numpy as jnp

        from spatial_clip_tpu import create_model, get_tokenizer
        from spatial_clip_tpu.models.transforms import (
            image_transform_v2,
            normalize_batch,
        )

        self.batch_size = batch_size
        self.bundle = create_model(
            model_name, pretrained=pretrained, precision=precision,
            seed=0, mlp_impl=mlp_impl,
        )
        self.tokenizer = get_tokenizer(model_name)
        # honors the bundle's full preprocess contract incl. resize_mode
        # (e.g. SigLIP tags pin 'squash') and fill_color
        self.preprocess = image_transform_v2(
            self.bundle.preprocess_cfg, is_train=False)
        model, params = self.bundle.model, self.bundle.params
        dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

        def enc_img(p, images_u8):
            x = normalize_batch(
                images_u8, mean=self.bundle.preprocess_cfg.mean,
                std=self.bundle.preprocess_cfg.std, dtype=dtype,
            )
            return model.apply({"params": p}, x, True,
                               method=type(model).encode_image)

        def enc_txt(p, ids):
            return model.apply({"params": p}, ids, True,
                               method=type(model).encode_text)

        self._enc_img = jax.jit(enc_img)
        self._enc_txt = jax.jit(enc_txt)
        # Pin params on the device ONCE: the bundle keeps them as host-side
        # numpy (the trainer's donation-safe convention), and passing numpy
        # into a jitted call re-uploads the whole tree per request — ~14 s
        # per encode through the remote tunnel at ViT-B scale (measured,
        # reports/serve_serialization_ab.json) vs ~5 ms once resident.
        self._params = jax.device_put(params)
        # one encoder call at a time — the chip is the serialized resource;
        # the semaphore bounds the queue depth behind it (backpressure)
        self._lock = threading.Lock()
        self._inflight = threading.BoundedSemaphore(max_inflight)
        n_cores = os.cpu_count() or 1
        self._decode_pool = (
            ThreadPoolExecutor(max_workers=min(n_cores, 16),
                               thread_name_prefix="img-decode")
            if n_cores > 1 else None)
        self.metrics = ServerMetrics()

    def _batched(self, encode, arr: np.ndarray) -> np.ndarray:
        """Pad to the fixed batch (one cached executable) and slice back."""
        n = len(arr)
        out = []
        with self._lock:
            for lo in range(0, n, self.batch_size):
                chunk = arr[lo: lo + self.batch_size]
                real = len(chunk)
                pad = self.batch_size - real
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad, axis=0)]
                    )
                emb = np.asarray(encode(self._params, chunk), dtype=np.float32)
                out.append(emb[:real])
                self.metrics.observe_fill(real / self.batch_size)
        return np.concatenate(out, axis=0)

    def acquire_slot(self) -> bool:
        """Non-blocking admission; False = saturated (caller replies 503)."""
        return self._inflight.acquire(blocking=False)

    def release_slot(self):
        self._inflight.release()

    def warmup(self):
        """Compile both encoders before serving traffic (first compile of
        each shape is seconds-to-minutes; run it at boot, not on the first
        request)."""
        size = int(self.bundle.cfg.vision_cfg.image_size)
        self.embed_texts(["warmup"])
        tiles = np.zeros((1, size, size, 3), np.uint8)
        self._batched(self._enc_img, tiles)
        log.info("encoders warmed (text + image)")

    def embed_texts(self, texts) -> np.ndarray:
        ids = np.asarray(self.tokenizer(list(texts)), dtype=np.int32)
        return self._batched(self._enc_txt, ids)

    def embed_images_b64(self, images_b64) -> np.ndarray:
        from PIL import Image

        from spatial_clip_tpu.data.native_decode import (
            decode_rgb,
            decode_rgb_into,
        )

        n = len(images_b64)
        size = int(self.bundle.cfg.vision_cfg.image_size)
        # fast assembly: decode target-size tiles straight into one
        # preallocated batch (no per-tile array + no np.stack pass —
        # ~0.23 ms/tile, docs/experiments.md round-5 attribution). Gated on
        # ndarray_fast_size (like the shard loaders): the transform must
        # return target-size RGB8 input UNTOUCHED for in-place decode to
        # equal preprocess(tile); train mode / non-RGB modes gate it off.
        if getattr(self.preprocess, "ndarray_fast_size", None) == (size,
                                                                   size):
            tiles = np.empty((n, size, size, 3), np.uint8)

            def decode(item):
                i, b = item
                raw = base64.b64decode(b)
                if decode_rgb_into(raw, tiles[i]):
                    return
                arr = decode_rgb(raw)  # native, any size
                img = arr if arr is not None else Image.open(io.BytesIO(raw))
                tiles[i] = self.preprocess(img)

            items = list(enumerate(images_b64))
            # decode releases the GIL (ctypes / PIL) so a thread pool
            # scales with host cores
            if n > 4 and self._decode_pool is not None:
                list(self._decode_pool.map(decode, items))
            else:
                for item in items:
                    decode(item)
        else:  # custom transform: per-tile PIL contract, stack at the end
            def decode_one(b):
                raw = base64.b64decode(b)
                return self.preprocess(Image.open(io.BytesIO(raw)))

            if n > 4 and self._decode_pool is not None:
                tiles = np.stack(list(self._decode_pool.map(decode_one,
                                                            images_b64)))
            else:
                tiles = np.stack([decode_one(b) for b in images_b64])
        return self._batched(self._enc_img, tiles)

    def embed_images_raw(self, body: bytes) -> np.ndarray:
        """Raw-pixel request path: ``body`` is n tightly-packed
        (size, size, 3) uint8 tiles. Skips JSON + base64 + codec work
        entirely (~56 ms per 64-tile request on the measured serving
        host) — the binary analogue of the ``b64_f32`` reply encoding."""
        size = int(self.bundle.cfg.vision_cfg.image_size)
        tile_bytes = size * size * 3
        if len(body) == 0 or len(body) % tile_bytes != 0:
            raise ValueError(
                f"raw image body must be n*{tile_bytes} bytes "
                f"(n tiles of {size}x{size}x3 uint8); got {len(body)}")
        tiles = np.frombuffer(body, np.uint8).reshape(-1, size, size, 3)
        return self._batched(self._enc_img, tiles)

    def metadata(self) -> dict:
        return {
            "model": self.bundle.model_name,
            "embed_dim": int(self.bundle.cfg.embed_dim),
            "image_size": int(self.bundle.cfg.vision_cfg.image_size),
            "batch_size": self.batch_size,
        }


def make_handler(service: EmbeddingService, max_body_bytes: int = 32 * 2 ** 20,
                 max_items: int = 1024):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every reply carries Content-Length, so
        # persistent connections are safe and clients skip the per-request
        # TCP handshake (the stdlib default is close-per-request HTTP/1.0)
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to logging, not stderr
            log.debug(fmt, *args)

        def _reply(self, code: int, payload: dict, close: bool = False):
            """``close=True`` is REQUIRED for any reply sent before the
            request body was fully read (bad Content-Length, 413 size):
            under HTTP/1.1 keep-alive the undrained bytes would otherwise
            corrupt the next request on the reused connection."""
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if close:
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", **service.metadata()})
            elif self.path == "/metrics":
                self._reply(200, service.metrics.snapshot())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            t0 = time.monotonic()
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError:
                return self._reply(400, {"error": "bad Content-Length"},
                                   close=True)
            if n < 0:
                return self._reply(400, {"error": "bad Content-Length"},
                                   close=True)
            if n > max_body_bytes:
                service.metrics.rejected()
                return self._reply(413, {
                    "error": f"request body {n} bytes exceeds limit "
                             f"{max_body_bytes}"}, close=True)
            path, _, query = self.path.partition("?")
            if path == "/embed_image_raw":
                # binary request path: n tightly-packed (size, size, 3)
                # uint8 tiles, no JSON/base64/codec host work (the binary
                # analogue of b64_f32 replies — which are also the default
                # reply encoding here; append ?encoding=json for floats)
                body = self.rfile.read(n)
                size = int(service.bundle.cfg.vision_cfg.image_size)
                n_tiles, rem = divmod(len(body), size * size * 3)
                if n_tiles == 0 or rem != 0:
                    service.metrics.error()
                    return self._reply(400, {
                        "error": f"raw body must be n*{size * size * 3} "
                                 f"bytes ({size}x{size}x3 uint8 tiles); "
                                 f"got {len(body)}"})
                if n_tiles > max_items:
                    service.metrics.rejected()
                    return self._reply(413, {
                        "error": f"{n_tiles} tiles exceeds per-request "
                                 f"limit {max_items}; split the request"})
                if not service.acquire_slot():
                    service.metrics.rejected()
                    return self._reply(503, {
                        "error": "server saturated; retry with backoff"})
                try:
                    from urllib.parse import parse_qs

                    enc = parse_qs(query).get("encoding", ["b64_f32"])[0]
                    emb = service.embed_images_raw(body)
                    if enc == "json":
                        self._reply(200, {"embeddings": emb.tolist()})
                    else:
                        self._reply(200, {
                            "embeddings_b64": base64.b64encode(
                                np.ascontiguousarray(
                                    emb, dtype="<f4").tobytes()).decode(),
                            "shape": list(emb.shape),
                            "dtype": "<f4",
                        })
                    service.metrics.observe(time.monotonic() - t0, n_tiles)
                except (BrokenPipeError, ConnectionResetError):
                    log.debug("client disconnected mid-response")
                except Exception as e:  # noqa: BLE001
                    service.metrics.error()
                    try:
                        self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    except (BrokenPipeError, ConnectionResetError):
                        log.debug("client disconnected before error reply")
                finally:
                    service.release_slot()
                return
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except (json.JSONDecodeError, UnicodeDecodeError) as e:
                service.metrics.error()
                return self._reply(400, {"error": f"invalid JSON: {e}"})
            if not isinstance(req, dict):
                service.metrics.error()
                return self._reply(400, {"error": "request body must be a JSON object"})
            if self.path == "/metrics/reset":
                service.metrics.reset_window()
                return self._reply(200, {"status": "metrics window reset"})
            if self.path == "/embed_text":
                items = req.get("texts")
            elif self.path == "/embed_image":
                items = req.get("images_b64")
            else:
                return self._reply(404, {"error": f"unknown path {self.path}"})
            if not isinstance(items, list) or not items:
                service.metrics.error()
                return self._reply(400, {
                    "error": "expected a non-empty list under 'texts' / "
                             "'images_b64'"})
            if len(items) > max_items:
                service.metrics.rejected()
                return self._reply(413, {
                    "error": f"{len(items)} items exceeds per-request limit "
                             f"{max_items}; split the request"})
            if not service.acquire_slot():
                service.metrics.rejected()
                return self._reply(503, {
                    "error": "server saturated; retry with backoff"})
            try:
                if self.path == "/embed_text":
                    emb = service.embed_texts(items)
                else:
                    emb = service.embed_images_b64(items)
                if req.get("encoding") == "b64_f32":
                    # binary response: ~5x smaller than a float JSON list
                    # and skips per-float stringification (the dominant
                    # per-request CPU cost at batch 64+ — round-4 serving
                    # capture); decode with np.frombuffer(
                    #   base64.b64decode(r["embeddings_b64"]), "<f4"
                    # ).reshape(r["shape"])
                    self._reply(200, {
                        "embeddings_b64": base64.b64encode(
                            np.ascontiguousarray(
                                emb, dtype="<f4").tobytes()).decode(),
                        "shape": list(emb.shape),
                        "dtype": "<f4",
                    })
                else:
                    self._reply(200, {"embeddings": emb.tolist()})
                # observed AFTER the reply is written: percentiles include
                # serialization + socket write (the dominant per-request CPU
                # cost for float-JSON clients at batch 64+ — round-4 capture)
                service.metrics.observe(time.monotonic() - t0, len(items))
            except (BrokenPipeError, ConnectionResetError):
                # client went away mid-response: not a server error, and the
                # socket is unusable — do NOT attempt a second reply
                log.debug("client disconnected mid-response")
            except Exception as e:  # noqa: BLE001 — error surface per request
                service.metrics.error()
                try:
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                except (BrokenPipeError, ConnectionResetError):
                    log.debug("client disconnected before error reply")
            finally:
                service.release_slot()

    return Handler


def serve(service: EmbeddingService, host: str = "127.0.0.1", port: int = 8764,
          max_body_bytes: int = 32 * 2 ** 20, max_items: int = 1024):
    server = ThreadingHTTPServer(
        (host, port), make_handler(service, max_body_bytes, max_items))
    log.info("serving %s on %s:%d", service.metadata(), host, port)
    server.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--mlp-impl", default="dense",
                    help="dense | int8 (1.1x at ViT-L, 2x weight compression)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8764)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--max-body-bytes", type=int, default=32 * 2 ** 20)
    ap.add_argument("--max-items", type=int, default=1024)
    ap.add_argument("--max-inflight", type=int, default=32)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the boot-time encoder compile")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    service = EmbeddingService(
        args.model, pretrained=args.pretrained, batch_size=args.batch_size,
        precision=args.precision, mlp_impl=args.mlp_impl,
        platform=args.platform, max_inflight=args.max_inflight,
    )
    if not args.no_warmup:
        service.warmup()
        service.metrics.reset_window()
    serve(service, args.host, args.port,
          max_body_bytes=args.max_body_bytes, max_items=args.max_items)


if __name__ == "__main__":
    main()
