"""Minimal stdlib client for the embedding server (serve.py).

The reference ships no serving stack; this pairs with the TPU-native one.
Uses only ``http.client`` (no requests dependency) and defaults to the
measured-fastest wire choices: ``b64_f32`` binary replies everywhere
(2.6x throughput / 3.5x lower tail vs float JSON at saturation —
docs/experiments.md round 4) and the raw-pixel request body for
target-size tiles (zero JSON/base64/codec host work on the server,
round 5).

    from spatial_clip_tpu.client import EmbeddingClient

    c = EmbeddingClient("localhost", 8764)
    emb = c.embed_texts(["a cat", "a dog"])          # (2, D) float32
    emb = c.embed_images([png_bytes, jpeg_bytes])    # encoded images
    emb = c.embed_tiles(batch_u8)                    # (N,H,W,3) uint8 raw
"""
from __future__ import annotations

import base64
import json
from http.client import HTTPConnection
from typing import Optional, Sequence

import numpy as np


class EmbeddingClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 8764,
                 timeout: float = 600.0):
        self.host = host
        self.port = port
        self.timeout = timeout
        self._conn: Optional[HTTPConnection] = None

    # ------------------------------------------------------------- plumbing
    def _connection(self) -> HTTPConnection:
        if self._conn is None:
            self._conn = HTTPConnection(self.host, self.port,
                                        timeout=self.timeout)
        return self._conn

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _post(self, path: str, body, headers: Optional[dict] = None) -> dict:
        conn = self._connection()
        try:
            conn.request("POST", path, body, headers or {})
            resp = conn.getresponse()
            payload = resp.read()
        except TimeoutError:
            raise  # a slow server is not a stale connection
        except (ConnectionError, OSError):
            # stale keep-alive connection (server closed it, or the socket
            # died — RemoteDisconnected/BrokenPipe/EBADF): reconnect once
            self.close()
            conn = self._connection()
            conn.request("POST", path, body, headers or {})
            resp = conn.getresponse()
            payload = resp.read()
        data = json.loads(payload)
        if resp.status != 200:
            raise RuntimeError(
                f"{path} -> HTTP {resp.status}: {data.get('error', data)}")
        return data

    def _get(self, path: str) -> dict:
        conn = self._connection()
        conn.request("GET", path)
        resp = conn.getresponse()
        data = json.loads(resp.read())
        if resp.status != 200:
            raise RuntimeError(
                f"{path} -> HTTP {resp.status}: {data.get('error', data)}")
        return data

    @staticmethod
    def _decode_reply(data: dict) -> np.ndarray:
        if "embeddings_b64" in data:  # binary reply (b64_f32)
            return np.frombuffer(
                base64.b64decode(data["embeddings_b64"]),
                data.get("dtype", "<f4")).reshape(data["shape"]).copy()
        return np.asarray(data["embeddings"], np.float32)

    # ------------------------------------------------------------- surface
    def embed_texts(self, texts: Sequence[str],
                    binary: bool = True) -> np.ndarray:
        """(N, D) float32 unit-norm text embeddings."""
        req = {"texts": list(texts)}
        if binary:
            req["encoding"] = "b64_f32"
        return self._decode_reply(self._post("/embed_text", json.dumps(req)))

    def embed_images(self, images: Sequence[bytes],
                     binary: bool = True) -> np.ndarray:
        """(N, D) embeddings from ENCODED images (png/jpeg bytes)."""
        req = {"images_b64":
               [base64.b64encode(b).decode() for b in images]}
        if binary:
            req["encoding"] = "b64_f32"
        return self._decode_reply(self._post("/embed_image", json.dumps(req)))

    def embed_tiles(self, tiles: np.ndarray) -> np.ndarray:
        """(N, D) embeddings from DECODED (N, H, W, 3) uint8 tiles at the
        model's input size — the raw binary path: no JSON/base64/codec
        work on either side."""
        tiles = np.ascontiguousarray(tiles, np.uint8)
        if tiles.ndim != 4 or tiles.shape[-1] != 3:
            raise ValueError(
                f"expected (N, H, W, 3) uint8 tiles, got {tiles.shape}")
        return self._decode_reply(self._post(
            "/embed_image_raw", tiles.tobytes(),
            {"Content-Type": "application/octet-stream"}))

    def healthz(self) -> dict:
        return self._get("/healthz")

    def metrics(self) -> dict:
        return self._get("/metrics")

    def reset_metrics(self) -> dict:
        return self._post("/metrics/reset", "{}")
