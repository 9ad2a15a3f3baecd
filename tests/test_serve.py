"""Embedding server: micro-batching correctness + HTTP surface."""
import base64
import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from spatial_clip_tpu.serve import EmbeddingService, make_handler


@pytest.fixture(scope="module")
def service():
    return EmbeddingService(
        "ViT-Test", batch_size=4, precision="fp32", platform="cpu"
    )


def _png_b64(rng, size):
    from PIL import Image

    img = Image.fromarray(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_embed_texts_batching_matches_direct(service):
    texts = [f"gene sentence {i}" for i in range(7)]  # crosses one pad batch
    emb = service.embed_texts(texts)
    assert emb.shape == (7, service.bundle.cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)
    # pad-and-slice must equal a direct single-item encode
    one = service.embed_texts(texts[:1])
    np.testing.assert_allclose(emb[0], one[0], atol=1e-5)


def test_embed_images(service):
    rng = np.random.default_rng(0)
    size = service.bundle.cfg.vision_cfg.image_size
    emb = service.embed_images_b64([_png_b64(rng, size) for _ in range(3)])
    assert emb.shape == (3, service.bundle.cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)


def test_int8_serving_path():
    """mlp_impl='int8' must serve normalized embeddings too (the 1.1x
    ViT-L path; 2x weight compression everywhere)."""
    svc = EmbeddingService(
        "ViT-Test", batch_size=2, precision="fp32", mlp_impl="int8",
        platform="cpu",
    )
    emb = svc.embed_texts(["a", "b", "c"])
    assert emb.shape == (3, svc.bundle.cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)


def test_http_surface(service):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok" and health["embed_dim"] == 32

        body = json.dumps({"texts": ["hello", "world"]})
        conn.request("POST", "/embed_text", body)
        out = json.loads(conn.getresponse().read())
        emb = np.asarray(out["embeddings"])
        assert emb.shape == (2, 32)

        rng = np.random.default_rng(1)
        size = service.bundle.cfg.vision_cfg.image_size
        body = json.dumps({"images_b64": [_png_b64(rng, size)]})
        conn.request("POST", "/embed_image", body)
        out = json.loads(conn.getresponse().read())
        assert np.asarray(out["embeddings"]).shape == (1, 32)

        conn.request("POST", "/nope", "{}")
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 404

        # /metrics/reset clears the rolling window (warmup-compile
        # exclusion) but keeps totals
        conn.request("GET", "/metrics")
        before = json.loads(conn.getresponse().read())
        assert before["latency_ms_p50"] is not None
        conn.request("POST", "/metrics/reset", "{}")
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 200
        conn.request("GET", "/metrics")
        after = json.loads(conn.getresponse().read())
        assert after["latency_ms_p50"] is None
        assert after["requests_total"] == before["requests_total"]

        conn.request("POST", "/embed_text", '{"bad": 1}')
        resp = conn.getresponse()
        assert resp.status == 400 and b"error" in resp.read()
    finally:
        server.shutdown()


def _start_server(service, **kw):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(service, **kw))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def test_request_size_limits(service):
    server, port = _start_server(service, max_body_bytes=256, max_items=3)
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        # oversized body -> 413
        conn.request("POST", "/embed_text",
                     json.dumps({"texts": ["x" * 500]}))
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 413
        # too many items -> 413
        conn.request("POST", "/embed_text",
                     json.dumps({"texts": ["a", "b", "c", "d"]}))
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 413
        # invalid JSON -> 400
        conn.request("POST", "/embed_text", "{nope")
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 400
        # empty list -> 400
        conn.request("POST", "/embed_text", json.dumps({"texts": []}))
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 400
    finally:
        server.shutdown()


def test_concurrent_load_and_metrics(service):
    """N threads x M requests: all succeed, embeddings are deterministic,
    and /metrics reflects the traffic (VERDICT #7 hardening contract)."""
    server, port = _start_server(service)
    expected = service.embed_texts(["stress test sentence"])[0]
    results, errors = [], []

    def worker(n_requests=4):
        try:
            conn = HTTPConnection("127.0.0.1", port, timeout=120)
            for _ in range(n_requests):
                conn.request("POST", "/embed_text",
                             json.dumps({"texts": ["stress test sentence"]}))
                resp = conn.getresponse()
                assert resp.status == 200, resp.status
                emb = np.asarray(json.loads(resp.read())["embeddings"][0])
                results.append(emb)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert len(results) == 32
        for emb in results:
            np.testing.assert_allclose(emb, expected, atol=1e-5)
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        assert m["requests_total"] >= 32
        assert m["items_total"] >= 32
        assert m["latency_ms_p50"] is not None
        assert m["latency_ms_p99"] >= m["latency_ms_p50"]
        assert 0 < m["batch_fill_mean"] <= 1.0
    finally:
        server.shutdown()


def test_saturation_returns_503(service):
    """When max_inflight slots are taken, new requests get 503 with a
    retry hint (backpressure instead of unbounded queueing)."""
    # exhaust the admission semaphore directly
    taken = 0
    while service.acquire_slot():
        taken += 1
    server, port = _start_server(service)
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/embed_text", json.dumps({"texts": ["x"]}))
        resp = conn.getresponse()
        assert resp.status == 503
        assert b"retry" in resp.read()
    finally:
        server.shutdown()
        for _ in range(taken):
            service.release_slot()
    # after release, requests pass again
    server, port = _start_server(service)
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/embed_text", json.dumps({"texts": ["x"]}))
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 200
    finally:
        server.shutdown()


def test_binary_embedding_encoding(service):
    """encoding='b64_f32' returns base64 raw float32 (~5x smaller replies;
    decodes to the same embeddings as the JSON-list path)."""
    server, port = _start_server(service)
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/embed_text",
                     json.dumps({"texts": ["a", "b"], "encoding": "b64_f32"}))
        r = json.loads(conn.getresponse().read())
        import base64 as b64

        emb = np.frombuffer(b64.b64decode(r["embeddings_b64"]),
                            dtype=r["dtype"]).reshape(r["shape"])
        assert emb.shape == (2, service.bundle.cfg.embed_dim)
        direct = service.embed_texts(["a", "b"])
        np.testing.assert_allclose(emb, direct, atol=1e-6)
    finally:
        server.shutdown()


def test_params_are_device_resident(service):
    """Regression guard for the round-4 serving bug: bundle params are
    host-side numpy by convention, and passing numpy into the jitted
    encoders re-uploads the whole tree per request (measured 14 s/call
    through the remote tunnel). The service must pin them on device once."""
    import jax

    leaves = jax.tree.leaves(service._params)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


def test_warmup_compiles_both_encoders(service):
    service.warmup()  # must not raise; endpoints still serve afterwards
    emb = service.embed_texts(["post-warm"])
    assert emb.shape == (1, service.bundle.cfg.embed_dim)


def test_non_object_json_body_is_400(service):
    server, port = _start_server(service)
    try:
        conn = HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/embed_text", json.dumps([1, 2, 3]))
        resp = conn.getresponse()
        assert resp.status == 400 and b"JSON object" in resp.read()
    finally:
        server.shutdown()


def test_embed_images_raw_matches_b64_path(service):
    """The binary request path must produce the same embeddings as the
    PNG-b64 path for identical pixels, and reject malformed bodies."""
    rng = np.random.default_rng(3)
    size = service.bundle.cfg.vision_cfg.image_size
    tiles = rng.integers(0, 255, (3, size, size, 3), dtype=np.uint8)

    def b64_of(t):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(t).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    via_b64 = service.embed_images_b64([b64_of(t) for t in tiles])
    via_raw = service.embed_images_raw(tiles.tobytes())
    np.testing.assert_allclose(via_raw, via_b64, atol=1e-5)

    with pytest.raises(ValueError, match="raw image body"):
        service.embed_images_raw(b"\x00" * (size * size * 3 - 1))


def test_embed_image_raw_http_endpoint(service):
    server, port = _start_server(service)
    try:
        rng = np.random.default_rng(4)
        size = service.bundle.cfg.vision_cfg.image_size
        tiles = rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8)
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/embed_image_raw", tiles.tobytes(),
                     {"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 200
        r = json.loads(resp.read())
        emb = np.frombuffer(base64.b64decode(r["embeddings_b64"]),
                            "<f4").reshape(r["shape"])
        direct = service.embed_images_raw(tiles.tobytes())
        np.testing.assert_allclose(emb, direct, atol=1e-5)

        # ?encoding=json gives float lists
        conn.request("POST", "/embed_image_raw?encoding=json",
                     tiles.tobytes())
        r2 = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(np.asarray(r2["embeddings"]), direct,
                                   atol=1e-4)

        # malformed length -> 400
        conn.request("POST", "/embed_image_raw", b"abc")
        _r = conn.getresponse()
        _r.read()  # drain: keep-alive connections are reused
        assert _r.status == 400
    finally:
        server.shutdown()


def test_batch_assembly_decode_into_parity(service):
    """Preallocated-batch decode (decode_rgb_into) must equal the per-tile
    decode + stack path, including the mixed case where one tile is
    off-size (falls back to decode + resize in place)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    size = service.bundle.cfg.vision_cfg.image_size

    def b64_of(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    exact = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    big = rng.integers(0, 255, (size * 2, size * 2, 3), dtype=np.uint8)
    items = [b64_of(exact), b64_of(big), b64_of(exact)]

    emb = service.embed_images_b64(items)
    # oracle: per-tile preprocess + stack (the pre-optimization path)
    tiles = []
    for b in items:
        img = Image.open(io.BytesIO(base64.b64decode(b))).convert("RGB")
        tiles.append(service.preprocess(img))
    want = service._batched(service._enc_img, np.stack(tiles))
    np.testing.assert_allclose(emb, want, atol=1e-5)


def test_raw_endpoint_query_parsing(service):
    """?encoding must be parsed, not substring-matched: unrelated params
    keep the binary default, and only encoding=json opts into floats."""
    server, port = _start_server(service)
    try:
        size = service.bundle.cfg.vision_cfg.image_size
        tiles = np.zeros((1, size, size, 3), np.uint8)
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/embed_image_raw?client_encoding=json2",
                     tiles.tobytes())
        r = json.loads(conn.getresponse().read())
        assert "embeddings_b64" in r  # still binary

        conn.request("POST", "/embed_image_raw?encoding=json",
                     tiles.tobytes())
        r2 = json.loads(conn.getresponse().read())
        assert "embeddings" in r2
    finally:
        server.shutdown()


def test_iterable_npy_keeps_pil_contract(tmp_path, rng):
    """.npy tiles also reach user preprocess callables as PIL Images."""
    import io as _io
    import tarfile

    from PIL import Image

    tile = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    shard = tmp_path / "s-000000.tar"
    buf = _io.BytesIO()
    np.save(buf, tile)
    with tarfile.open(shard, "w") as tf:
        for name, payload in (("a.npy", buf.getvalue()), ("a.txt", b"hi")):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))

    from spatial_clip_tpu.data.datasets.iterable_shards import (
        IterableTarDataset,
    )

    seen = []

    def user_fn(img):
        seen.append(type(img))
        return np.asarray(img.convert("RGB"))

    samples = list(IterableTarDataset([str(shard)], preprocess_fn=user_fn))
    assert len(samples) == 1
    assert all(issubclass(t, Image.Image) for t in seen)


def test_embedding_client_full_surface(service):
    """EmbeddingClient drives every endpoint against a live server and all
    three embedding routes agree on identical pixels."""
    from spatial_clip_tpu.client import EmbeddingClient

    server, port = _start_server(service)
    try:
        rng = np.random.default_rng(6)
        size = service.bundle.cfg.vision_cfg.image_size
        tiles = rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8)

        def png_of(t):
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(t).save(buf, format="PNG")
            return buf.getvalue()

        with EmbeddingClient("127.0.0.1", port) as c:
            assert c.healthz()["status"] == "ok"

            txt = c.embed_texts(["a spot", "another spot"])
            assert txt.shape == (2, service.bundle.cfg.embed_dim)
            txt_json = c.embed_texts(["a spot", "another spot"],
                                     binary=False)
            np.testing.assert_allclose(txt, txt_json, atol=1e-4)

            via_png = c.embed_images([png_of(t) for t in tiles])
            via_raw = c.embed_tiles(tiles)
            np.testing.assert_allclose(via_raw, via_png, atol=1e-5)

            with pytest.raises(ValueError, match="uint8 tiles"):
                c.embed_tiles(tiles[0])  # 3-D input

            c.reset_metrics()
            m = c.metrics()
            assert m["requests_total"] >= 4
    finally:
        server.shutdown()


def test_client_reconnects_after_stale_connection(service):
    """A dead keep-alive socket triggers one transparent reconnect."""
    from spatial_clip_tpu.client import EmbeddingClient

    server, port = _start_server(service)
    try:
        c = EmbeddingClient("127.0.0.1", port)
        first = c.embed_texts(["hello"])
        # kill the underlying socket behind the client's back
        c._conn.sock.close()
        second = c.embed_texts(["hello"])  # must not raise
        np.testing.assert_allclose(first, second, atol=1e-6)
        c.close()
    finally:
        server.shutdown()
