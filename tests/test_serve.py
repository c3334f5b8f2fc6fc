"""Serving subsystem tests: micro-batcher semantics + HTTP round trips.

The reference has no serving path; these tests pin the north-star addition
(vfi_tpu/serve/): shape-bucketed coalescing, pad-to-max static shapes,
error propagation, and the wire protocol.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.serve import (InterpolationServer, MicroBatcher,
                           encode_pair_body, split_pair_body)


class RecordingEngine:
    """midpoints = average of the pair; records every launched batch shape."""

    def __init__(self, fail=False):
        self.batch_shapes = []
        self.fail = fail
        self.lock = threading.Lock()

    def midpoints(self, f0, f1):
        with self.lock:
            self.batch_shapes.append(f0.shape)
        if self.fail:
            raise RuntimeError("engine down")
        return (f0 + f1) / 2.0


def _frames(rng, n, h=8, w=8):
    return [rng.uniform(0, 1, (h, w, 3)).astype(np.float32) for _ in range(n)]


def test_batcher_coalesces_and_pads(rng):
    eng = RecordingEngine()
    mb = MicroBatcher(eng, max_batch=4, max_delay_ms=250.0)
    try:
        f = _frames(rng, 6)
        futs = [mb.submit(f[i], f[i + 3]) for i in range(3)]
        outs = [fu.result(timeout=10) for fu in futs]
        for i in range(3):
            np.testing.assert_allclose(outs[i], (f[i] + f[i + 3]) / 2, rtol=1e-6)
    finally:
        mb.close()
    # 3 requests within the deadline -> ONE launch, padded to max_batch=4
    assert eng.batch_shapes == [(4, 8, 8, 3)]
    s = mb.stats.snapshot()
    assert s["requests"] == 3 and s["batches"] == 1 and s["padded_items"] == 1


def test_batcher_pixel_budget_caps_launches(rng):
    """max_px_per_launch (the HBM guard) shrinks a bucket's launch batch.

    Pins the fix for the measured serving OOM: batch 8 x 720p needed 19.3G
    of 15.75G HBM; the guard must cap the per-bucket batch (and the pad
    target, and readiness) by pixel budget, with floor 1 for frames larger
    than the whole budget."""
    eng = RecordingEngine()
    # 8x8 frames = 64 px; budget 128 px -> launch size 2 (< max_batch 4)
    mb = MicroBatcher(eng, max_batch=4, max_delay_ms=250.0,
                      max_px_per_launch=128)
    try:
        assert mb.launch_size((8, 8)) == 2
        assert mb.launch_size((16, 16)) == 1      # 256 px > budget -> floor 1
        assert mb.launch_size((2, 2)) == 4        # tiny frames keep max_batch
        f = _frames(rng, 6)
        futs = [mb.submit(f[i], f[i + 3]) for i in range(3)]
        outs = [fu.result(timeout=10) for fu in futs]
        for i in range(3):
            np.testing.assert_allclose(outs[i], (f[i] + f[i + 3]) / 2,
                                       rtol=1e-6)
    finally:
        mb.close()
    # 3 requests, cap 2 -> one full launch of 2, one padded launch of 2;
    # nothing ever launches above the pixel budget.
    assert eng.batch_shapes == [(2, 8, 8, 3), (2, 8, 8, 3)]
    s = mb.stats.snapshot()
    assert s["requests"] == 3 and s["batches"] == 2 and s["padded_items"] == 1


def test_batcher_pixel_budget_warmup_shape(rng):
    """warmup compiles the capped steady-state shape, not max_batch."""
    eng = RecordingEngine()
    mb = MicroBatcher(eng, max_batch=8, max_delay_ms=50.0,
                      max_px_per_launch=128)
    try:
        mb.warmup(8, 8)
    finally:
        mb.close()
    assert eng.batch_shapes == [(2, 8, 8, 3)]


def test_batcher_shape_buckets(rng):
    """Different (H, W) never share a device batch."""
    eng = RecordingEngine()
    mb = MicroBatcher(eng, max_batch=4, max_delay_ms=50.0)
    try:
        a = _frames(rng, 2, h=8, w=8)
        b = _frames(rng, 2, h=16, w=8)
        fa = mb.submit(a[0], a[1])
        fb = mb.submit(b[0], b[1])
        assert fa.result(timeout=10).shape == (8, 8, 3)
        assert fb.result(timeout=10).shape == (16, 8, 3)
    finally:
        mb.close()
    assert sorted(s[1] for s in eng.batch_shapes) == [8, 16]
    assert all(s[0] == 4 for s in eng.batch_shapes)  # both padded


def test_batcher_full_batch_launches_immediately(rng):
    """max_batch waiting requests launch without waiting out the deadline."""
    eng = RecordingEngine()
    mb = MicroBatcher(eng, max_batch=2, max_delay_ms=60_000.0)
    try:
        f = _frames(rng, 4)
        futs = [mb.submit(f[0], f[1]), mb.submit(f[2], f[3])]
        for fu in futs:
            fu.result(timeout=10)  # would hang for 60 s if deadline-gated
    finally:
        mb.close()
    assert eng.batch_shapes == [(2, 8, 8, 3)]


def test_batcher_propagates_engine_errors(rng):
    eng = RecordingEngine(fail=True)
    mb = MicroBatcher(eng, max_batch=2, max_delay_ms=1.0)
    try:
        f = _frames(rng, 2)
        fut = mb.submit(f[0], f[1])
        with pytest.raises(RuntimeError, match="engine down"):
            fut.result(timeout=10)
    finally:
        mb.close()
    assert mb.stats.snapshot()["errors"] == 1


def test_batcher_rejects_bad_shapes(rng):
    mb = MicroBatcher(RecordingEngine(), max_batch=2)
    try:
        with pytest.raises(ValueError):
            mb.submit(np.zeros((8, 8, 3), np.float32), np.zeros((8, 4, 3), np.float32))
        with pytest.raises(ValueError):
            mb.submit(np.zeros((8, 8), np.float32), np.zeros((8, 8), np.float32))
    finally:
        mb.close()
    with pytest.raises(RuntimeError):  # closed
        mb.submit(np.zeros((8, 8, 3), np.float32), np.zeros((8, 8, 3), np.float32))


def test_pair_body_roundtrip():
    body = encode_pair_body(b"abc", b"defg")
    assert split_pair_body(body) == (b"abc", b"defg")
    with pytest.raises(ValueError):
        split_pair_body(b"\x00\x00")  # shorter than the prefix
    with pytest.raises(ValueError):
        split_pair_body(encode_pair_body(b"abc", b""))  # empty second frame


@pytest.fixture(scope="module")
def served_model():
    """Tiny real EMAVFI behind the HTTP server on an ephemeral port."""
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    engine = FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False)
    server = InterpolationServer(engine, port=0, max_batch=4,
                                 max_delay_ms=20.0).start()
    yield server, engine
    server.shutdown()


def _png(arr_u8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    return buf.getvalue()


def _post(url, body, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_http_interpolate_matches_engine(served_model, rng):
    """Wire round trip == direct engine call (PNG is lossless; the only
    quantization is the shared float->u8 of the response encoder)."""
    server, engine = served_model
    a = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    status, png = _post(f"http://127.0.0.1:{server.port}/v1/interpolate",
                        encode_pair_body(_png(a), _png(b)))
    assert status == 200

    from PIL import Image

    got = np.asarray(Image.open(io.BytesIO(png)))
    direct = np.asarray(engine.midpoints(
        a[None].astype(np.float32) / 255.0,
        b[None].astype(np.float32) / 255.0))[0]
    want = np.clip(direct * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_http_concurrent_requests_batch(served_model, rng):
    """Concurrent same-shape requests coalesce; every reply is correct."""
    server, engine = served_model
    url = f"http://127.0.0.1:{server.port}/v1/interpolate"
    pairs = [(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
              rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
             for _ in range(6)]
    results = [None] * len(pairs)

    def worker(i):
        a, b = pairs[i]
        results[i] = _post(url, encode_pair_body(_png(a), _png(b)))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(pairs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    from PIL import Image

    for (a, b), (status, png) in zip(pairs, results):
        assert status == 200
        got = np.asarray(Image.open(io.BytesIO(png)))
        direct = np.asarray(engine.midpoints(
            a[None].astype(np.float32) / 255.0,
            b[None].astype(np.float32) / 255.0))[0]
        want = np.clip(direct * 255.0 + 0.5, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)
    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/stats", timeout=10).read())
    assert stats["requests"] >= 6


def test_http_health_and_errors(served_model):
    server, _ = served_model
    base = f"http://127.0.0.1:{server.port}"
    health = json.loads(urllib.request.urlopen(base + "/healthz",
                                               timeout=10).read())
    assert health["status"] == "ok" and health["devices"] >= 1

    status, body = _post(base + "/v1/interpolate", b"junkbody")
    assert status == 400 and b"error" in body
    status, _ = _post(base + "/nope", b"x")
    assert status == 404
    # mismatched frame shapes -> 400
    a = np.zeros((16, 16, 3), np.uint8)
    b = np.zeros((8, 8, 3), np.uint8)
    status, body = _post(base + "/v1/interpolate",
                         encode_pair_body(_png(a), _png(b)))
    assert status == 400 and b"differ" in body


def test_raw_body_roundtrip(rng):
    from vfi_tpu.serve import encode_raw_body, split_raw_body

    a = rng.integers(0, 255, (6, 9, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (6, 9, 3)).astype(np.uint8)
    f0, f1 = split_raw_body(encode_raw_body(a, b))
    np.testing.assert_array_equal(f0, a)
    np.testing.assert_array_equal(f1, b)
    with pytest.raises(ValueError, match="raw body"):
        split_raw_body(encode_raw_body(a, b)[:-1])
    with pytest.raises(ValueError, match="equal"):
        encode_raw_body(a, a[:4])


def test_io_uint8_engine_matches_float(rng):
    """io_uint8 engine == float engine + host-side u8 quantization, and the
    batcher's dtype coercion keeps both input conventions working."""
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False)
    eng_f = FrameInterpolator(params, **kw)
    eng_u = FrameInterpolator(params, io_uint8=True, **kw)
    assert eng_u.io_dtype == np.uint8

    a = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    got_u8 = np.asarray(eng_u.midpoints(a, b))
    assert got_u8.dtype == np.uint8
    ref = np.asarray(eng_f.midpoints(a.astype(np.float32) / 255.0,
                                     b.astype(np.float32) / 255.0))
    want = np.clip(ref * 255.0 + 0.5, 0, 255).astype(np.uint8)
    # one f32 rounding step happens on device instead of host; allow 1 ulp
    assert np.abs(got_u8.astype(int) - want.astype(int)).max() <= 1

    # batcher coercion: float [0,1] submissions reach a u8 engine losslessly
    mb = MicroBatcher(eng_u, max_batch=2, max_delay_ms=1.0)
    try:
        out = mb.interpolate(a[0].astype(np.float32) / 255.0,
                             b[0].astype(np.float32) / 255.0, timeout=60)
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, got_u8[0])
    finally:
        mb.close()


def test_http_raw_protocol_matches_png(served_model, rng):
    """The zero-codec raw-RGB route returns byte-identical midpoints to the
    PNG route (same engine, same float->u8 quantization)."""
    from vfi_tpu.serve import RAW_CONTENT_TYPE, encode_raw_body

    server, engine = served_model
    url = f"http://127.0.0.1:{server.port}/v1/interpolate"
    a = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)

    status, raw = _post(url, encode_raw_body(a, b), ctype=RAW_CONTENT_TYPE)
    assert status == 200
    got_raw = np.frombuffer(raw, np.uint8).reshape(16, 16, 3)

    from PIL import Image

    status, png = _post(url, encode_pair_body(_png(a), _png(b)))
    assert status == 200
    got_png = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(got_raw, got_png)

    # malformed raw body -> 400, not a server error
    status, body = _post(url, b"\x00\x01\x00\x01junk", ctype=RAW_CONTENT_TYPE)
    assert status == 400 and b"raw body" in body


def test_ready_bucket_earliest_deadline_first():
    """Regression: a saturated majority-shape bucket (always >= max_batch,
    listed first in dict order) must not starve an older minority-shape
    request whose max_delay deadline already expired."""
    from concurrent.futures import Future

    from vfi_tpu.serve.batcher import MicroBatcher, _Request

    mb = MicroBatcher.__new__(MicroBatcher)  # picker is pure given fields
    mb.max_batch = 2
    mb.max_px = None
    mb.max_delay = 0.05
    mb._closed = False

    now = 100.0
    fresh = [_Request(None, None, Future(), t_submit=now - 0.001)
             for _ in range(2)]                      # full bucket, fresh head
    stale = _Request(None, None, Future(), t_submit=now - 1.0)  # expired
    from collections import deque
    mb._buckets = {(720, 1280): deque(fresh), (1080, 1920): deque([stale])}

    shape, soonest = mb._ready_bucket(now)
    assert shape == (1080, 1920) and soonest is None

    # with only the saturated bucket present it still launches immediately
    mb._buckets = {(720, 1280): deque(fresh)}
    shape, _ = mb._ready_bucket(now)
    assert shape == (720, 1280)


def test_http_raw_content_type_with_parameters(served_model, rng):
    """HTTP allows media-type parameters and case variants; both must route
    to the raw parser (an exact == misrouted them into the PNG parser)."""
    from vfi_tpu.serve import encode_raw_body

    server, _ = served_model
    url = f"http://127.0.0.1:{server.port}/v1/interpolate"
    a = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    body = encode_raw_body(a, b)

    for ctype in ("application/x-vfi-raw; charset=binary",
                  "Application/X-VFI-Raw"):
        status, raw = _post(url, body, ctype=ctype)
        assert status == 200, (ctype, raw)
        assert np.frombuffer(raw, np.uint8).reshape(16, 16, 3).shape == (16, 16, 3)


def test_seq_body_roundtrip(rng):
    from vfi_tpu.serve import encode_seq_body, split_seq_body

    fr = rng.integers(0, 255, (4, 6, 9, 3)).astype(np.uint8)
    np.testing.assert_array_equal(split_seq_body(encode_seq_body(fr)), fr)
    with pytest.raises(ValueError, match="multiple"):
        split_seq_body(encode_seq_body(fr)[:-1])
    with pytest.raises(ValueError, match=">= 2"):
        split_seq_body(encode_seq_body(fr)[:4 + 6 * 9 * 3])


def test_batcher_sequence_launch(rng):
    """A sequence request is its own launch via engine.midpoints_sequence
    (one relay transfer per frame — the transfer-bound fast path)."""

    class SeqEngine(RecordingEngine):
        def midpoints_sequence(self, frames):
            with self.lock:
                self.batch_shapes.append(("seq", frames.shape))
            return (frames[:-1] + frames[1:]) / 2.0

    eng = SeqEngine()
    b = MicroBatcher(eng, max_batch=4, max_delay_ms=5.0)
    try:
        fr = np.stack(_frames(rng, 5))
        out = b.interpolate_sequence(fr, timeout=10)
        np.testing.assert_allclose(out, (fr[:-1] + fr[1:]) / 2.0)
        assert ("seq", fr.shape) in eng.batch_shapes
        assert b.stats.requests == 4
    finally:
        b.close()


def test_engine_midpoints_sequence_matches_pairs(rng):
    """midpoints_sequence == midpoints on the consecutive pairs."""
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    eng = FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False)
    fr = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)
    seq = np.asarray(eng.midpoints_sequence(fr))
    pairs = np.asarray(eng.midpoints(fr[:-1], fr[1:]))
    np.testing.assert_allclose(seq, pairs, atol=2e-5)


def test_http_sequence_route(served_model, rng):
    import http.client

    from vfi_tpu.serve import SEQ_CONTENT_TYPE, encode_seq_body

    server, engine = served_model
    fr = rng.integers(0, 255, (4, 24, 32, 3)).astype(np.uint8)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("POST", "/v1/interpolate", body=encode_seq_body(fr),
                 headers={"Content-Type": SEQ_CONTENT_TYPE})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200, data
    mids = np.frombuffer(data, np.uint8).reshape(3, 24, 32, 3)
    ref = np.asarray(engine.midpoints(
        fr[:-1].astype(np.float32) / 255.0,
        fr[1:].astype(np.float32) / 255.0))
    ref_u8 = np.clip(ref * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(mids.astype(np.int16),
                               ref_u8.astype(np.int16), atol=1)


def test_sequence_guard_over_budget_no_recursion(rng):
    """ADVICE r4 (high): a frame larger than HALF the pixel budget used to
    make midpoints_sequence recurse on identical args until RecursionError
    (cap=2 chunks still trip the guard — the 4K/8M and flow-prior-1080p/4M
    serving defaults). It must fall back to the pair path instead, and
    budget-sized chunking must still match the unchunked result."""
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False)
    fr = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    ref = np.asarray(FrameInterpolator(
        params, max_px_per_launch=None, **kw).midpoints(fr[:-1], fr[1:]))

    # 256 px/frame; budget 300 < 2*256: even one pair exceeds it
    tiny = FrameInterpolator(params, max_px_per_launch=300, **kw)
    np.testing.assert_allclose(
        np.asarray(tiny.midpoints_sequence(fr)), ref, atol=2e-5)

    # budget 600: cap = 2 -> 2-frame chunks, each within budget
    mid = FrameInterpolator(params, max_px_per_launch=600, **kw)
    np.testing.assert_allclose(
        np.asarray(mid.midpoints_sequence(fr)), ref, atol=2e-5)


def test_warmup_sequence_compiles_seq_route(rng):
    """server.warmup([(n1, h, w)]) must run the exact midpoints_sequence
    call a real x-vfi-raw-seq request takes (the round-4 A/B failed
    because warmup only covered pair buckets)."""
    from vfi_tpu.serve import InterpolationServer

    class SeqEngine(RecordingEngine):
        def midpoints_sequence(self, frames):
            with self.lock:
                self.batch_shapes.append(("seq", frames.shape))
            return (frames[:-1] + frames[1:]) / 2.0

    eng = SeqEngine()
    # .start() before shutdown(): http.server's shutdown blocks forever
    # unless serve_forever is running.
    server = InterpolationServer(eng, port=0).start()
    try:
        server.warmup([(9, 6, 8), (6, 8)])
        assert ("seq", (9, 6, 8, 3)) in eng.batch_shapes
        # the pair bucket warmed too (a (B, 6, 8, 3) midpoints launch)
        assert any(s[-3:] == (6, 8, 3) and len(s) == 4
                   for s in eng.batch_shapes if s[0] != "seq")
        with pytest.raises(ValueError, match=">= 2"):
            server.batcher.warmup_sequence(1, 6, 8)
    finally:
        server.shutdown()
