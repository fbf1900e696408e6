"""Native host runtime: PNG codec, dataset prefetcher, byte queues.

Golden-tests the C++ PNG path against PIL (the reference validates against
OpenCV-decoded images; contract of cv::imread in Examples/rgbd_tum.cc).
"""

import os
import threading

import numpy as np
import pytest

from sgslam_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _pil_save(path, arr, mode=None):
    from PIL import Image

    Image.fromarray(arr, mode=mode).save(path)


def test_png_decode_rgb8_matches_pil(tmp_path, rng):
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _pil_save(p, img)
    out = native.png_read(p)
    np.testing.assert_array_equal(out, img)


def test_png_decode_gray16_matches_pil(tmp_path, rng):
    img = rng.integers(0, 65536, size=(29, 41), dtype=np.uint16)
    p = str(tmp_path / "d.png")
    _pil_save(p, img, mode="I;16")
    out = native.png_read(p)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_png_decode_gray8(tmp_path, rng):
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    _pil_save(p, img)
    np.testing.assert_array_equal(native.png_read(p), img)


def test_png_encode_roundtrip(tmp_path, rng):
    from PIL import Image

    for shape in [(21, 17), (21, 17, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        p = str(tmp_path / f"e{len(shape)}.png")
        native.png_write(p, img)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)


def _make_dataset(tmp_path, rng, n=6, h=24, w=32):
    rgbs, depths = [], []
    for i in range(n):
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        depth = rng.integers(0, 20000, size=(h, w), dtype=np.uint16)
        rp = str(tmp_path / f"rgb{i}.png")
        dp = str(tmp_path / f"d{i}.png")
        _pil_save(rp, rgb)
        _pil_save(dp, depth, mode="I;16")
        rgbs.append((rp, rgb))
        depths.append((dp, depth))
    return rgbs, depths


def test_native_loader_ordered_and_correct(tmp_path, rng):
    rgbs, depths = _make_dataset(tmp_path, rng)
    loader = native.NativeTumLoader([p for p, _ in rgbs],
                                    [p for p, _ in depths],
                                    depth_factor=5000.0, n_threads=3,
                                    window=2)
    seen = []
    for idx, gray, depth, rgb in loader:
        seen.append(idx)
        np.testing.assert_array_equal(rgb, rgbs[idx][1])
        np.testing.assert_allclose(depth, depths[idx][1] / 5000.0,
                                   rtol=1e-6)
        exp_gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2]) / 255.0
        np.testing.assert_allclose(gray, exp_gray.astype(np.float32),
                                   atol=1e-5)
    assert seen == list(range(len(rgbs)))
    loader.close()


def test_byte_queue_fifo_and_blocking():
    q = native.ByteQueue(capacity=2)
    out = []

    def consumer():
        while True:
            msg = q.pop()
            if msg is None:
                return
            out.append(msg)

    t = threading.Thread(target=consumer)
    t.start()
    msgs = [f"msg-{i}".encode() * (i + 1) for i in range(20)]
    for msg in msgs:
        assert q.push(msg)
    q.close()
    t.join(timeout=10)
    assert not t.is_alive()
    assert out == msgs
    q.destroy()


def test_byte_queue_backpressure():
    q = native.ByteQueue(capacity=1)
    assert q.push(b"a")
    # second push must block until a pop happens
    state = {}

    def pusher():
        state["second"] = q.push(b"b")

    t = threading.Thread(target=pusher)
    t.start()
    t.join(timeout=0.2)
    assert t.is_alive(), "push should block when full"
    assert q.pop() == b"a"
    t.join(timeout=5)
    assert not t.is_alive()
    assert q.pop() == b"b"
    q.close()
    q.destroy()
