"""Live HTTP viewer: publish/serve round trip (the Viewer/FrameDrawer/
MapDrawer role of /root/reference/src/sg-slam/src/Viewer.cc as a browser
feed instead of a Pangolin window)."""

import json
import urllib.request

import numpy as np

from sgslam_tpu import config
from sgslam_tpu.mapstate import mapstate as ms
from sgslam_tpu.viewer import LiveViewer

PNG_MAGIC = b"\x89PNG"


def test_live_viewer_roundtrip():
    v = LiveViewer(port=0, every=1).start()
    try:
        gray = np.random.default_rng(0).uniform(size=(120, 160)).astype(
            np.float32)
        xy = np.array([[10.0, 10.0], [50.0, 60.0]], np.float32)
        v.publish_frame(gray, xy=xy, valid=np.array([True, True]))
        cfg = config.synthetic_config(width=160, height=120)
        m = ms.empty_map(config.MapCapacity(max_keyframes=8,
                                            max_points=128), 64)
        v.publish_map(m)
        v.publish_occupancy(np.zeros((32, 32), np.float32))
        v.publish_stats(frame=7, state="OK")

        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(f"{base}/", timeout=10).read()
        assert b"sgslam_tpu" in page
        for ep in ("frame.png", "map.png", "occ.png"):
            data = urllib.request.urlopen(f"{base}/{ep}", timeout=10).read()
            assert data.startswith(PNG_MAGIC), ep
        stats = json.loads(urllib.request.urlopen(
            f"{base}/stats.json", timeout=10).read())
        assert stats["frame"] == 7 and stats["state"] == "OK"
        # unknown endpoint -> 404, server stays alive
        try:
            urllib.request.urlopen(f"{base}/nope.png", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        again = urllib.request.urlopen(f"{base}/frame.png",
                                       timeout=10).read()
        assert again.startswith(PNG_MAGIC)
    finally:
        v.stop()
