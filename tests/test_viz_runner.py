"""Visualization exporters + the dataset runner CLI.

The runner test is the hermetic version of the reference's rgbd_tum example
run (rgbd_tum.cc:63-174): render a synthetic sequence to disk as real PNGs,
then run the FULL dataset path — native PNG decode, prefetcher, System,
trajectory export, ATE — from one command."""

import json
import os

import numpy as np
import pytest

from sgslam_tpu import viz
from sgslam_tpu.io import native


def test_draw_frame_overlay(tmp_path):
    gray = np.random.default_rng(0).random((60, 80)).astype(np.float32)
    xy = np.asarray([[10.0, 10.0], [70.0, 50.0], [40.0, 30.0]])
    valid = np.asarray([True, True, False])
    culled = np.asarray([False, False, True])
    img = viz.draw_frame(gray, xy, valid, culled)
    assert img.shape == (60, 80, 3) and img.dtype == np.uint8
    assert tuple(img[10, 10]) == viz.COLOR_KP
    assert tuple(img[30, 40]) == viz.COLOR_KP_CULLED
    p = str(tmp_path / "frame.png")
    viz.save_frame(p, gray, xy, valid, culled)
    back = native.png_read(p)
    assert back.shape == (60, 80, 3)
    np.testing.assert_array_equal(back, img)


def test_occupancy_image():
    lo = np.asarray([[-1.0, 0.0, 1.0]])
    img = viz.occupancy_to_image(lo)
    assert img.tolist() == [[255, 128, 0]]


def test_map_topdown(tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from sgslam_tpu import config
    from sgslam_tpu.mapstate import mapstate as ms

    m = ms.empty_map(config.MapCapacity(max_keyframes=8, max_points=64), 16)
    m = dataclasses.replace(
        m, pt_valid=m.pt_valid.at[:10].set(True),
        pt_pos=m.pt_pos.at[:10].set(
            jnp.linspace(0, 1, 30).reshape(10, 3)),
        kf_valid=m.kf_valid.at[0].set(True))
    img = viz.draw_map_topdown(m, size=128)
    assert img.shape == (128, 128, 3)
    assert img.max() > 0
    viz.save_map_topdown(str(tmp_path / "map.png"), m, size=128)
    assert os.path.exists(tmp_path / "map.png")


@pytest.mark.slow
def test_run_tum_synthetic_end_to_end(tmp_path):
    """One command: synthesize dataset -> PNGs -> prefetch -> SLAM -> ATE."""
    from sgslam_tpu import run_tum

    out = str(tmp_path / "run")
    result = run_tum.main([
        "--synthetic", "40", "--seq-dir", str(tmp_path / "seq"),
        "--no-detector", "--no-semantic",
        "--out", out, "--cpu"])
    assert result["state"] == "OK"
    assert result["frames"] == 40
    assert result["ate_rmse_m"] is not None
    assert result["ate_rmse_m"] < 0.06, result
    traj = np.loadtxt(os.path.join(out, "CameraTrajectory.txt"))
    assert traj.shape == (40, 8)
    # PNG round trip really happened (16-bit depth + 8-bit gray on disk)
    d = native.png_read(os.path.join(
        str(tmp_path / "seq"), "depth",
        sorted(os.listdir(tmp_path / "seq" / "depth"))[0]))
    assert d.dtype == np.uint16


@pytest.mark.slow
def test_run_tum_chunked_end_to_end(tmp_path):
    """The --chunked runner: the one-dispatch-per-chunk real-time system
    (loop closer + mapper at the drain boundary) through the CLI."""
    from sgslam_tpu import run_tum

    out = str(tmp_path / "run")
    result = run_tum.main([
        "--synthetic", "38", "--seq-dir", str(tmp_path / "seq"),
        "--chunked", "--no-detector", "--no-semantic",
        "--out", out, "--cpu"])
    assert result["state"] == "OK"
    assert result["ate_rmse_m"] is not None
    assert result["ate_rmse_m"] < 0.06, result
    assert result["keyframes"] >= 2
    traj = np.loadtxt(os.path.join(out, "CameraTrajectory.txt"))
    assert traj.shape[1] == 8
