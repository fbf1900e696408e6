"""Octomap-compatible .bt export: byte-level format round trip and the
mapper-level export (octomap_server capability, OctomapServer.h:96-205)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sgslam_tpu.mapping import occupancy, octomap_io


def _grid_with_content(dim=32, voxel=0.1):
    g = occupancy.empty_grid(dim, voxel, origin=(-1.6, -1.6, -1.6))
    lo = np.zeros((dim, dim, dim), np.float32)
    # occupied wall slab + free carved corridor + an 8^3 uniform free block
    # (exercises pruning)
    lo[20, 4:28, 4:28] = 2.0
    lo[5:20, 10, 12] = -1.0
    lo[8:16, 16:24, 16:24] = -0.8
    return dataclasses.replace(g, logodds=jnp.asarray(lo))


def test_bt_round_trip(tmp_path):
    g = _grid_with_content()
    path = str(tmp_path / "map.bt")
    octomap_io.write_bt(path, g)

    occ_keys, free_keys, res = octomap_io.read_bt(path)
    assert abs(res - 0.1) < 1e-9

    lo = np.asarray(g.logodds)
    D = lo.shape[0]
    off = octomap_io.HALF_KEYS - D // 2
    occ_ijk = {tuple(k) for k in (occ_keys - off)}
    free_ijk = {tuple(k) for k in (free_keys - off)}
    want_occ = {tuple(k) for k in np.argwhere(lo > 1e-6)}
    want_free = {tuple(k) for k in np.argwhere(lo < -1e-6)}
    assert occ_ijk == want_occ
    assert free_ijk == want_free


def test_bt_header_and_pruning(tmp_path):
    g = _grid_with_content()
    path = str(tmp_path / "map.bt")
    octomap_io.write_bt(path, g)
    raw = open(path, "rb").read()
    head = raw[:raw.index(b"data\n")].decode()
    assert "# Octomap OcTree binary file" in head
    assert "id OcTree" in head
    assert "res 0.1" in head
    n_nodes = int([l for l in head.splitlines()
                   if l.startswith("size ")][0].split()[1])
    body_len = len(raw) - raw.index(b"data\n") - 5
    assert body_len == 2 * n_nodes
    # pruning: the uniform 8x8x8 free block must collapse far below
    # one node per voxel
    n_known = int((np.abs(np.asarray(g.logodds)) > 1e-6).sum())
    assert n_nodes < n_known, (n_nodes, n_known)


def test_empty_grid_export(tmp_path):
    g = occupancy.empty_grid(16, 0.05)
    path = str(tmp_path / "empty.bt")
    octomap_io.write_bt(path, g)
    occ_keys, free_keys, res = octomap_io.read_bt(path)
    assert len(occ_keys) == 0 and len(free_keys) == 0


def test_mapper_save_octomap(tmp_path):
    """SemanticMapper end-to-end: carve a scan, export, verify occupied
    voxels appear at the right world coordinates."""
    from sgslam_tpu import config
    from sgslam_tpu.geometry import se3
    from sgslam_tpu.io import synthetic
    from sgslam_tpu.mapping.semantic_mapper import SemanticMapper

    cfg = config.synthetic_config(width=160, height=120)
    mapper = SemanticMapper(cfg, grid_dim=128)
    g, d = synthetic.render_frame(cfg.camera, se3.se3_identity())
    mapper.insert_keyframe(g, d, se3.se3_identity())
    path = str(tmp_path / "scene.bt")
    trans = mapper.save_octomap(path)

    occ_keys, free_keys, res = octomap_io.read_bt(path)
    assert len(occ_keys) > 50, "no occupied voxels exported"
    assert len(free_keys) > len(occ_keys), "no free space carved"
    # world positions of exported occupied voxels: file + translation
    pts_world = (occ_keys - octomap_io.HALF_KEYS + 0.5) * res + trans
    # the room's back wall is at z=3.5 in front of the identity camera;
    # exported occupied voxels must lie inside the visible room volume
    assert pts_world[:, 2].max() < 3.8
    assert pts_world[:, 2].min() > 0.2
