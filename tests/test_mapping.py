import jax
import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.mapping import occupancy, pointcloud
from sgslam_tpu.semantic import detector3d, dynamic, objects

CFG = config.synthetic_config(width=160, height=120)


def test_backproject_depth_geometry():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=2)
    gray, depth = seq.frame(0)
    T_wc = seq.gt_pose_wc(0)
    pts, inten, valid = pointcloud.backproject_depth(
        CFG.camera, depth, gray, T_wc, dynamic.Boxes.empty(),
        depth_min=0.3, depth_max=6.0)
    v = np.asarray(valid)
    p = np.asarray(pts)[v]
    assert v.sum() > 10000
    # every point on one of the room planes
    res = np.minimum(np.minimum(np.abs(p[:, 2] - 3.5), np.abs(p[:, 1] - 1.0)),
                     np.abs(p[:, 0] + 2.0))
    assert np.percentile(res, 95) < 0.02


def test_backproject_skips_dynamic_boxes():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=2)
    gray, depth = seq.frame(0)
    box = dynamic.Boxes(
        xyxy=jnp.asarray([[40, 30, 120, 90]] + [[0, 0, 0, 0]] * 31,
                         jnp.float32),
        cls=jnp.full(32, 15, jnp.int32), score=jnp.full(32, 0.9),
        valid=jnp.asarray([True] + [False] * 31))
    _, _, v0 = pointcloud.backproject_depth(
        CFG.camera, depth, gray, seq.gt_pose_wc(0), dynamic.Boxes.empty())
    _, _, v1 = pointcloud.backproject_depth(
        CFG.camera, depth, gray, seq.gt_pose_wc(0), box)
    masked = int(v0.sum()) - int(v1.sum())
    assert masked == 81 * 61  # box area removed (inclusive bounds)


def test_voxel_downsample(rng):
    pts = jnp.asarray(rng.uniform(0, 1.0, size=(5000, 3)).astype(np.float32))
    inten = jnp.ones(5000)
    valid = jnp.ones(5000, bool)
    p, i, ok = pointcloud.voxel_downsample(pts, inten, valid,
                                          voxel_size=0.25)
    n = int(ok.sum())
    assert n <= 4 ** 3 + 8, f"{n} voxels for a 4x4x4 grid"
    assert n >= 50


def test_density_outlier_filter(rng):
    dense = rng.normal(scale=0.05, size=(500, 3)).astype(np.float32)
    outliers = rng.uniform(5, 10, size=(20, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([dense, outliers]))
    valid = jnp.ones(520, bool)
    keep = np.asarray(pointcloud.density_outlier_filter(
        pts, valid, voxel_size=0.1, min_neighbors=8))
    assert keep[:500].mean() > 0.9
    # rare spatial-hash collisions can rescue an isolated point
    assert keep[500:].sum() <= 1


def test_occupancy_carving():
    grid = occupancy.empty_grid(64, 0.1, origin=(-3.2, -3.2, -3.2))
    origin = jnp.asarray([0.0, 0.0, 0.0])
    # wall of points at z=2
    xs = jnp.linspace(-1, 1, 40)
    pts = jnp.stack([xs.repeat(40),
                     jnp.tile(jnp.linspace(-1, 1, 40), 40),
                     jnp.full(1600, 2.0)], -1)
    grid = occupancy.insert_scan(grid, origin, pts, jnp.ones(1600, bool))
    occ = np.asarray(occupancy.occupied_mask(grid))
    ijk_wall = np.asarray(occupancy.world_to_voxel(grid, pts))
    assert occ[ijk_wall[:, 0], ijk_wall[:, 1], ijk_wall[:, 2]].mean() > 0.95
    # free space along the ray interior
    mid = jnp.asarray([[0.0, 0.0, 1.0]])
    ijk_mid = np.asarray(occupancy.world_to_voxel(grid, mid))[0]
    assert grid.logodds[ijk_mid[0], ijk_mid[1], ijk_mid[2]] < 0
    # far behind the wall: untouched
    behind = np.asarray(occupancy.world_to_voxel(
        grid, jnp.asarray([[0.0, 0.0, 3.0]])))[0]
    assert grid.logodds[behind[0], behind[1], behind[2]] == 0


def test_object_db_merge_and_append():
    db = objects.ObjectDB.empty(16)
    db = objects.add_object(db, jnp.asarray([1.0, 0, 0]),
                            jnp.asarray([0.2, 0.2, 0.2]), 0.8, 9)  # chair
    db = objects.add_object(db, jnp.asarray([1.3, 0, 0]),
                            jnp.asarray([0.4, 0.2, 0.2]), 0.6, 9)  # merges
    db = objects.add_object(db, jnp.asarray([5.0, 0, 0]),
                            jnp.asarray([0.2, 0.2, 0.2]), 0.9, 9)  # new
    db = objects.add_object(db, jnp.asarray([1.0, 0, 0]),
                            jnp.asarray([0.1, 0.1, 0.1]), 0.9, 5)  # bottle
    assert int(db.next_id) == 3
    assert int(db.count[0]) == 2
    np.testing.assert_allclose(np.asarray(db.centroid[0]),
                               [1.15, 0, 0], atol=1e-5)


def test_cluster_labels_separates_blobs(rng):
    a = rng.normal(scale=0.01, size=(100, 3)).astype(np.float32)
    b = (rng.normal(scale=0.01, size=(100, 3)) + 1.0).astype(np.float32)
    pts = jnp.asarray(np.concatenate([a, b]))
    valid = jnp.ones(200, bool)
    lbl = np.asarray(detector3d.cluster_labels(pts, valid, tol=0.05))
    assert len(set(lbl[:100])) == 1
    assert len(set(lbl[100:])) == 1
    assert lbl[0] != lbl[150]


def test_extract_object_from_box():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=2, dynamic=True)
    gray, depth = seq.frame(0)
    T_wc = seq.gt_pose_wc(0)
    pts, inten, valid = pointcloud.backproject_depth(
        CFG.camera, depth, gray, T_wc, dynamic.Boxes.empty(),
        depth_min=0.3, depth_max=6.0)
    # pixel coords of the cloud
    h, w = 120, 160
    uu = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0).reshape(-1)
    vv = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1).reshape(-1)
    uv = jnp.stack([uu, vv], -1)
    # the dynamic quad as "object": find its pixels from depth diff
    seq_s = synthetic.SyntheticSequence(CFG.camera, n_frames=2, dynamic=False)
    _, ds = seq_s.frame(0)
    dyn = np.asarray(ds - depth) > 0.3
    ys, xs = np.where(dyn)
    box = jnp.asarray([xs.min(), ys.min(), xs.max(), ys.max()], jnp.float32)
    centroid, size, ok = detector3d.extract_object(
        CFG.camera, pts, uv, valid, box, seq.gt_pose_cw(0))
    assert bool(ok)
    # the person capsule sits at z ~ 2.0, around x ~ obj_track(0)
    c = np.asarray(centroid)
    assert abs(c[2] - 2.0) < 0.1, c
