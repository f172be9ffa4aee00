"""Unit tests for core.geometry against numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.core.camera import (
    Distortion,
    Extrinsics,
    Intrinsics,
    camera_info_to_intrinsics,
    CameraInfo,
    fused_virtual_intrinsics,
)

import oracles


def make_intr(w=32, h=24, model=Distortion.NONE, coeffs=(0, 0, 0, 0, 0)):
    return Intrinsics.create(w, h, fx=28.5, fy=29.5, ppx=w / 2 - 0.25, ppy=h / 2 + 0.5,
                             model=model, coeffs=coeffs)


def test_deproject_matches_oracle(rng):
    intr = make_intr()
    depth = rng.uniform(0.4, 3.0, (intr.height, intr.width)).astype(np.float32)
    depth[0, 0] = 0.0
    pts, valid = G.deproject(jnp.asarray(depth), intr)
    want = oracles.deproject_oracle(
        depth, float(intr.fx), float(intr.fy), float(intr.ppx), float(intr.ppy)
    )
    np.testing.assert_allclose(np.asarray(pts), want, rtol=1e-5, atol=1e-6)
    assert not bool(valid[0, 0])
    assert bool(valid[1, 1])


def test_deproject_inverse_brown_conrady(rng):
    coeffs = (-0.05, 0.06, 0.001, -0.001, -0.02)
    intr = make_intr(model=Distortion.INVERSE_BROWN_CONRADY, coeffs=coeffs)
    depth = rng.uniform(0.4, 3.0, (intr.height, intr.width)).astype(np.float32)
    pts, _ = G.deproject(jnp.asarray(depth), intr)
    want = oracles.deproject_oracle(
        depth, float(intr.fx), float(intr.fy), float(intr.ppx), float(intr.ppy),
        coeffs=coeffs, inverse_bc=True,
    )
    np.testing.assert_allclose(np.asarray(pts), want, rtol=1e-4, atol=1e-5)


def test_project_round_trip(rng):
    intr = make_intr()
    depth = rng.uniform(0.5, 2.0, (intr.height, intr.width)).astype(np.float32)
    pts, _ = G.deproject(jnp.asarray(depth), intr)
    px, py = G.project_points(pts, intr)
    u, v = G.pixel_grid(intr.height, intr.width)
    np.testing.assert_allclose(np.asarray(px), np.asarray(u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(py), np.asarray(v), atol=1e-3)


def test_transform_points_matches_oracle(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    t = np.eye(4)
    angle = 0.3
    t[:3, :3] = np.array(
        [[np.cos(angle), -np.sin(angle), 0], [np.sin(angle), np.cos(angle), 0], [0, 0, 1]]
    )
    t[:3, 3] = [0.1, -0.2, 0.5]
    got = G.transform_points(jnp.asarray(pts), jnp.asarray(t, jnp.float32))
    want = oracles.transform_oracle(pts, t)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_quaternion_round_trip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r = np.asarray(G.matrix_from_quaternion(jnp.asarray(q)))
        q2 = np.asarray(G.quaternion_from_matrix(jnp.asarray(r)))
        # q and -q are the same rotation
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-5


def test_slerp_endpoints_and_midpoint():
    # 0 and 90 deg about z; slerp(0.5) must be 45 deg.
    q0 = jnp.asarray([1.0, 0, 0, 0])
    a = np.pi / 2
    q1 = jnp.asarray([np.cos(a / 2), 0, 0, np.sin(a / 2)])
    qm = G.quaternion_slerp(q0, q1, 0.5)
    want = np.array([np.cos(a / 4), 0, 0, np.sin(a / 4)])
    np.testing.assert_allclose(np.asarray(qm), want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(G.quaternion_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(G.quaternion_slerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-6)


def test_interpolate_transform_midpoint():
    left = jnp.eye(4)
    a = np.pi / 2
    right = np.eye(4)
    right[:3, :3] = [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    right[:3, 3] = [1.0, 0, 0]
    mid = np.asarray(G.interpolate_transform(left, jnp.asarray(right, jnp.float32)))
    ang = np.arctan2(mid[1, 0], mid[0, 0])
    np.testing.assert_allclose(ang, a / 2, atol=1e-5)
    np.testing.assert_allclose(mid[:3, 3], [0.5, 0, 0], atol=1e-6)


def test_invert_rigid(rng):
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = np.asarray(G.euler_to_matrix(jnp.asarray([0.2, -0.4, 0.9])))
    t[:3, 3] = [0.3, 1.0, -0.7]
    inv = np.asarray(G.invert_rigid(jnp.asarray(t)))
    np.testing.assert_allclose(inv @ t, np.eye(4), atol=1e-5)


def _rot_axis(angle, axis):
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_extract_euler_angles():
    # extract_euler_angles implements the reference's extraction
    # (registration.cpp extractEulerAngles), which inverts a Rz@Ry@Rx
    # composition.
    ax, ay, az = 0.1, -0.35, 0.8
    r = _rot_axis(az, "z") @ _rot_axis(ay, "y") @ _rot_axis(ax, "x")
    got = np.asarray(G.extract_euler_angles(jnp.asarray(r)))
    np.testing.assert_allclose(got, [ax, ay, az], atol=1e-6)


def test_euler_to_matrix_composition():
    # euler_to_matrix composes Rx@Ry@Rz (the reference's virtual-camera pose
    # construction, fusion_node.cpp:174-177).
    ax, ay, az = 0.1, -0.35, 0.8
    want = _rot_axis(ax, "x") @ _rot_axis(ay, "y") @ _rot_axis(az, "z")
    got = np.asarray(G.euler_to_matrix(jnp.asarray([ax, ay, az])))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_se3_exp_small_angle():
    xi = jnp.asarray([1e-4, -2e-4, 3e-4, 1e-5, 2e-5, -1e-5])
    m = np.asarray(G.se3_exp(xi))
    np.testing.assert_allclose(m[:3, 3], np.asarray(xi[:3]), rtol=1e-3)
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-4)


def test_se3_exp_pure_rotation():
    a = 0.5
    xi = jnp.asarray([0.0, 0, 0, 0, 0, a])
    m = np.asarray(G.se3_exp(xi))
    want = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    np.testing.assert_allclose(m[:3, :3], want, atol=1e-6)


def test_camera_info_truncation():
    info = CameraInfo(
        width=848, height=480,
        k=np.array([631.7, 0, 423.9, 0, 631.2, 239.6, 0, 0, 1.0]),
        d=np.zeros(5),
    )
    intr = camera_info_to_intrinsics(info)
    assert float(intr.fx) == 631.0 and float(intr.ppx) == 423.0
    intr2 = camera_info_to_intrinsics(info, legacy_int_truncation=False)
    assert abs(float(intr2.fx) - 631.7) < 1e-3


def test_fused_virtual_intrinsics_vertical():
    intr = Intrinsics.create(848, 480, fx=631.0, fy=632.0, ppx=423.0, ppy=239.0)
    fused = fused_virtual_intrinsics(intr, vertical_image=True)
    assert fused.width == 480 and fused.height == 848
    assert float(fused.fx) == 632.0 and float(fused.fy) == 631.0
    # integer-division center (fusion_node.cpp:164-165)
    assert float(fused.ppx) == 240.0 and float(fused.ppy) == 424.0


def test_extrinsics_column_major():
    # Column-major wire format: identity stays identity; check a permutation.
    rot9 = [0, 1, 0, -1, 0, 0, 0, 0, 1]  # columns: (0,1,0), (-1,0,0), (0,0,1)
    ext = Extrinsics.from_column_major_flat(rot9, [1, 2, 3])
    p = np.asarray(
        G.transform_extrinsic(
            jnp.asarray([[1.0, 0.0, 0.0]]), ext.rotation, ext.translation
        )
    )
    # rotation @ (1,0,0) = first column of effective matrix = (0, 1, 0)
    np.testing.assert_allclose(p[0], [1.0, 3.0, 3.0], atol=1e-6)


def _eigen_quaternion_oracle(m):
    """Eigen internal::quaternionbase_assign_impl (Quaternion(Matrix3)),
    scalar-for-scalar: w-branch iff trace > 0, else dominant diagonal.
    Returns (w, x, y, z) with Eigen's SIGN convention."""
    t = m[0, 0] + m[1, 1] + m[2, 2]
    q = np.zeros(4)
    if t > 0:
        s = np.sqrt(t + 1.0)
        q[0] = 0.5 * s
        s = 0.5 / s
        q[1] = (m[2, 1] - m[1, 2]) * s
        q[2] = (m[0, 2] - m[2, 0]) * s
        q[3] = (m[1, 0] - m[0, 1]) * s
    else:
        i = 0
        if m[1, 1] > m[0, 0]:
            i = 1
        if m[2, 2] > m[i, i]:
            i = 2
        j = (i + 1) % 3
        k = (j + 1) % 3
        s = np.sqrt(m[i, i] - m[j, j] - m[k, k] + 1.0)
        xyz = np.zeros(3)
        xyz[i] = 0.5 * s
        s = 0.5 / s
        q[0] = (m[k, j] - m[j, k]) * s
        xyz[j] = (m[j, i] + m[i, j]) * s
        xyz[k] = (m[k, i] + m[i, k]) * s
        q[1:] = xyz
    return q


def test_quaternion_sign_matches_eigen(rng):
    """SIGN-exact parity with Eigen's Quaternion(Matrix3): the
    interpolate_transform quirk (invert when q_right.w < 0,
    fusion_node.cpp:603) keys on the sign, so the branch rule must be
    Eigen's (w-branch iff trace > 0), not argmax-of-all-four. Sweep
    includes the (90deg, 120deg) band where the rules disagree."""
    # axis-angle sweep incl. the critical band and near-180deg poses
    for trial in range(200):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(-np.pi, np.pi)
        if trial < 40:  # concentrate on the disagreement band
            angle = np.sign(angle) * rng.uniform(np.pi / 2, 2 * np.pi / 3)
        k = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ])
        r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
        want = _eigen_quaternion_oracle(r)
        got = np.asarray(G.quaternion_from_matrix(jnp.asarray(r, jnp.float32)))
        assert np.sign(got[0]) == np.sign(want[0]) or abs(want[0]) < 1e-6, (
            angle, got, want
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_interpolate_transform_quirk_matches_eigen_oracle(rng):
    """End-to-end parity of interpolateTransform (fusion_node.cpp:589-604):
    Eigen-sign quaternions, slerp(0.5) + lerp(0.5), and the 'invert when
    q_right.w < 0' quirk firing on EXACTLY the poses Eigen's w sign says —
    including the 90-120 deg band where the old branch rule negated w."""

    def eigen_slerp_half(q0, q1):
        d = float(np.dot(q0, q1))
        if d < 0:
            q1 = -q1
            d = -d
        d = min(d, 1.0)
        th = np.arccos(d)
        if np.sin(th) < 1e-6:
            q = 0.5 * q0 + 0.5 * q1
        else:
            q = (np.sin(0.5 * th) * q0 + np.sin(0.5 * th) * q1) / np.sin(th)
        return q / np.linalg.norm(q)

    def quat_to_mat(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    for trial in range(60):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        # concentrate on the old-rule disagreement band plus general poses
        angle = (np.sign(rng.uniform(-1, 1)) * rng.uniform(np.pi / 2, 2 * np.pi / 3)
                 if trial < 30 else rng.uniform(-np.pi, np.pi))
        k = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        rot = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
        right = np.eye(4)
        right[:3, :3] = rot
        right[:3, 3] = rng.normal(scale=0.2, size=3)

        # scalar oracle (fusion_node.cpp:589-604, Eigen conventions)
        q_l = _eigen_quaternion_oracle(np.eye(3))
        q_r = _eigen_quaternion_oracle(rot)
        q = eigen_slerp_half(q_l, q_r)
        m = np.eye(4)
        m[:3, :3] = quat_to_mat(q)
        m[:3, 3] = 0.5 * right[:3, 3]
        if q_r[0] < 0:
            inv = np.eye(4)
            inv[:3, :3] = m[:3, :3].T
            inv[:3, 3] = -m[:3, :3].T @ m[:3, 3]
            m = inv

        got = np.asarray(G.interpolate_transform(
            jnp.eye(4, dtype=jnp.float32), jnp.asarray(right, jnp.float32)
        ))
        np.testing.assert_allclose(got, m, atol=2e-5)
