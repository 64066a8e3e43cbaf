import numpy as np
import jax.numpy as jnp

from dcl_net_tpu.geometry import (
    normalize_vector,
    ortho6d_to_matrix,
    ortho9d_to_matrix,
    quaternion_to_matrix,
    matrix_to_quaternion,
    axis_angle_to_matrix,
    euler_to_matrix,
    transform_points,
    compose_pose,
    invert_pose,
    l2_distance,
    chamfer_distance,
)


def _assert_rotation(m, atol=1e-5):
    m = np.asarray(m)
    eye = np.eye(3)
    np.testing.assert_allclose(m @ m.swapaxes(-1, -2), np.broadcast_to(eye, m.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(m.shape[:-2]), atol=atol)


def test_normalize_vector(rng):
    v = rng.randn(5, 3).astype(np.float32)
    out = np.asarray(normalize_vector(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)
    # zero vector doesn't blow up
    z = np.asarray(normalize_vector(jnp.zeros((1, 3))))
    assert np.all(np.isfinite(z))


def test_ortho9d_is_rotation(rng):
    x = rng.randn(8, 3).astype(np.float32)
    y = rng.randn(8, 3).astype(np.float32)
    z = rng.randn(8, 3).astype(np.float32)
    m = ortho9d_to_matrix(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    _assert_rotation(m)


def test_ortho9d_identity_on_rotation(rng):
    """Feeding the columns of an existing rotation must return it unchanged."""
    q = rng.randn(6, 4).astype(np.float32)
    r = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    m = ortho9d_to_matrix(
        jnp.asarray(r[:, :, 0]), jnp.asarray(r[:, :, 1]), jnp.asarray(r[:, :, 2])
    )
    np.testing.assert_allclose(np.asarray(m), r, atol=1e-5)


def test_ortho6d_is_rotation(rng):
    x = rng.randn(8, 3).astype(np.float32)
    y = rng.randn(8, 3).astype(np.float32)
    m = ortho6d_to_matrix(jnp.asarray(x), jnp.asarray(y))
    _assert_rotation(m)


def test_quaternion_roundtrip(rng):
    q = rng.randn(16, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1])  # canonical sign
    m = quaternion_to_matrix(jnp.asarray(q))
    _assert_rotation(m)
    q2 = np.asarray(matrix_to_quaternion(m))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)


def test_axis_angle(rng):
    m = axis_angle_to_matrix(jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([np.pi / 2]))
    expect = np.array([[[0, -1, 0], [1, 0, 0], [0, 0, 1]]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(m), expect, atol=1e-6)


def test_euler_matches_transforms3d():
    try:
        from transforms3d.euler import euler2mat
    except ImportError:
        import scipy.spatial.transform as st

        def euler2mat(a, b, c):
            # transforms3d 'sxyz' (static frame) == scipy extrinsic 'xyz'
            return st.Rotation.from_euler("xyz", [a, b, c]).as_matrix()

    angles = [(0.1, -0.2, 0.3), (0.0, 0.0, 0.0), (1.0, 0.5, -1.2)]
    for a, b, c in angles:
        ours = np.asarray(euler_to_matrix(jnp.float32(a), jnp.float32(b), jnp.float32(c)))
        theirs = euler2mat(a, b, c)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_transform_and_compose(rng):
    q = rng.randn(4, 4).astype(np.float32)
    r1 = quaternion_to_matrix(jnp.asarray(q))
    t1 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    q2 = rng.randn(4, 4).astype(np.float32)
    r2 = quaternion_to_matrix(jnp.asarray(q2))
    t2 = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    pts = jnp.asarray(rng.randn(4, 100, 3).astype(np.float32))

    seq = transform_points(transform_points(pts, r2, t2), r1, t1)
    rc, tc = compose_pose(r1, t1, r2, t2)
    np.testing.assert_allclose(
        np.asarray(transform_points(pts, rc, tc)), np.asarray(seq), atol=1e-4
    )

    ri, ti = invert_pose(rc, tc)
    back = transform_points(transform_points(pts, rc, tc), ri, ti)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_chamfer_matches_reference_cd(rng):
    """CD_Dis oracle (ref models/DCL_Net.py:307-311)."""
    a = rng.randn(2, 50, 3).astype(np.float32)
    b = rng.randn(2, 50, 3).astype(np.float32)
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1) ** 0.5
    expect = 0.5 * (d.min(2) + d.min(1))
    got = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expect, atol=1e-4)

    l2 = np.asarray(l2_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(l2, np.linalg.norm(a - b, axis=-1), atol=1e-5)


def test_ortho9d_grad_near_degenerate(rng):
    """SVD gradients must stay finite for nearly-collinear raw vectors
    (SURVEY §7 hard part: torch.svd grad stability near-degenerate sigma)."""
    x = np.array([[1.0, 0.0, 0.0]], np.float32)
    y = np.array([[1.0, 1e-4, 0.0]], np.float32)   # nearly collinear with x
    z = np.array([[1.0, 0.0, 1e-4]], np.float32)

    def loss(v):
        x_, y_, z_ = v[:, :3], v[:, 3:6], v[:, 6:]
        r = ortho9d_to_matrix(x_, y_, z_)
        return jnp.sum(r * jnp.asarray([[1.0, 0.5, -0.3]]))

    import jax

    v = jnp.asarray(np.concatenate([x, y, z], axis=1))
    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    # exactly-degenerate (repeated vector) must not NaN either
    v2 = jnp.asarray(np.concatenate([x, x, z], axis=1))
    g2 = jax.grad(loss)(v2)
    assert np.isfinite(np.asarray(g2)).all()
