"""Rotation representations and conversions (pure jnp, jit-safe).

TPU-native re-implementation of the reference rotation utilities:
- ``normalize_vector``: reference utils/transform3D.py:6-30 (the only one the
  model uses, via ortho9d2matrix at models/DCL_Net.py:15-36).
- ortho-6D: reference utils/rotation.py:28-39 / utils/transform3D.py:51-72.
- ortho-9D -> SO(3) via SVD with determinant sign fix: reference
  models/DCL_Net.py:15-36. jnp.linalg.svd is native on TPU so the projection
  stays inside the compiled graph (no host round-trip).
- quaternion/axis-angle/euler converters: reference utils/transform3D.py:74-152.

All functions are batched over a leading batch dimension where it makes sense
and are differentiable (SVD gradients included).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def normalize_vector(v: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize the last axis with a magnitude floor (ref transform3D.py:6-30)."""
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(mag, eps)


def cross_product(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product (ref transform3D.py:31-50)."""
    return jnp.cross(u, v)


def ortho6d_to_matrix(x_raw: jnp.ndarray, y_raw: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D rotation representation (ref utils/rotation.py:28-39,
    utils/transform3D.py:51-72 — both use the same Y-FIRST scheme:
    y = norm(y_raw), z = norm(x_raw x y), x = y x z).

    Args:
      x_raw, y_raw: [..., 3]
    Returns:
      [..., 3, 3] rotation matrices whose COLUMNS are the orthonormal frame,
      matching the reference's ``torch.cat((x,y,z), 2)`` column stacking;
      verified against the reference's own imported code
      (tests/test_golden_reference.py).
    """
    y = normalize_vector(y_raw)
    z = normalize_vector(jnp.cross(x_raw, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)


def ortho9d_to_matrix(
    x_raw: jnp.ndarray, y_raw: jnp.ndarray, z_raw: jnp.ndarray
) -> jnp.ndarray:
    """9D -> SO(3) by SVD orthogonalization (ref models/DCL_Net.py:15-36).

    Normalizes the three raw 3-vectors, stacks them as matrix columns, and
    projects to the closest rotation: M = U diag(1, 1, det(U V^T)) V^T.

    Args:
      x_raw, y_raw, z_raw: [B, 3]
    Returns:
      [B, 3, 3] rotation matrices (det +1).
    """
    x = normalize_vector(x_raw)
    y = normalize_vector(y_raw)
    z = normalize_vector(z_raw)
    m = jnp.stack([x, y, z], axis=-1)  # [B, 3, 3], columns = x,y,z
    # 3x3 pose math must run in true f32: TPU matmuls default to bf16 inputs.
    ein = lambda eq, *ops: jnp.einsum(eq, *ops, precision=jax.lax.Precision.HIGHEST)
    u, _, vh = jnp.linalg.svd(m.astype(jnp.float32))
    det = jnp.linalg.det(ein("bij,bjk->bik", u, vh))
    sigma = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # [B, 3]
    r = ein("bij,bj,bjk->bik", u, sigma, vh)
    # JAX's batched f32 SVD is only ~1e-3 orthogonal; two Newton-Schulz steps
    # (quadratic convergence) polish R to machine-precision SO(3) while
    # staying differentiable and preserving det +1.
    eye = jnp.eye(3, dtype=r.dtype)
    for _ in range(2):
        rtr = ein("bji,bjk->bik", r, r)
        r = 0.5 * ein("bij,bjk->bik", r, 3.0 * eye - rtr)
    return r


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (ref transform3D.py:74-99)."""
    q = normalize_vector(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the 4-candidate construction (stable for all traces) instead of the
    single-branch trace formula, so it is safe under jit/vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _normalize_sign(q):
        return q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))

    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)

    traces = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
         1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return _normalize_sign(normalize_vector(q))


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula (ref transform3D.py:100-119). axis [...,3], angle [...]"""
    axis = normalize_vector(axis)
    s, c = jnp.sin(angle)[..., None, None], jnp.cos(angle)[..., None, None]
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(kx)
    k = jnp.stack(
        [zeros, -kz, ky, kz, zeros, -kx, -ky, kx, zeros], axis=-1
    ).reshape(axis.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    return eye + s * k + (1 - c) * (k @ k)


def euler_to_matrix(ai: jnp.ndarray, aj: jnp.ndarray, ak: jnp.ndarray) -> jnp.ndarray:
    """Euler sxyz (static frame x->y->z) to matrix; matches transforms3d.euler2mat
    as used by the reference's SE(3) train augmentation
    (reference YCBV/dataloader_train_YCBV.py:162-165)."""
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    row0 = jnp.stack([cj * ck, sj * sc - cs, sj * cc + ss], axis=-1)
    row1 = jnp.stack([cj * sk, sj * ss + cc, sj * cs - sc], axis=-1)
    row2 = jnp.stack([-sj, cj * si, cj * ci], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def random_rotation(key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
    """Uniform random rotations via normalized Gaussian quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return quaternion_to_matrix(q)


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (w, x, y, z) so that R(q1 q2) = R(q1) R(q2)
    (ref utils/rotation.py quaternion composition helpers)."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quaternion_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def translate_rotate(points: jnp.ndarray, trans: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Translate then rotate: (p + t) @ R^T (ref utils/transform3D.py:120-152
    translate_rotate helper)."""
    return jnp.einsum("...nj,...kj->...nk", points + trans[..., None, :], rot)
