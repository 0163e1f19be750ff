"""SE(3) pose utilities: numpy (dataset-side) + jnp (model-side).

Re-design of reference detectron2/geometry/pose_utils.py:7-145. The jnp
variants are functional (no in-place eye mutation) and batch-first.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# numpy side (used by dataset indexing: OXTS GPS → SE(3))
# ---------------------------------------------------------------------------


def rotx_np(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty_np(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz_np(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


OxtsPacket = namedtuple(
    "OxtsPacket",
    "lat, lon, alt, "
    "roll, pitch, yaw, "
    "vn, ve, vf, vl, vu, "
    "ax, ay, az, af, al, au, "
    "wx, wy, wz, wf, wl, wu, "
    "pos_accuracy, vel_accuracy, "
    "navstat, numsats, "
    "posmode, velmode, orimode",
)


def pose_from_oxts_packet_np(raw_data, scale: float):
    """Mercator-projected SE(3) pose from a KITTI OXTS packet
    (reference pose_utils.py:46-81)."""
    packet = OxtsPacket(*raw_data)
    er = 6378137.0  # earth radius (approx.) in meters

    tx = scale * packet.lon * np.pi * er / 180.0
    ty = scale * er * np.log(np.tan((90.0 + packet.lat) * np.pi / 360.0))
    tz = packet.alt
    t = np.array([tx, ty, tz])

    R = rotz_np(packet.yaw) @ roty_np(packet.pitch) @ rotx_np(packet.roll)
    return R, t


def T_from_R_t_np(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    R = R.reshape(3, 3)
    t = t.reshape(3, 1)
    return np.vstack((np.hstack([R, t]), [0, 0, 0, 1]))


def invert_pose_np(T: np.ndarray) -> np.ndarray:
    Tinv = np.copy(T)
    R, t = Tinv[:3, :3], Tinv[:3, 3]
    Tinv[:3, :3], Tinv[:3, 3] = R.T, -np.matmul(R.T, t)
    return Tinv


# ---------------------------------------------------------------------------
# jnp side (model-side, differentiable)
# ---------------------------------------------------------------------------


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles [B,3] (x,y,z) → rotation matrices [B,3,3]
    (reference pose_utils.py:98-127: R = Rx @ Ry @ Rz)."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    cz, sz = jnp.cos(z), jnp.sin(z)
    zmat = jnp.stack([cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1).reshape(-1, 3, 3)

    cy, sy = jnp.cos(y), jnp.sin(y)
    ymat = jnp.stack([cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1).reshape(-1, 3, 3)

    cx, sx = jnp.cos(x), jnp.sin(x)
    xmat = jnp.stack([ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1).reshape(-1, 3, 3)

    return xmat @ ymat @ zmat


def pose_vec2mat(vec: jnp.ndarray) -> jnp.ndarray:
    """6-DoF vector [B,6] (tx,ty,tz,rx,ry,rz) → [B,4,4] SE(3)
    (reference pose_utils.py:130-137)."""
    B = vec.shape[0]
    trans = vec[:, :3, None]  # [B,3,1]
    rot_mat = euler2mat(vec[:, 3:])  # [B,3,3]
    top = jnp.concatenate([rot_mat, trans], axis=2)  # [B,3,4]
    bottom = jnp.tile(jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=vec.dtype), (B, 1, 1))
    return jnp.concatenate([top, bottom], axis=1)


def invert_pose(T: jnp.ndarray) -> jnp.ndarray:
    """Invert [B,4,4] SE(3) poses (reference pose_utils.py:140-145)."""
    R = T[:, :3, :3]
    t = T[:, :3, 3:]
    Rt = jnp.swapaxes(R, -2, -1)
    new_t = -Rt @ t
    top = jnp.concatenate([Rt, new_t], axis=2)
    bottom = jnp.tile(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=T.dtype), (T.shape[0], 1, 1)
    )
    return jnp.concatenate([top, bottom], axis=1)
