"""Random camera / object pose sampling.

Two paths:

  * `ReferencePoseSampler` -- host-side, driven by Python's `random` module,
    reproducing the reference's sample stream *bit-exactly* (same call order,
    same arithmetic) for all three distribution flavors:
      - "kitti_v2": utils/utils.py:121-156
      - "coco":     utils/utils_coco.py:121-154
      - "legacy":   utils/utils copy.py:121-152
    Use for parity testing and reference-compatible dataset regeneration.

  * `random_pose_jax` -- counter-based jax.random sampler of the same
    distributions, fully jittable/vmappable; the production path (pose
    streams are order-independent, so generation shards freely over a mesh).

Both return (axisangle [3], translation [3]); convert with
`mpiflow_tpu.geom.transformation_from_parameters`.
"""
from __future__ import annotations

import math
import random as pyrandom
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _sample_reference_params(rng: pyrandom.Random, flavor: str, ext_cz: float,
                             base_motions: Tuple[float, float, float]):
    """One draw of (angles[3], translation[3]) with the reference's call order."""
    scx = (-1) ** rng.randrange(2)
    scy = (-1) ** rng.randrange(2)
    scz = (-1) ** rng.randrange(2)

    if flavor == "kitti_v2":
        # utils/utils.py:126-131 -- z forward-biased for camera motion,
        # all axes halved for object motion (base 0).
        if base_motions[0] == 0.1:
            scz = -1
        else:
            scx, scy, scz = scx * 0.5, scy * 0.5, scz * 0.5
        cx = (rng.random() * 0.1 + base_motions[0]) * scx
        cy = (rng.random() * 0.1 + base_motions[1]) * scy
        cz = (rng.random() * ext_cz + base_motions[2]) * scz
        trans = [cx, cy, cz]
        sax = (-1) ** rng.randrange(2)
        say = (-1) ** rng.randrange(2)
        saz = (-1) ** rng.randrange(2)
        ax = (rng.random() * math.pi / 36.0) * sax
        ay = (rng.random() * math.pi / 36.0) * say
        az = (rng.random() * math.pi / 36.0) * saz
        ang = [ax * 0.4, ay * 0.4, az * 0.4]
    elif flavor == "coco":
        # utils/utils_coco.py:121-147 -- no z bias for translation; *angle*
        # signs are halved unless base==0.05; final angle scale 0.5.
        cx = (rng.random() * 0.1 + base_motions[0]) * scx
        cy = (rng.random() * 0.1 + base_motions[1]) * scy
        cz = (rng.random() * 0.1 + base_motions[2]) * scz
        trans = [cx, cy, cz]
        sax = (-1) ** rng.randrange(2)
        say = (-1) ** rng.randrange(2)
        saz = (-1) ** rng.randrange(2)
        if base_motions[0] != 0.05:
            sax, say, saz = sax * 0.5, say * 0.5, saz * 0.5
        ax = (rng.random() * math.pi / 36.0) * sax
        ay = (rng.random() * math.pi / 36.0) * say
        az = (rng.random() * math.pi / 36.0) * saz
        ang = [ax * 0.5, ay * 0.5, az * 0.5]
    elif flavor == "legacy":
        # utils/utils copy.py:121-152 -- forward bias keyed on base==0.05,
        # x/y translation scaled by 0.3, angle scale 0.2.
        if base_motions[0] == 0.05:
            scz = -1
        else:
            scx, scy, scz = scx * 0.5, scy * 0.5, scz * 0.5
        cx = (rng.random() * 0.1 + base_motions[0]) * scx
        cy = (rng.random() * 0.1 + base_motions[1]) * scy
        cz = (rng.random() * 0.1 + base_motions[2]) * scz
        trans = [cx * 0.3, cy * 0.3, cz]
        sax = (-1) ** rng.randrange(2)
        say = (-1) ** rng.randrange(2)
        saz = (-1) ** rng.randrange(2)
        if base_motions[0] != 0.05:
            sax, say, saz = sax * 0.5, say * 0.5, saz * 0.5
        ax = (rng.random() * math.pi / 36.0) * sax
        ay = (rng.random() * math.pi / 36.0) * say
        az = (rng.random() * math.pi / 36.0) * saz
        ang = [ax * 0.2, ay * 0.2, az * 0.2]
    else:
        raise ValueError(f"unknown pose flavor: {flavor}")
    return np.array(ang, dtype=np.float32), np.array(trans, dtype=np.float64)


def sample_pose_params(rng: pyrandom.Random, flavor: str = "kitti_v2",
                       ext_cz: float = 0.15,
                       base_motions: Tuple[float, float, float] = (0.1, 0.1, 0.1)):
    """Functional single draw; see `_sample_reference_params`."""
    return _sample_reference_params(rng, flavor, ext_cz, base_motions)


class ReferencePoseSampler:
    """Stateful sampler reproducing the reference RNG stream.

    The reference seeds `random.seed(opt.seed)` and `np.random.seed(opt.seed)`
    once (gen_3dphoto_dynamic_v2.py:38-39), then per (image, repeat):
      1. one np.random.randint(mask.max()) draw for the object instance id
      2. generate_random_pose(ext_cz)                   -> camera motion pose
      3. generate_random_pose(ext_cz, base=[0,0,0])     -> object motion pose
    (utils/utils.py:207-208 -- note `cam_ext_dynamic` is drawn FIRST).
    """

    #: camera-motion base per flavor (the reference functions' defaults:
    #: utils/utils.py:121, utils_coco.py:121, utils copy.py:121)
    FLAVOR_BASE = {"kitti_v2": (0.1, 0.1, 0.1), "coco": (0.1, 0.1, 0.1),
                   "legacy": (0.05, 0.05, 0.05)}

    def __init__(self, seed: int, flavor: str = "kitti_v2", ext_cz: float = 0.15,
                 base_motions: Optional[Tuple[float, float, float]] = None):
        self.flavor = flavor
        self.ext_cz = ext_cz
        self.base_motions = tuple(base_motions if base_motions is not None
                                  else self.FLAVOR_BASE[flavor])
        self._py = pyrandom.Random()
        self._py.seed(seed)
        self._np = np.random.RandomState(seed)

    def object_index(self, mask_max: int) -> int:
        """np.random.randint(mask.max()) + 1 (gen_3dphoto_dynamic_v2.py:101)."""
        return int(self._np.randint(mask_max)) + 1

    def sample_pair(self):
        """Returns ((ang_cam, t_cam), (ang_obj, t_obj)) for one repeat."""
        cam = _sample_reference_params(self._py, self.flavor, self.ext_cz,
                                       self.base_motions)
        obj = _sample_reference_params(self._py, self.flavor, self.ext_cz,
                                       (0.0, 0.0, 0.0))
        return cam, obj


def random_pose_jax(key: jax.Array, flavor: str = "kitti_v2", ext_cz: float = 0.15,
                    base_motions: Tuple[float, float, float] = (0.1, 0.1, 0.1)):
    """Jittable sampler of the same pose distributions using jax.random.

    Returns (axisangle [3] f32, translation [3] f32). Not bit-identical to the
    host stream (different RNG), but identically distributed.
    """
    k_sc, k_c, k_sa, k_a = jax.random.split(key, 4)
    sc = 1.0 - 2.0 * jax.random.bernoulli(k_sc, 0.5, (3,)).astype(jnp.float32)
    sa = 1.0 - 2.0 * jax.random.bernoulli(k_sa, 0.5, (3,)).astype(jnp.float32)
    u_c = jax.random.uniform(k_c, (3,))
    u_a = jax.random.uniform(k_a, (3,))
    base = jnp.asarray(base_motions, jnp.float32)
    is_base_obj = base_motions[0] not in (0.1, 0.05)  # static python branch

    if flavor == "kitti_v2":
        if base_motions[0] == 0.1:
            sc = sc.at[2].set(-1.0)
        else:
            sc = sc * 0.5
        scale = jnp.array([0.1, 0.1, ext_cz], jnp.float32)
        trans = (u_c * scale + base) * sc
        ang = (u_a * (math.pi / 36.0)) * sa * 0.4
    elif flavor == "coco":
        trans = (u_c * 0.1 + base) * sc
        if base_motions[0] != 0.05:
            sa = sa * 0.5
        ang = (u_a * (math.pi / 36.0)) * sa * 0.5
    elif flavor == "legacy":
        if base_motions[0] == 0.05:
            sc = sc.at[2].set(-1.0)
        else:
            sc = sc * 0.5
        trans = (u_c * 0.1 + base) * sc
        trans = trans * jnp.array([0.3, 0.3, 1.0], jnp.float32)
        if base_motions[0] != 0.05:
            sa = sa * 0.5
        ang = (u_a * (math.pi / 36.0)) * sa * 0.2
    else:
        raise ValueError(f"unknown pose flavor: {flavor}")
    del is_base_obj
    return ang.astype(jnp.float32), trans.astype(jnp.float32)


def gen_swing_path(num_frames: int = 90, r_x: float = 0.14, r_y: float = 0.0,
                   r_z: float = 0.10) -> np.ndarray:
    """Sinusoidal camera path [num_frames,4,4] (utils/utils.py:55-62).

    Only frame 0 (identity) is consumed by the generation pipeline
    (utils/utils.py:180-181); kept for the swing-video capability.
    """
    t = np.arange(num_frames, dtype=np.float32) / (num_frames - 1)
    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    poses[:, 0, 3] = r_x * np.sin(2.0 * math.pi * t)
    poses[:, 1, 3] = r_y * np.cos(2.0 * math.pi * t)
    poses[:, 2, 3] = r_z * (np.cos(2.0 * math.pi * t) - 1.0)
    return poses
