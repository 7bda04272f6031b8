"""Parameter blocks, tangent-space layout, and retraction.

Replaces two pieces of the reference's Ceres plumbing with one mechanism:

* ``LieLocalParameterization`` (reference include/OpenCameraCalibrator/
  basalt_spline/ceres_local_param.h:73-115) — quaternion blocks are updated
  by right-multiplication with ``exp(delta)`` via a manifold tag.
* ``SetFixedParams`` constant/variable block bookkeeping
  (spline_trajectory_estimator.impl.h:92-252) — fixing is a static 0/1
  mask over the global tangent vector; fixed coordinates get zero rows/
  columns in the normal equations and an identity diagonal, so one compiled
  solver serves every flag combination without retracing.

Parameters are a flat ``dict[str, jnp.ndarray]``. Each block has a static
``BlockSpec`` describing its shape and manifold. The global tangent vector
concatenates per-block tangents in spec order.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openimucameracalibrator_tpu.ops import lie


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One named parameter block.

    manifold:
      * ``euclidean`` — shape (..., d), tangent dim = prod(shape)
      * ``quat``      — shape (..., 4) unit quaternions, tangent (..., 3)
                        with retraction q ⊞ δ = q ⊗ exp(δ)
    """

    name: str
    shape: tuple
    manifold: str = "euclidean"

    @property
    def tangent_shape(self) -> tuple:
        if self.manifold == "quat":
            assert self.shape[-1] == 4, self.shape
            return self.shape[:-1] + (3,)
        return self.shape

    @property
    def tangent_size(self) -> int:
        return int(np.prod(self.tangent_shape)) if self.tangent_shape else 1


class BlockLayout:
    """Static layout of a set of blocks inside one global tangent vector."""

    def __init__(self, specs: Sequence[BlockSpec]):
        self.specs = tuple(specs)
        self.by_name = {s.name: s for s in self.specs}
        offsets = {}
        off = 0
        for s in self.specs:
            offsets[s.name] = off
            off += s.tangent_size
        self.offsets: Dict[str, int] = offsets
        self.tangent_dim: int = off

    def slice_of(self, name: str) -> slice:
        off = self.offsets[name]
        return slice(off, off + self.by_name[name].tangent_size)

    def retract(self, params: Dict[str, jax.Array], delta: jax.Array) -> Dict[str, jax.Array]:
        """params ⊞ delta for the full tangent vector delta (D,)."""
        out = {}
        for s in self.specs:
            d = delta[self.slice_of(s.name)].reshape(s.tangent_shape)
            p = params[s.name]
            if s.manifold == "quat":
                out[s.name] = lie.quat_boxplus(p, d.astype(p.dtype))
            else:
                out[s.name] = p + d.astype(p.dtype)
        return out

    def free_mask(self, fixed: Iterable[str] = (), partial_masks: Dict[str, np.ndarray] | None = None) -> jax.Array:
        """(D,) mask, 1.0 for free tangent coords, 0.0 for fixed.

        ``fixed`` names whole blocks; ``partial_masks`` maps block name to a
        0/1 array of the block's tangent shape for finer control.
        """
        fixed = set(fixed)
        mask = np.ones(self.tangent_dim, dtype=np.float64)
        for s in self.specs:
            if s.name in fixed:
                mask[self.slice_of(s.name)] = 0.0
        if partial_masks:
            for name, m in partial_masks.items():
                mask[self.slice_of(name)] = np.asarray(m, dtype=np.float64).reshape(-1)
        return jnp.asarray(mask)

    def global_indices(self, name: str, element_idx: jax.Array) -> jax.Array:
        """Global tangent indices of element(s) of a 2D block (n_elems, td).

        For a block of shape (K, d) (or (K, 4) quats), returns the td
        consecutive global indices of row ``element_idx`` — used by the
        structured normal-equation assembler to scatter per-measurement
        Jacobian blocks.
        """
        s = self.by_name[name]
        td = s.tangent_shape[-1]
        base = self.offsets[name] + element_idx * td
        return base[..., None] + jnp.arange(td, dtype=element_idx.dtype)
