"""Correspondence engine: the `CorrPts` component (API parity with
/root/reference/python/simpleicp/corrpts.py:14-237).

Inside the jitted pipeline, matching and rejection are fused into the
while_loop body (models/icp.py) — this class is the *interactive* surface
for users who drive the stages manually like the reference allows:
match two point clouds, inspect/reject correspondences, export them.
Compute runs on device through the same kernels as the pipeline; state
(index arrays, distances) lives host-side like the reference's DataFrames.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ops.stats import masked_mad, masked_median
from .utils.xyz_io import write_correspondences_xyz


class CorrPtsException(Exception):
    """Raised when CorrPts is used out of order (e.g. reject before match)."""


class CorrPts:
    """Correspondences between two point clouds.

    Args:
        pc1: fixed cloud (must have normals estimated for point-to-plane
            distances — `estimate_normals` or user-supplied columns).
        pc2: movable cloud.
    """

    def __init__(self, pc1, pc2) -> None:
        self.pc1 = pc1
        self.pc2 = pc2
        self.idx_pc1: Optional[np.ndarray] = None  # indices into pc1
        self.idx_pc2: Optional[np.ndarray] = None  # indices into pc2
        self.point_to_plane_distances: Optional[np.ndarray] = None

    # -- per-side accessors (reference corrpts.py:30-122) ------------------
    @property
    def num_corr_pts(self) -> int:
        return 0 if self.idx_pc1 is None else len(self.idx_pc1)

    @property
    def X1(self) -> np.ndarray:
        return self.pc1.X[self.idx_pc1]

    @property
    def X2(self) -> np.ndarray:
        return self.pc2.X[self.idx_pc2]

    @property
    def normals1(self) -> np.ndarray:
        return np.column_stack(
            [self.pc1["nx"][self.idx_pc1], self.pc1["ny"][self.idx_pc1],
             self.pc1["nz"][self.idx_pc1]]
        )

    @property
    def planarity1(self) -> np.ndarray:
        return np.asarray(self.pc1["planarity"])[self.idx_pc1]

    # -- pipeline stages (reference corrpts.py:124-211) --------------------
    def match(self) -> None:
        """NN of each selected pc1 point among the selected pc2 points
        (/root/reference/python/simpleicp/corrpts.py:124-137), plus signed
        point-to-plane distances when pc1 carries normals."""
        from .ops.knn import nn_search

        idx1 = self.pc1.idx_selected
        idx2 = self.pc2.idx_selected
        _, nn = nn_search(self.pc1.X[idx1], self.pc2.X[idx2])
        self.idx_pc1 = idx1
        self.idx_pc2 = idx2[np.asarray(nn)]
        if "nx" in self.pc1:
            self.__compute_point_to_plane_distances()

    def __compute_point_to_plane_distances(self) -> None:
        # d_i = (p2 - p1) . n1 (/root/reference/python/simpleicp/corrpts.py:195-211)
        d = np.einsum("ij,ij->i", self.X2 - self.X1, self.normals1)
        self.point_to_plane_distances = d

    def _require_matched(self) -> None:
        if self.idx_pc1 is None:
            raise CorrPtsException("match() must be called first.")

    def _keep(self, keep: np.ndarray) -> None:
        self.idx_pc1 = self.idx_pc1[keep]
        self.idx_pc2 = self.idx_pc2[keep]
        if self.point_to_plane_distances is not None:
            self.point_to_plane_distances = self.point_to_plane_distances[keep]

    def reject_wrt_planarity(self, min_planarity: float) -> None:
        """Drop correspondences whose planarity is below the threshold.

        Like the reference, the gate checks BOTH clouds' `planarity` columns,
        each one only if present, and is a no-op for a cloud without the
        column (/root/reference/python/simpleicp/corrpts.py:139-163).
        """
        self._require_matched()
        if "planarity" in self.pc1:
            self._keep(self.planarity1 >= min_planarity)
        if "planarity" in self.pc2:
            pl2 = np.asarray(self.pc2["planarity"])[self.idx_pc2]
            self._keep(pl2 >= min_planarity)

    def reject_wrt_point_to_plane_distances(self, mad_scale: float = 1.4826,
                                            factor: float = 3.0) -> None:
        """Drop correspondences outside median ± factor·(mad_scale·MAD)
        (/root/reference/python/simpleicp/corrpts.py:165-188; scale default
        1.4826 follows the documented/majority behavior — SURVEY.md Q1)."""
        self._require_matched()
        if self.point_to_plane_distances is None:
            raise CorrPtsException(
                "point-to-plane distances unavailable: pc1 has no normals."
            )
        import jax.numpy as jnp

        d = jnp.asarray(self.point_to_plane_distances)
        mask = jnp.ones(d.shape[0], bool)
        med = float(masked_median(d, mask))
        sigma = float(masked_mad(d, mask, scale=mad_scale))
        keep = np.abs(self.point_to_plane_distances - med) <= factor * sigma
        self._keep(keep)

    def reject_wrt_to_angle_between_normals(
        self, max_angle_deg: Optional[float] = None
    ) -> None:
        """Zero-argument call: declared but not implemented, like the
        reference (/root/reference/python/simpleicp/corrpts.py:190-193).

        TPU-build extension: pass `max_angle_deg` to actually reject by the
        angle between the matched points' normal vectors (both clouds must
        carry nx/ny/nz — run `estimate_normals` on each first). Normal
        orientation from a plane fit is sign-ambiguous, so the angle is
        measured between LINES (|n1·n2|, folding to [0°, 90°])."""
        if max_angle_deg is None:
            raise NotImplementedError
        self._require_matched()
        for pc, name in ((self.pc1, "pc1"), (self.pc2, "pc2")):
            if "nx" not in pc:
                raise CorrPtsException(
                    f"{name} has no normals: call estimate_normals first."
                )
        n2 = np.column_stack(
            [self.pc2["nx"][self.idx_pc2], self.pc2["ny"][self.idx_pc2],
             self.pc2["nz"][self.idx_pc2]]
        )
        cos = np.abs(np.einsum("ij,ij->i", self.normals1, n2))
        self._keep(cos >= np.cos(np.radians(max_angle_deg)))

    def write_xyz(self, path) -> None:
        """CloudCompare-compatible export
        (/root/reference/python/simpleicp/corrpts.py:213-237)."""
        self._require_matched()
        d = self.point_to_plane_distances
        if d is None:
            d = np.zeros(self.num_corr_pts)
        write_correspondences_xyz(path, self.X1, self.X2, d)
