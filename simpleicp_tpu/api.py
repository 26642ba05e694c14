"""Reference-parity object API: `PointCloud` and `SimpleICP`.

Mirrors the reference Python public surface
(/root/reference/python/simpleicp/__init__.py:12-14): a `PointCloud`
container with selection state and geometry ops, and a `SimpleICP` driver
whose `run()` signature, argument validation, exceptions, logging output and
return values match /root/reference/python/simpleicp/simpleicp.py:75-324 —
but whose compute is the jitted TPU pipeline in `models/icp.py` (one device
launch instead of a host loop). The container is a struct-of-arrays over
numpy (not a pandas DataFrame — a DataFrame per point attribute is host-side
overhead the TPU design doesn't want), with DataFrame-compatible accessors
for drop-in use.
"""

from __future__ import annotations

import functools
import math
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .config import RBP_NAMES, IcpConfig
from .models import icp as icp_core
from .models.solver import RigidBodyParameters
from .utils.log import enable_verbose_logging, get_logger
from .utils.xyz_io import read_xyz, write_correspondences_xyz, write_xyz

_log = get_logger(__name__)


def _host_rotation(a1: float, a2: float, a3: float) -> np.ndarray:
    """Exact x->y->z Euler rotation, host-side f64
    (/root/reference/python/simpleicp/mathutils.py:39-68)."""
    c1, s1 = np.cos(a1), np.sin(a1)
    c2, s2 = np.cos(a2), np.sin(a2)
    c3, s3 = np.cos(a3), np.sin(a3)
    return np.array([
        [c2 * c3, -c2 * s3, s2],
        [c1 * s3 + s1 * s2 * c3, c1 * c3 - s1 * s2 * s3, -s1 * c2],
        [s1 * s3 - c1 * s2 * c3, s1 * c3 + c1 * s2 * s3, c1 * c2],
    ])


class PointCloudException(Exception):
    """Raised when PointCloud is misused."""


class SimpleICPException(Exception):
    """Raised when SimpleICP is misused or the algorithm cannot proceed."""


class PointCloud:
    """Struct-of-arrays point-cloud container with a selection mask.

    Construction accepts an (n, 3) array, a mapping of column arrays
    (must contain "x", "y", "z"), or a pandas DataFrame (duck-typed). A
    boolean "selected" column is added automatically if missing, like the
    reference (/root/reference/python/simpleicp/pointcloud.py:25-49).
    """

    def __init__(self, data=None, columns: Optional[List[str]] = None) -> None:
        cols: Dict[str, np.ndarray] = {}
        if hasattr(data, "columns") and hasattr(data, "to_numpy"):  # DataFrame
            for name in data.columns:
                cols[str(name)] = np.asarray(data[name].to_numpy())
        elif isinstance(data, dict):
            cols = {k: np.asarray(v) for k, v in data.items()}
        else:
            arr = np.asarray(data, dtype=np.float64)
            if arr.ndim != 2 or arr.shape[1] < 3:
                raise PointCloudException(
                    "PointCloud expects an (n, 3) array, a dict of columns, "
                    "or a DataFrame."
                )
            names = columns if columns is not None else ["x", "y", "z"]
            for j, name in enumerate(names):
                cols[name] = arr[:, j].copy()

        for coordinate in ("x", "y", "z"):
            if coordinate not in cols:
                raise PointCloudException(
                    f'Column "{coordinate}" is missing in DataFrame.'
                )

        self._cols = cols
        self._num_points = len(cols["x"])
        if "selected" not in self._cols:
            self._cols["selected"] = np.ones(self._num_points, dtype=bool)
        else:
            self._cols["selected"] = np.asarray(self._cols["selected"], dtype=bool)

    # -- factory -----------------------------------------------------------
    @classmethod
    def from_xyz(cls, path) -> "PointCloud":
        return cls(read_xyz(path))

    # -- column/dataframe-compatible access --------------------------------
    @property
    def columns(self):
        return list(self._cols.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._cols

    def __getitem__(self, name: str) -> np.ndarray:
        return self._cols[name]

    def __setitem__(self, name: str, value) -> None:
        value = np.asarray(value)
        if value.shape[0] != self._num_points:
            raise PointCloudException(
                f'Column "{name}" has {value.shape[0]} rows, expected '
                f"{self._num_points}."
            )
        self._cols[name] = value.astype(bool) if name == "selected" else value

    def __len__(self) -> int:
        return self._num_points

    # -- coordinate properties (reference pointcloud.py:51-110) ------------
    @property
    def x(self) -> np.ndarray:
        return self._cols["x"]

    @property
    def y(self) -> np.ndarray:
        return self._cols["y"]

    @property
    def z(self) -> np.ndarray:
        return self._cols["z"]

    @property
    def x_selected(self) -> np.ndarray:
        return self._cols["x"][self._cols["selected"]]

    @property
    def y_selected(self) -> np.ndarray:
        return self._cols["y"][self._cols["selected"]]

    @property
    def z_selected(self) -> np.ndarray:
        return self._cols["z"][self._cols["selected"]]

    @property
    def X(self) -> np.ndarray:
        return np.column_stack([self._cols["x"], self._cols["y"], self._cols["z"]])

    @property
    def X_selected(self) -> np.ndarray:
        sel = self._cols["selected"]
        return np.column_stack(
            [self._cols["x"][sel], self._cols["y"][sel], self._cols["z"][sel]]
        )

    @property
    def idx_selected(self) -> np.ndarray:
        return np.where(self._cols["selected"])[0]

    @idx_selected.setter
    def idx_selected(self, indices) -> None:
        self.unselect_all_points()
        self._cols["selected"][np.asarray(indices, dtype=np.int64)] = True

    @property
    def num_points(self) -> int:
        return self._num_points

    @property
    def num_selected_points(self) -> int:
        return int(np.sum(self._cols["selected"]))

    # -- selection ops (reference pointcloud.py:112-171) -------------------
    def select_all_points(self) -> None:
        self._cols["selected"][:] = True

    def unselect_all_points(self) -> None:
        self._cols["selected"][:] = False

    def select_by_indices(self, indices) -> None:
        """Select the intersection of `indices` with the current selection."""
        self.idx_selected = np.intersect1d(self.idx_selected, indices)

    def select_n_points(self, n: int) -> None:
        """Keep n points, equidistant across the currently selected indices."""
        if self.num_selected_points > n:
            idx = np.round(np.linspace(0, self.num_selected_points - 1, n)).astype(int)
            keep = self.idx_selected[idx]
            self.unselect_all_points()
            self._cols["selected"][keep] = True

    def select_in_range(self, X: np.ndarray, max_range: float) -> None:
        """Keep selected points whose NN in X is within max_range (device
        tiled NN kernel instead of a KD-tree; the spatial-hash cell list
        past ~1e12 pairs — see models/icp.py gate resolution)."""
        X = np.asarray(X)
        if X.ndim != 2 or X.shape[1] != 3:
            raise PointCloudException("X must have 3 columns!")
        queries = self.X_selected
        if queries.shape[0] * X.shape[0] > 2**41:
            from .ops.gridhash import grid_cell_cap, min_dist_sq_grid

            cap = grid_cell_cap(X, max_range)
            d2 = np.asarray(
                min_dist_sq_grid(queries, X, max_range, cell_cap=cap)
            )
        else:
            from .ops.knn import min_dist_sq

            d2 = np.asarray(min_dist_sq(queries, X))
        keep = d2 <= float(max_range) ** 2
        idx_new = self.idx_selected[keep]
        self.unselect_all_points()
        self._cols["selected"][idx_new] = True

    # -- geometry (reference pointcloud.py:173-217) ------------------------
    def estimate_normals(self, neighbors: int) -> None:
        """Estimate normals + planarity of the selected points from their
        k-NN neighborhoods in the full cloud; batched on device."""
        from .ops.knn import knn_search
        from .ops.normals import estimate_normals_from_neighborhoods

        X = self.X
        sel = self.idx_selected
        _, idxk = knn_search(X[sel], X, neighbors)
        neigh = np.asarray(X)[np.asarray(idxk)]
        normals, planarity, _ = estimate_normals_from_neighborhoods(neigh)
        normals = np.asarray(normals)
        planarity = np.asarray(planarity)

        for j, name in enumerate(("nx", "ny", "nz")):
            col = np.full(self._num_points, np.nan, dtype=np.float32)
            col[sel] = normals[:, j]
            self._cols[name] = col
        col = np.full(self._num_points, np.nan, dtype=np.float32)
        col[sel] = planarity
        self._cols["planarity"] = col

    def transform_by_H(self, H: np.ndarray) -> None:
        """Apply the 4x4 homogeneous transform in place."""
        H = np.asarray(H)
        X = self.X @ H[:3, :3].T + H[:3, 3]
        self._cols["x"], self._cols["y"], self._cols["z"] = X[:, 0], X[:, 1], X[:, 2]

    def write_xyz(self, file) -> None:
        write_xyz(file, self.X)


class SimpleICP:
    """Driver class: add two clouds, `run()` the registration."""

    def __init__(self, verbose: bool = True) -> None:
        self.pc1: Optional[PointCloud] = None
        self.pc2: Optional[PointCloud] = None
        if verbose:
            enable_verbose_logging()

    def add_point_clouds(self, pc_fix: PointCloud, pc_mov: PointCloud) -> None:
        self.pc1 = pc_fix
        self.pc2 = pc_mov

    def run(
        self,
        correspondences: int = 1000,
        neighbors: int = 10,
        min_planarity: float = 0.3,
        max_overlap_distance: float = np.inf,
        min_change: float = 1.0,
        max_iterations: int = 100,
        distance_weights: Optional[float] = 1,
        rbp_observed_values: Tuple[float, ...] = (0.0,) * 6,
        rbp_observation_weights: Tuple[float, ...] = (0.0,) * 6,
        debug_dirpath: str = "",
        solver: str = "nonlinear",
        mad_scale: float = 1.4826,
        rejection_staging: str = "python",
        std_ddof: int = 0,
        center: bool = True,
        approx_knn: bool = False,
        gate_method: str = "auto",
        match_method: str = "auto",
        match_radius: float = 0.0,
        program_budget_s: float = 30.0,
        dispatch: str = "auto",
        chunk_iterations: int = 0,
        warm_start: bool = False,
        warm_start_points: int = 1_000_000,
        warm_start_correspondences: int = 1000,
        stall_policy: str = "warn",
        mesh=None,
        num_devices: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray, RigidBodyParameters, np.ndarray]:
        """Run the registration. Arguments, defaults, validation, output and
        return values follow /root/reference/python/simpleicp/simpleicp.py:75-133;
        `solver`, `mad_scale`, `rejection_staging`, `std_ddof` and `center`
        are TPU-build extensions (the first four select between the
        reference-family behaviors — SURVEY.md Q1/Q5/Q8); `dispatch` /
        `chunk_iterations` select the device program shape (monolithic vs
        host-chunked K-iteration programs — identical math, bounded device
        time per program; see IcpConfig.dispatch); `warm_start` runs a
        cheap coarse registration on subsampled clouds first and starts
        the full-resolution run from its result (fewer expensive
        iterations, same basin; see IcpConfig.warm_start); `stall_policy`
        ("warn"|"wait") selects what chunked dispatch does when a chunk
        overruns its calibrated estimate inside a degraded accelerator
        window — "wait" holds the next chunk until a health probe
        answers, bit-neutral (see IcpConfig.stall_policy).

        center: shift both clouds by the fixed cloud's centroid before the
            device pipeline and map the result back (exact, host-side f64).
            Georeferenced clouds (UTM-scale coordinates ~1e6 m) would
            otherwise be quantized to ~6 cm by the f32 fast path. Applied
            only when all translation observation weights are zero — a
            translation observation refers to the original frame and cannot
            be expressed as a fixed observation in the shifted frame (the
            reference has no such concern: it always computes in f64, as do
            we under jax x64). Angle observations are unaffected by a pure
            frame translation. The initial transform from observed values is
            mapped exactly: t0' = t0 + R0 c - c.
        mesh / num_devices: run the registration sharded over a
            jax.sharding.Mesh (or over the first `num_devices` devices).
            Same results, same logging contract; the clouds are sharded
            over the mesh's points axis (parallel/sharded.py).

        Returns:
            (H, X_mov_transformed, rbp, distance_residuals)
        """
        if self.pc1 is None or self.pc2 is None:
            raise SimpleICPException(
                "Point clouds must be added with add_point_clouds() before run()."
            )
        self._check_arguments(
            distance_weights, rbp_observed_values, rbp_observation_weights
        )

        start_time = time.time()

        if debug_dirpath:
            _log.info(f'Write debug files to directory "{debug_dirpath}"')
            Path(debug_dirpath).mkdir(parents=True, exist_ok=True)

        # degrees -> radians for the three angles
        # (/root/reference/python/simpleicp/simpleicp.py:145-148)
        obs_vals = np.array(rbp_observed_values, dtype=np.float64)
        obs_vals[:3] *= np.pi / 180.0
        obs_w = np.array(rbp_observation_weights, dtype=np.float64)

        cfg = IcpConfig(
            correspondences=correspondences,
            neighbors=neighbors,
            min_planarity=min_planarity,
            max_overlap_distance=(
                max_overlap_distance if max_overlap_distance is not None else math.inf
            ),
            min_change=min_change,
            max_iterations=max_iterations,
            distance_weights=distance_weights,
            solver=solver,
            mad_scale=mad_scale,
            rejection_staging=rejection_staging,
            std_ddof=std_ddof,
            approx_knn=approx_knn,
            gate_method=gate_method,
            match_method=match_method,
            match_radius=match_radius,
            program_budget_s=program_budget_s,
            dispatch=dispatch,
            chunk_iterations=chunk_iterations,
            warm_start=warm_start,
            warm_start_points=warm_start_points,
            warm_start_correspondences=warm_start_correspondences,
            stall_policy=stall_policy,
            record_trajectory=bool(debug_dirpath),
        )

        if cfg.overlap_enabled:
            _log.info("Consider partial overlap of point clouds ...")
        _log.info("Select points for correspondences in fixed point cloud ...")

        has_normals = {"nx", "ny", "nz", "planarity"}.issubset(set(self.pc1.columns))
        if not has_normals:
            _log.info("Estimate normals of selected points ...")

        # Respect a user-restricted movable selection (reference matches only
        # among selected movable points, corrpts.py:131); a host-side compaction
        # here is static per run.
        mov_sel = self.pc2.idx_selected
        X_mov_sel = self.pc2.X if len(mov_sel) == len(self.pc2) else self.pc2.X[mov_sel]

        # Optional exact host-side centering (see docstring). Active only
        # when no translation observations exist.
        do_center = bool(center) and bool(np.all(obs_w[3:] == 0.0))
        if do_center:
            c = self.pc1.X.mean(axis=0)
            R0 = _host_rotation(*obs_vals[:3])
            obs_vals_run = obs_vals.copy()
            obs_vals_run[3:] = obs_vals[3:] + R0 @ c - c
            Xf_run = self.pc1.X - c
            Xm_run = X_mov_sel - c
        else:
            c = np.zeros(3)
            obs_vals_run = obs_vals
            Xf_run = self.pc1.X
            Xm_run = X_mov_sel

        _log.info("Start iterations ...")
        if mesh is not None or num_devices:
            from .parallel import make_mesh
            from .parallel.sharded import icp_register_sharded

            register = functools.partial(
                icp_register_sharded,
                mesh=mesh if mesh is not None else make_mesh(num_devices),
            )
        else:
            register = icp_core.icp_register
            # Upload staging (round-3 BENCHMARKS "Upload stall"): transfers
            # that follow a program execution run far below the cold rate
            # (23.6 s/cloud at 50M vs ~2-4 s cold; runtime/tunnel artifact,
            # all app-side mitigations A/B'd to failure). Stage BOTH clouds
            # onto the device BEFORE the first dispatch — in particular
            # before a warm start's coarse programs — so every big transfer
            # rides the cold window. jnp.asarray inside icp_register is
            # then a no-op (same dtype, already committed).
            import jax as _jax
            import jax.numpy as _jnp

            # Size-gated: the explicit block_until_ready is a synchronous
            # tunnel barrier (~30 ms) that small runs must not pay — the
            # stall it avoids only bites at multi-GB transfers.
            if (_jax.default_backend() != "cpu"
                    and len(Xf_run) + len(Xm_run) > 4_000_000):
                _dt = (_jnp.float64 if _jax.config.jax_enable_x64
                       else _jnp.float32)
                _t0 = time.time()
                Xf_run, Xm_run = _jax.block_until_ready(
                    _jax.device_put(
                        (np.asarray(Xf_run, _dt), np.asarray(Xm_run, _dt))
                    )
                )
                _log.debug("timing: device preload %.2f s", time.time() - _t0)
        _t_reg = time.time()
        result = register(
            Xf_run,
            Xm_run,
            cfg,
            rbp_observed_values=obs_vals_run,
            rbp_observation_weights=obs_w,
            normals_fix=(
                np.column_stack(
                    [self.pc1["nx"], self.pc1["ny"], self.pc1["nz"]]
                ).astype(np.float64)
                if has_normals
                else None
            ),
            planarity_fix=(
                np.asarray(self.pc1["planarity"], dtype=np.float64)
                if has_normals
                else None
            ),
            # Both-cloud planarity gating when the movable cloud carries it
            # (reference corrpts.py:151-163, SURVEY.md Q5).
            planarity_mov=(
                np.asarray(self.pc2["planarity"], dtype=np.float64)[mov_sel]
                if "planarity" in self.pc2
                else None
            ),
        )
        error = int(result.error_code)
        _log.debug(
            "timing: register (dispatch to error-code readback) %.2f s",
            time.time() - _t_reg,
        )
        _t_post = time.time()
        if error == icp_core.ERR_NO_OVERLAP:
            raise SimpleICPException(
                "Point clouds do not overlap within max_overlap_distance = "
                f"{max_overlap_distance:.5f}! Consider increasing the value of "
                "max_overlap_distance."
            )
        if error == icp_core.ERR_TOO_FEW_CORRESPONDENCES:
            n_bad = int(
                result.iter_counts[max(int(result.n_iterations) - 1, 0)]
            )
            raise SimpleICPException(
                "Too few correspondences! At least 6 correspondences are "
                "needed to estimate the 6 rigid body transformation "
                f"parameters. The current number of correspondences is {n_bad}."
            )

        # Mirror the reference's state mutations: pc1 selection reflects the
        # correspondence selection; pc1 gains normal columns if estimated.
        sel_idx = np.asarray(result.sel_idx)[np.asarray(result.sel_valid)]
        self.pc1.unselect_all_points()
        self.pc1["selected"][sel_idx] = True
        if not has_normals:
            normals = np.asarray(result.normals)
            planarity = np.asarray(result.planarity)
            valid = np.asarray(result.sel_valid)
            for j, name in enumerate(("nx", "ny", "nz")):
                col = np.full(len(self.pc1), np.nan, dtype=np.float32)
                col[sel_idx] = normals[valid, j]
                self.pc1[name] = col
            col = np.full(len(self.pc1), np.nan, dtype=np.float32)
            col[sel_idx] = planarity[valid]
            self.pc1["planarity"] = col

        H = np.array(result.H, dtype=np.float64)  # writable copy
        p_est = np.array(result.p, dtype=np.float64)
        unc = np.asarray(result.uncertainties, dtype=np.float64)
        if do_center:
            # Map back to the original frame: H = T(c) H' T(-c), i.e. the
            # rotation is unchanged and t = t' + c - R c (exact, f64).
            R_est = H[:3, :3]
            H[:3, 3] = H[:3, 3] + c - R_est @ c
            p_est = p_est.copy()
            p_est[3:] = p_est[3:] + c - _host_rotation(*p_est[:3]) @ c
            # Propagate the a-posteriori covariance through the same map so
            # reported sigmas are in the ORIGINAL frame: with lever arm |c|
            # (~1e6 m for UTM clouds) the translation variances pick up
            # rotation-uncertainty terms, J = [[I, 0], [-d(R c)/dalpha, I]].
            # The complex-step derivative of the host rotation is exact.
            Cxx = np.asarray(result.covariance, dtype=np.float64)
            Jmap = np.eye(6)
            h = 1e-200
            for j in range(3):
                a = p_est[:3].astype(complex)
                a[j] += 1j * h
                Jmap[3:, j] = -np.imag(_host_rotation(a[0], a[1], a[2]) @ c) / h
            C_orig = Jmap @ Cxx @ Jmap.T
            vary = np.isfinite(obs_w)
            unc = np.where(
                vary, np.sqrt(np.maximum(np.diag(C_orig), 0.0)), np.nan
            )
        n_done = int(result.n_iterations)
        converged = bool(result.converged)

        # Build the rbp container
        rbp = RigidBodyParameters()
        rbp.set_parameter_attributes_from_list("observed_value", obs_vals)
        rbp.set_parameter_attributes_from_list("observation_weight", obs_w)
        rbp.set_parameter_attributes_from_list("estimated_value", p_est)
        rbp.set_parameter_attributes_from_list("estimated_uncertainty", unc)

        # ---- iteration table replay (reference logging contract) ----
        counts = np.asarray(result.iter_counts)
        means = np.asarray(result.iter_means)
        stds = np.asarray(result.iter_stds)
        _log.info(
            f"{'Iteration':>9s} | "
            f"{'correspondences':>15s} | "
            f"{'mean(residuals)':>15s} | "
            f"{'std(residuals)':>15s}"
        )
        _log.info(
            f"{'orig:0':>9s} | "
            f"{int(result.orig_count):15d} | "
            f"{float(result.orig_mean):15.4f} | "
            f"{float(result.orig_std):15.4f}"
        )
        # The converging iteration's row is withheld (reference Python breaks
        # before printing it, SURVEY.md Q6).
        n_rows = n_done - 1 if converged else n_done
        for i in range(n_rows):
            _log.info(
                f"{i + 1:9d} | {int(counts[i]):15d} | "
                f"{float(means[i]):15.4f} | {float(stds[i]):15.4f}"
            )
        if converged:
            _log.info("Convergence criteria fulfilled -> stop iteration!")

        _log.info("Estimated transformation matrix H:")
        for r in range(4):
            _log.info(
                f"[{H[r, 0]:12.6f} {H[r, 1]:12.6f} "
                f"{H[r, 2]:12.6f} {H[r, 3]:12.6f}]"
            )
        _log.info(
            "... which corresponds to the following rigid-body "
            "transformation parameters:"
        )
        _log.info(
            f"{'parameter':>9s} | "
            f"{'est.value':>15s} | "
            f"{'est.uncertainty':>15s} | "
            f"{'obs.value':>15s} | "
            f"{'obs.weight':>15s}"
        )
        for name in RBP_NAMES:
            param = getattr(rbp, name)
            _log.info(
                f"{name:>9s} | "
                f"{param.estimated_value_scaled:15.6f} | "
                f"{param.estimated_uncertainty_scaled:15.6f} | "
                f"{param.observed_value_scaled:15.6f} | "
                f"{param.observation_weight:15.3e}"
            )
        _log.info(
            "(Unit of est.value, est.uncertainty, and obs.value for "
            "alpha1/2/3 is degree)"
        )

        if debug_dirpath:
            self._write_debug_files(Path(debug_dirpath), result, Xm_run, c, n_done)

        # Apply the final transformation permanently
        # (/root/reference/python/simpleicp/simpleicp.py:316).
        self.pc2.transform_by_H(H)

        residual_mask = np.asarray(result.residual_mask)
        distance_residuals = np.asarray(result.residuals)[residual_mask]

        _log.debug(
            "timing: postprocess (result fetches + host transform) %.2f s",
            time.time() - _t_post,
        )
        _log.info(f"Finished in {time.time() - start_time:.3f} seconds!")
        return H, self.pc2.X, rbp, distance_residuals

    def _write_debug_files(self, dirpath: Path, result, Xm_run: np.ndarray,
                           c: np.ndarray, n_done: int) -> None:
        """Replay the reference's per-iteration CloudCompare debug dumps
        (/root/reference/python/simpleicp/simpleicp.py:141-143,189-200,216-221,
        317-320) from the recorded on-device trajectory. `Xm_run` and the
        recorded trajectory live in the (possibly centered) compute frame;
        adding `c` restores the original frame for the dumped files."""
        from .ops.transform import euler_angles_to_rotation_matrix

        sel_valid = np.asarray(result.sel_valid)
        Qfull = self.pc1.X[np.asarray(result.sel_idx)]  # (C,3), slot-aligned
        write_xyz(dirpath / "iteration000_preoptim_pcfix.xyz", self.pc1.X)

        ps = np.asarray(result.iter_ps)
        midx = np.asarray(result.iter_midx)
        masks = np.asarray(result.iter_masks)
        dists = np.asarray(result.iter_dists)
        p_prev = None
        for it in range(n_done):
            # pre-optim pcmov: movable transformed by the *incoming* H of
            # iteration `it` (the previous iteration's estimate).
            p_in = np.zeros(6) if it == 0 else p_prev
            R = np.asarray(
                euler_angles_to_rotation_matrix(p_in[0], p_in[1], p_in[2])
            )
            Xm_t = Xm_run @ R.T + p_in[3:6] + c
            write_xyz(dirpath / f"iteration{it:03d}_preoptim_pcmov.xyz", Xm_t)
            mask = masks[it] & sel_valid
            write_correspondences_xyz(
                dirpath / f"iteration{it:03d}_preoptim_correspondences.xyz",
                Qfull[mask],
                Xm_t[midx[it][mask]],
                dists[it][mask],
            )
            p_prev = ps[it]

        Hc = np.asarray(result.H)  # compute-frame transform
        Xm_final = Xm_run @ Hc[:3, :3].T + Hc[:3, 3] + c
        write_xyz(
            dirpath / f"iteration{max(n_done - 1, 0):03d}_postoptim_pcmov.xyz",
            Xm_final,
        )

    @staticmethod
    def _check_arguments(distance_weights, rbp_observed_values,
                         rbp_observation_weights) -> None:
        """Argument validation per
        /root/reference/python/simpleicp/simpleicp.py:326-353."""
        if distance_weights is not None and distance_weights <= 0:
            raise SimpleICPException("distance_weights must be > 0.")
        if len(rbp_observed_values) != 6:
            raise SimpleICPException("rbp_observed_values must have exactly 6 elements.")
        if len(rbp_observation_weights) != 6:
            raise SimpleICPException(
                "rbp_observation_weights must have exactly 6 elements."
            )
        if not all(w >= 0 for w in rbp_observation_weights):
            raise SimpleICPException(
                "All elements of rbp_observation_weights must be >= 0."
            )
        if not any(np.isfinite(rbp_observation_weights)):
            raise SimpleICPException(
                "At least one element in rbp_observation_weights must be finite."
            )
