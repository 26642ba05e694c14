#!/usr/bin/env python
"""Characterize the TPU tunnel + on-device scatter for the gated-gate IO plan.

Questions this answers (12.5M-point scale):
  1. upload bandwidth: flat uint32 (569 MB), (n,3) f32 (150 MB), and
     whether re-upload of the same bytes differs;
  2. fetch bandwidth: an UPLOADED flat array vs a JIT-OUTPUT flat array
     (the classify fetch reads jit outputs — measured far below the
     documented ~400 MB/s probe number);
  3. sorted-unique scatter-add throughput into a 142M-word grid — the
     primitive that would let the occupancy pack run ON DEVICE (upload
     12.5M indices = 50 MB instead of the 569 MB dense grid);
  4. chunk-gather reconstruction: rebuild the dense grid from nonzero
     chunks with a row gather (the no-scatter alternative).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N_WORDS = 142_144_080
N_PTS = 12_500_000


def t(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {np.median(ts):.3f}s", flush=True)


rng = np.random.default_rng(0)

# --- uploads -------------------------------------------------------------
grid = rng.integers(0, 2**32, size=N_WORDS, dtype=np.uint32)
t("upload flat 569MB uint32", lambda: jnp.asarray(grid), reps=2)
pts = rng.normal(size=(N_PTS, 3)).astype(np.float32)
t("upload (12.5M,3) f32 150MB", lambda: jnp.asarray(pts), reps=2)
col = np.ascontiguousarray(pts[:, 0])
t("upload flat 50MB f32", lambda: jnp.asarray(col), reps=3)

# --- fetches -------------------------------------------------------------
dev_flat = jnp.asarray(col)
t("fetch uploaded flat 50MB", lambda: np.asarray(dev_flat), reps=3)
f = jax.jit(lambda x: x * 2.0 + 1.0)
out = f(dev_flat)
t("fetch jit-output flat 50MB", lambda: np.asarray(f(dev_flat)), reps=3)
dev_pts = jnp.asarray(pts)
g = jax.jit(lambda x: x + 1.0)
t("fetch jit-output (12.5M,3)", lambda: np.asarray(g(dev_pts)), reps=2)
gc = jax.jit(lambda x: (x[:, 0] + 1.0, x[:, 1] + 1.0, x[:, 2] + 1.0))
t("fetch jit-output 3 cols", lambda: [np.asarray(c) for c in gc(dev_pts)], reps=2)

# --- device scatter-add (sorted unique indices) --------------------------
idx = np.sort(rng.choice(N_WORDS, size=N_PTS, replace=False)).astype(np.int32)
val = (np.uint32(1) << rng.integers(0, 32, size=N_PTS).astype(np.uint32))
idx_d, val_d = jnp.asarray(idx), jnp.asarray(val)


@jax.jit
def scatter_add(i, v):
    z = jnp.zeros(N_WORDS, jnp.uint32)
    return z.at[i].add(v, unique_indices=True, indices_are_sorted=True)


t("scatter-add 12.5M sorted-unique -> 142M", lambda: scatter_add(idx_d, val_d), reps=2)


# --- chunk-gather reconstruction ----------------------------------------
CHUNK = 1024
n_chunks = -(-N_WORDS // CHUNK)
occupied = np.zeros(n_chunks, bool)
occupied[rng.choice(n_chunks, size=n_chunks // 3, replace=False)] = True
n_occ = int(occupied.sum())
payload = rng.integers(0, 2**32, size=(n_occ + 1, CHUNK), dtype=np.uint32)
cmap = np.zeros(n_chunks, np.int32)  # 0 = the all-zero chunk at row 0
cmap[occupied] = 1 + np.arange(n_occ, dtype=np.int32)
payload_d, cmap_d = jnp.asarray(payload), jnp.asarray(cmap)


@jax.jit
def reconstruct(p, m):
    return p[m].reshape(-1)[:N_WORDS]


t(f"chunk-gather rebuild ({n_occ}/{n_chunks} chunks)",
  lambda: reconstruct(payload_d, cmap_d), reps=2)
t("upload payload 1/3 (190MB)", lambda: jnp.asarray(payload), reps=2)
