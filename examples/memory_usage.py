#!/usr/bin/env python3
"""Peak-memory estimator for both execution modes.

Analog of reference examples/memory_usage.py:20-44, extended for the TPU
framework's two modes:

* precomputed — packed int32 linear indices + float32 lengths
  (8 B/crossing vs the reference's 3×int64 + float64 = 32 B/crossing);
* fused — crossings re-traced blockwise; peak scales with the block size,
  not the ray count.
"""
import numpy as np

# detector size
npix1, npix2 = 512, 512
# volume size
ntime, nrad, nele, nazi = 1, 32, 16, 32
# observations / channels
nobs, nchan = 25, 2
# fused-mode ray block
block = 8192

volume = (ntime, nrad, nele, nazi)
volume_gb = 4 * np.prod(volume) / 1e9  # float32

nrays = nobs * npix1 * npix2  # channels share geometry
nvox_ray = 2 * (nrad + 1) + 2 * (nele + 1) + (nazi + 1) + 1

# precomputed mode: resident packed tables
lin_gb = 4 * nrays * nvox_ray / 1e9      # int32 linear indices
lens_gb = 4 * nrays * nvox_ray / 1e9     # float32 lengths
# transient gather buffer during the forward pass
values_gb = 4 * nchan * nrays * nvox_ray / 1e9

# fused mode: per-block working set only
fused_gb = (4 + 4 + 4 + 4) * block * nvox_ray / 1e9

# the reference's model, for comparison (examples/memory_usage.py:23-44)
ref_gb = (8 * 3 + 8 + 8 + 8) * nchan * nobs * npix1 * npix2 * (nvox_ray - 1) / 1e9

print("\n--- Parameters ---\n")
print(f"({nrad}, {nele}, {nazi}) volume")
print(f"{nobs} observations, {nchan} channels, ({npix1}, {npix2}) sensor")
print("\n--- Memory Usage ---\n")
print(f"Volume memory:                {volume_gb:.3f} GB")
print(f"Precomputed tables (resident):{lin_gb + lens_gb:9.2f} GB")
print(f"  + forward gather transient: {values_gb:9.2f} GB")
print(f"Fused mode working set:       {fused_gb:9.4f} GB  (block={block})")
print(f"Reference (torch) peak:       {ref_gb:9.2f} GB")
