"""Global layout constants for joltqc_tpu.

TPU-native re-creation of the invariants in the reference implementation
(/root/reference/jqc/constants.py:21-38), adjusted for TPU tiling:
the lane dimension of every batched kernel is padded to multiples of
``TASK_ALIGN`` so shell-quartet task batches map onto 8x128 VPU tiles.
"""

# Maximum angular momentum supported (s,p,d,f,g)
LMAX = 4

# Max primitives per (split) contracted shell; shells with more primitives
# are split into several <=NPRIM_MAX shells (see mol/layout.py).
NPRIM_MAX = 3

# Per-shell packed record: 4 coords (x, y, z, ao_loc) + NPRIM_MAX*2 (coef, exp)
# + padding -> 12 float slots, mirroring the reference BASIS_STRIDE=12.
BASIS_STRIDE = 12

# Screening tile (shell-pair tiles are TILE x TILE)
TILE = 4

# Task batches are padded to a multiple of this so that the quartet axis
# lands on full TPU vector lanes (8 sublanes x 128 lanes).
TASK_ALIGN = 1024

# Number of cartesian components for angular momentum l
def nf_cart(l: int) -> int:
    return (l + 1) * (l + 2) // 2


# Number of spherical components for angular momentum l
def nf_sph(l: int) -> int:
    return 2 * l + 1


__all__ = ["LMAX", "NPRIM_MAX", "BASIS_STRIDE", "TILE", "TASK_ALIGN", "nf_cart", "nf_sph"]
