"""Meshes as precomputed connectivity arrays (TPU-native grid replacement)."""

from hpdg_tpu.mesh.structured import (Mesh, structured, refine, lshape,  # noqa: F401
                                      hierarchy, from_boxes)
