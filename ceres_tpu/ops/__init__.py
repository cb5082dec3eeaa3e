"""Compute ops: intersection math, clusters, LBVH, Pallas kernels."""
