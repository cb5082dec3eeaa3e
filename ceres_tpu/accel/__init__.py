"""Acceleration structures: morton codes, triangle clusters, LBVH, SAH."""
