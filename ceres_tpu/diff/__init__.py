"""Differentiable rendering: losses, inverse-rendering optimization."""

from ceres_tpu.diff.inverse import image_loss, make_train_step, fit_vertices

__all__ = ["image_loss", "make_train_step", "fit_vertices"]
