"""Renderer: ray generation, intersection dispatch, shading, stats."""
