"""Command-line apps: `render` (single frame) and `anim` (turntable)."""
