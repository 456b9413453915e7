"""Core compute ops: quaternion algebra, SQ geometry, renderers, losses."""

from sqtpu.ops import quaternion, geometry, render, losses, metrics  # noqa: F401
