"""Minimal torch_geometric API shim (see ../README.md)."""
from . import data, loader, nn  # noqa: F401
