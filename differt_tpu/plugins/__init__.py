"""Plugins: exporters to external frameworks."""

from . import deepmimo

__all__ = ["deepmimo"]
