"""Shared utilities."""

from .compilation_cache import enable_persistent_compilation_cache
from .platforms import select_platforms

__all__ = ["enable_persistent_compilation_cache", "select_platforms"]
