"""Shared utilities."""

from .compilation_cache import enable_persistent_compilation_cache

__all__ = ["enable_persistent_compilation_cache"]
