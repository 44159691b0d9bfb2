"""Pure-function model modules: each exposes ``init(key, cfg) -> params``
and ``apply(params, ...)`` over plain pytrees, jit/pjit-friendly."""
