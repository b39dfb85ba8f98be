"""Native (C++) runtime components.

The reference's native layer is two CUDA ops plus a JIT plugin builder
(reference: torch_utils/ops/*.cu, torch_utils/custom_ops.py).  On TPU the
compute kernels live in Pallas (ops/pallas), so the native layer here serves
the *runtime* instead: a threaded PNG decode + batch assembly pipeline that
feeds the device without Python/PIL in the hot path, built on demand by
``builder.get_library`` (the custom_ops.py analogue: md5 source caching +
file-lock for concurrent builds, with graceful Python fallback).
"""
