"""Device-memory telemetry + profiling (L0).

TPU-native replacement for the reference's CUDA memory utilities
(utils/memory_utils.py in /root/reference): per-device memory stats from
``device.memory_stats()``, host memory via /proc, a parameter-tree memory
estimator (replacing the torch trace-based estimate), a memory-aware batch
clamp, and a ``jax.profiler`` trace context replacing nvprof-style
tooling. The reference logs these to TensorBoard every 50 steps; the
runner follows the same cadence via MetricLogger.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def get_memory_stats() -> Dict[str, float]:
    """Per-device + host memory stats in GB (flat dict for metric logging)."""
    gb = 1024**3
    stats: Dict[str, float] = {}
    for i, dev in enumerate(jax.local_devices()):
        try:
            m = dev.memory_stats()
        except Exception:
            m = None
        if m:
            stats[f"device{i}_bytes_in_use_gb"] = m.get("bytes_in_use", 0) / gb
            stats[f"device{i}_peak_bytes_gb"] = m.get("peak_bytes_in_use", 0) / gb
            limit = m.get("bytes_limit")
            if limit:
                stats[f"device{i}_limit_gb"] = limit / gb
    try:
        with open("/proc/meminfo") as f:
            info = {l.split(":")[0]: l.split()[1] for l in f if ":" in l}
        stats["system_total_gb"] = float(info.get("MemTotal", 0)) / 1024**2
        stats["system_available_gb"] = float(info.get("MemAvailable", 0)) / 1024**2
    except OSError:
        pass
    return stats


def log_memory_stats(step: int = 0, print_fn=print) -> Dict[str, float]:
    stats = get_memory_stats()
    parts = [f"{k}={v:.2f}" for k, v in stats.items() if not k.startswith("system")]
    print_fn(f"[step {step}] memory: " + ", ".join(parts))
    return stats


def estimate_model_memory(
    params: Any,
    optimizer_copies: int = 2,  # adam m+v
    activation_multiplier: float = 1.5,
    param_bytes: int = 4,
) -> Dict[str, float]:
    """Parameter-count-based memory estimate (GB): params + grads +
    optimizer state + a rough activation allowance."""
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    gb = 1024**3
    p = n_params * param_bytes / gb
    return {
        "n_params": float(n_params),
        "params_gb": p,
        "grads_gb": p,
        "optimizer_gb": p * optimizer_copies,
        "activations_gb_est": p * activation_multiplier,
        "total_gb_est": p * (2 + optimizer_copies + activation_multiplier),
    }


def memory_aware_batch_size(
    requested: int,
    per_item_gb: float,
    reserve_gb: float = 2.0,
    device: Optional[jax.Device] = None,
) -> int:
    """Clamp a batch size to what fits in device memory
    (reference utils/memory_utils.py:99-134 semantics)."""
    device = device or jax.local_devices()[0]
    try:
        m = device.memory_stats() or {}
        limit = m.get("bytes_limit", 0) / 1024**3
        used = m.get("bytes_in_use", 0) / 1024**3
    except Exception:
        return requested
    if not limit:
        return requested
    budget = max(limit - used - reserve_gb, 0.0)
    fit = int(budget // max(per_item_gb, 1e-6))
    return max(min(requested, fit), 1)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
