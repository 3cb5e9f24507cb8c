"""System telemetry for /system-status.

Reference returns psutil CPU/RAM plus NVML per-GPU stats
(/root/reference/src/api.py:180-236). TPU equivalents: device enumeration via
``jax.devices()`` and per-device memory via ``device.memory_stats()``.
"""
from __future__ import annotations

from typing import Any, Dict, List


def cpu_status() -> Dict[str, Any]:
    try:
        import psutil

        ram = psutil.virtual_memory()
        return {
            # interval=None: non-blocking (delta since previous call) — a
            # 100 ms sleep here would stall the serving event loop
            "utilization_percent": psutil.cpu_percent(interval=None),
            "ram_gb": {
                "total": round(ram.total / 1024**3, 2),
                "used": round(ram.used / 1024**3, 2),
                "free": round(ram.free / 1024**3, 2),
                "percent_used": ram.percent,
            },
        }
    except ImportError:
        return {"error": "psutil library not installed."}
    except Exception as exc:  # pragma: no cover
        return {"error": f"Could not retrieve CPU/RAM stats: {exc}"}


def tpu_status() -> List[Dict[str, Any]]:
    out: List[Dict[str, Any]] = []
    try:
        import jax

        for dev in jax.local_devices():
            info: Dict[str, Any] = {
                "device_id": dev.id,
                "platform": dev.platform,
                "device_kind": getattr(dev, "device_kind", "unknown"),
            }
            try:
                stats = dev.memory_stats() or {}
                in_use = stats.get("bytes_in_use", 0)
                limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit", 0)
                info["memory_gb"] = {
                    "used": round(in_use / 1024**3, 2),
                    "total": round(limit / 1024**3, 2) if limit else None,
                    "free": round((limit - in_use) / 1024**3, 2) if limit else None,
                }
            except Exception:
                info["memory_gb"] = None
            out.append(info)
    except Exception:
        pass
    return out
