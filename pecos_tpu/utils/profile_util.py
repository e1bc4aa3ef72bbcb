"""Memory profiling helpers (reference: pecos/utils/profile_util.py:7-43)."""

from __future__ import annotations

import os


class MemInfo(object):
    @staticmethod
    def mem_info() -> str:
        """Human-readable RSS string for phase-boundary logging."""
        try:
            import psutil

            rss = psutil.Process(os.getpid()).memory_info().rss
        except ImportError:
            try:
                with open("/proc/self/statm") as f:
                    rss = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
            except Exception:
                return "mem_info unavailable"
        return f"mem: rss={rss / 2**30:.2f}GB"

    @staticmethod
    def device_mem_info() -> str:
        """Per-device memory stats when the backend exposes them."""
        try:
            import jax

            parts = []
            for d in jax.local_devices():
                stats = d.memory_stats()
                if stats:
                    used = stats.get("bytes_in_use", 0)
                    limit = stats.get("bytes_limit", 0)
                    parts.append(f"{d}: {used/2**30:.2f}/{limit/2**30:.2f}GB")
            return "; ".join(parts) if parts else "no device stats"
        except Exception:
            return "no device stats"
