"""Device HBM budget discovery.

The positional-automaton tables are sized against an HBM byte budget
(utils/config.pos_hbm_budget).  A fixed constant wastes most of a large
chip and overcommits a small one, so the default (pos_hbm_budget == 0)
derives the budget from the actual device: PJRT memory_stats when the
backend reports them, else a device-kind table, else a conservative 10 GB.
"""

from __future__ import annotations

_FALLBACK = 10 << 30
_RESERVE_FRACTION = 0.75  # leave room for batches, outputs, XLA temps

# total HBM by accelerator generation (per chip)
_KIND_HBM = {
    "v2": 8 << 30,
    "v3": 16 << 30,
    "v4": 32 << 30,
    "v5 lite": 16 << 30,
    "v5e": 16 << 30,
    "v5": 95 << 30,
    "v5p": 95 << 30,
    "v6 lite": 32 << 30,
    "v6e": 32 << 30,
}


def device_hbm_bytes(device=None) -> int | None:
    """Total HBM of `device` (default: first device), or None when unknown
    (CPU hosts, exotic backends)."""
    import jax

    d = device if device is not None else jax.devices()[0]
    try:
        ms = d.memory_stats()
        if ms and ms.get("bytes_limit"):
            return int(ms["bytes_limit"])
    except Exception:
        pass
    kind = getattr(d, "device_kind", "").lower()
    if "tpu" not in kind and d.platform not in ("tpu", "axon"):
        return None
    # longest matching generation tag wins ("v5 lite" before "v5")
    best = None
    for tag, size in _KIND_HBM.items():
        if tag in kind and (best is None or len(tag) > len(best[0])):
            best = (tag, size)
    return best[1] if best else None


def resolve_pos_budget(configured: int, device=None) -> int:
    """Effective pos-table budget: the configured value when positive, else
    _RESERVE_FRACTION of the device HBM, else the 10 GB fallback."""
    if configured > 0:
        return configured
    total = device_hbm_bytes(device)
    if total is None:
        return _FALLBACK
    return int(total * _RESERVE_FRACTION)


def host_ram_bytes() -> int | None:
    """Total host RAM from /proc/meminfo (None when unreadable)."""
    try:
        for line in open("/proc/meminfo"):
            if line.startswith("MemTotal:"):
                return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


# monolithic SA-IS + Kasai working set, measured at n = 2.3e9 (~90 GB)
_SA_BYTES_PER_CHAR = 40


def resolve_sa_budget_chars(configured: int) -> int:
    """Character budget for monolithic host suffix-array construction: the
    configured value when positive, else 60% of host RAM / 40 B per char
    (conservative: leaves room for the merged arrays and the OS)."""
    if configured > 0:
        return configured
    total = host_ram_bytes()
    if total is None:
        return 1 << 30
    return int(total * 0.6) // _SA_BYTES_PER_CHAR
