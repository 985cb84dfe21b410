"""Accelerator telemetry — TPU-native replacement for the reference's
nvidia-smi scraper (``utils/nvinfo.py``).

Reports per-device identity and live HBM usage via the PJRT
``memory_stats`` API instead of parsing CLI output; `visible_devices`
mirrors ``visible_gpus`` honoring JAX's device visibility.
"""

from __future__ import annotations

from typing import Dict, List


def device_info() -> List[Dict]:
    """One dict per accelerator: id, kind, platform, memory stats (bytes)."""
    import jax
    out = []
    for d in jax.devices():
        info = {
            'id': d.id,
            'platform': d.platform,
            'kind': getattr(d, 'device_kind', '?'),
            'process': getattr(d, 'process_index', 0),
        }
        try:
            stats = d.memory_stats() or {}
            info['bytes_in_use'] = stats.get('bytes_in_use')
            info['bytes_limit'] = stats.get('bytes_limit')
            info['peak_bytes_in_use'] = stats.get('peak_bytes_in_use')
        except Exception:
            pass
        out.append(info)
    return out


def visible_devices() -> List[int]:
    import jax
    return [d.id for d in jax.local_devices()]


def format_table() -> str:
    rows = device_info()
    lines = [f'{"id":>3} | {"platform":>8} | {"kind":>12} | '
             f'{"mem used":>10} | {"mem limit":>10}']
    lines.append('-' * len(lines[0]))
    for r in rows:
        used = r.get('bytes_in_use')
        limit = r.get('bytes_limit')
        fmt = lambda b: f'{b / 2**30:.2f}G' if isinstance(b, int) else '-'
        lines.append(f'{r["id"]:>3} | {r["platform"]:>8} | {r["kind"]:>12} | '
                     f'{fmt(used):>10} | {fmt(limit):>10}')
    return '\n'.join(lines)


if __name__ == '__main__':
    print(format_table())
