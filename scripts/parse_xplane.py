"""Summarise a JAX/XLA xplane profile: top ops by total device time.

    python scripts/parse_xplane.py /tmp/prof/plugins/profile/*/vm.xplane.pb [N]

Groups XLA op events by name prefix (fusion/convolution/etc) and prints the
top-N rows with total ms and % of device time.  Works on the TPU device
plane of profiles written by ``jax.profiler.trace``.
"""

import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name.lower():
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[(line.name, name)] += ev.duration_ps / 1e9  # ms
                counts[(line.name, name)] += 1
        by_line = defaultdict(list)
        for (ln, name), ms in totals.items():
            by_line[ln].append((ms, counts[(ln, name)], name))
        print(f'=== plane: {plane.name}')
        for ln, rows in by_line.items():
            rows.sort(reverse=True)
            tot = sum(r[0] for r in rows)
            print(f'--- line: {ln}  total {tot:.2f} ms')
            if tot <= 0:
                continue
            for ms, c, name in rows[:top_n]:
                print(f'  {ms:9.3f} ms {100*ms/tot:5.1f}%  x{c:<4d} '
                      f'{name[:110]}')


if __name__ == '__main__':
    main()
