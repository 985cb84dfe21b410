"""Parse mAP tables out of an eval log (equivalent of the reference
``scripts/parse_eval.py``).

Reads the text table printed by calc_map / cli.eval and emits CSV rows.
Usage: python scripts/parse_eval.py eval_output.txt
"""

import sys


def parse(text):
    """Yields dicts {'type': 'box'|'mask', 'all': x, 50: y, ...}."""
    header = None
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().split('|') if c.strip()]
        if not cells:
            continue
        if cells[0] == 'all':
            header = ['all'] + [c.lstrip('.').strip() for c in cells[1:]]
        elif cells[0] in ('box', 'mask') and header:
            vals = [float(v) for v in cells[1:]]
            yield dict(type=cells[0], **dict(zip(header, vals)))


def main():
    text = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
    rows = list(parse(text))
    if not rows:
        print('no mAP tables found', file=sys.stderr)
        return
    keys = [k for k in rows[0] if k != 'type']
    print('type,' + ','.join(keys))
    for r in rows:
        print(r['type'] + ',' + ','.join(str(r[k]) for k in keys))


if __name__ == '__main__':
    main()
