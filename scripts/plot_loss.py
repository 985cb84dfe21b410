"""Plot training losses from a JSONL log (equivalent of the reference
``scripts/plot_loss.py``, which regex-parses stdout; ours reads the
structured logger output).

Usage: python scripts/plot_loss.py logs/yolact_base.log [out.png]
"""

import sys

sys.path.insert(0, '.')
from yolact_tpu.utils.logger import LogVisualizer  # noqa: E402


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else 'loss_plot.png'
    viz = LogVisualizer()
    viz.load(path)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 6))
    entries = [e for e in viz.logs if e.get('type') == 'train']
    if entries:
        # letters from the union of entries (a resumed run can add loss
        # terms mid-log); x/y paired PER ENTRY so missing letters skip
        # their entries instead of shifting the curve
        letters = sorted({k for e in entries
                          for k in e['data'].get('loss', {})})
        for letter in letters:
            pairs = viz.query_joined(
                ('data.iter', f'data.loss.{letter}'), 'train')
            if pairs:
                xs, ys = zip(*pairs)
                plt.plot(xs, ys, label=letter)
    plt.xlabel('iteration')
    plt.ylabel('loss')
    plt.legend()
    plt.title(path)
    plt.savefig(out, dpi=120)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
