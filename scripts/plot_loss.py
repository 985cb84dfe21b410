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

    iters = viz.query('data.iter', 'train')
    plt.figure(figsize=(10, 6))
    entries = [e for e in viz.logs if e.get('type') == 'train']
    if entries:
        letters = sorted(entries[0]['data'].get('loss', {}).keys())
        for letter in letters:
            ys = [e['data']['loss'].get(letter) for e in entries]
            plt.plot(iters[:len(ys)], ys, label=letter)
    plt.xlabel('iteration')
    plt.ylabel('loss')
    plt.legend()
    plt.title(path)
    plt.savefig(out, dpi=120)
    print(f'saved {out}')


if __name__ == '__main__':
    main()
