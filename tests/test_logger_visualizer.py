"""LogVisualizer: dotted-path queries, sessions, elapsed time, plots
(utils/logger.py — replaces the reference's eval'd-lambda query mini-
language, utils/logger.py:153-470)."""

import json
import os

from yolact_tpu.utils.logger import Log, LogVisualizer


def _write_log(tmp_path):
    log = Log('vistest', str(tmp_path), session_data={'args': {'lr': 1e-3}})
    for i in range(5):
        log.log('train', loss={'B': 1.0 / (i + 1), 'T': 2.0 / (i + 1)},
                lr=1e-3, elapsed=0.1, epoch=0, iter=i)
    log.log('val', box={'all': 30.0 + 1}, mask={'all': 28.5}, epoch=0,
            iter=4, elapsed=1.0)
    return os.path.join(str(tmp_path), 'vistest.log')


def test_query_and_sessions(tmp_path):
    path = _write_log(tmp_path)
    vis = LogVisualizer()
    vis.load(path)
    assert len(vis.sessions()) == 1
    assert vis.sessions()[0]['data']['args']['lr'] == 1e-3
    losses = vis.query('data.loss.B', entry_type='train')
    assert losses == [1.0 / (i + 1) for i in range(5)]
    iters = vis.query('data.iter', entry_type='train')
    assert iters == [0, 1, 2, 3, 4]
    # callable query
    totals = vis.query(lambda e: e['data']['loss']['T']
                       if e.get('type') == 'train' else None)
    assert len(totals) == 5
    assert vis.elapsed_time() >= 0.0


def test_plot_and_bar(tmp_path):
    path = _write_log(tmp_path)
    vis = LogVisualizer()
    vis.load(path)
    out1 = tmp_path / 'plot.png'
    vis.plot('data.iter', 'data.loss.T', out_path=str(out1))
    assert out1.exists() and out1.stat().st_size > 0
    out2 = tmp_path / 'bar.png'
    vis.bar('data.epoch', 'data.mask.all', entry_type='val',
            out_path=str(out2))
    assert out2.exists() and out2.stat().st_size > 0
