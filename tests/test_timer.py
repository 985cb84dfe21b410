import time

from yolact_tpu.utils import timer


def test_timer_exclusive_accounting():
    timer.reset()
    timer.disable_all(False)
    with timer.env('outer'):
        time.sleep(0.05)
        with timer.env('inner'):
            time.sleep(0.05)
        time.sleep(0.02)
    total = timer.total_time()
    assert total >= 0.11
    # exclusive: inner's time must not be double counted in outer
    assert abs(timer._total['outer'] + timer._total['inner'] - total) < 1e-6
    assert timer._total['inner'] >= 0.05
    assert timer._total['outer'] >= 0.06
    assert timer._total['outer'] < 0.11


def test_timer_disable():
    timer.reset()
    timer.disable('skipme')
    with timer.env('skipme'):
        time.sleep(0.01)
    assert 'skipme' not in timer._total
    timer.enable('skipme')


def test_timer_disable_all():
    timer.reset()
    timer.disable_all(True)
    with timer.env('x'):
        pass
    assert timer.total_time() == 0
    timer.disable_all(False)
