"""EvalHook dynamic-interval scheduling tests (CustomDistEvalHook parity)."""

from vidar_tpu.train.eval_hook import EvalHook, calc_dynamic_intervals


def test_static_interval():
    h = EvalHook(interval=4)
    fires = [e for e in range(1, 25) if h.should_evaluate(e)]
    assert fires == [4, 8, 12, 16, 20, 24]


def test_dynamic_intervals_switch():
    # reference semantics (eval_hooks.py:16-42): start at interval 10,
    # from epoch 20 onward evaluate every 2
    h = EvalHook(interval=10, dynamic_intervals=[(20, 2)])
    fires = [e for e in range(1, 31) if h.should_evaluate(e)]
    assert fires == [10, 20, 22, 24, 26, 28, 30]


def test_start_gate():
    h = EvalHook(interval=2, start=5)
    fires = [e for e in range(1, 11) if h.should_evaluate(e)]
    assert fires == [6, 8, 10]


def test_save_best_tracking():
    h = EvalHook(interval=1, save_best='nds')
    assert h.record(1, 0.40)
    assert not h.record(2, 0.35)
    assert h.record(3, 0.50)
    assert h.best_score == 0.50
    le = EvalHook(interval=1, save_best='chamfer', rule='less')
    assert le.record(1, 1.5)
    assert le.record(2, 1.2)
    assert not le.record(3, 1.4)


def test_calc_dynamic_intervals():
    ms, iv = calc_dynamic_intervals(24, [(40, 4), (48, 1)])
    assert ms == [0, 40, 48]
    assert iv == [24, 4, 1]
