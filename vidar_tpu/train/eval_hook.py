"""Training-time evaluation scheduling (the reference's CustomDistEvalHook).

Counterpart of /root/reference/projects/mmdet3d_plugin/core/evaluation/
eval_hooks.py:16-90: dynamic evaluation intervals over training progress
(``_calc_dynamic_intervals`` + bisect interval selection) and best-checkpoint
tracking (``save_best`` / ``key_score``). The BN-buffer broadcast of the
reference (:56-67) is unnecessary here — params are jit-replicated by
sharding, so every host evaluates identical weights.
"""

from __future__ import annotations

import bisect
from typing import List, Optional, Sequence, Tuple


def calc_dynamic_intervals(start_interval: int,
                           dynamic_interval_list: Optional[
                               Sequence[Tuple[int, int]]]):
    """(milestone, interval) list -> parallel milestone/interval arrays
    (eval_hooks.py:16-25)."""
    milestones = [0]
    intervals = [start_interval]
    for ms, iv in (dynamic_interval_list or ()):
        milestones.append(ms)
        intervals.append(iv)
    return milestones, intervals


class EvalHook:
    """Decides *when* to evaluate; the caller runs the actual eval.

    Args:
      interval: base eval interval (epochs or iters per ``by_epoch``).
      dynamic_intervals: optional [(milestone, new_interval), ...] — from
        the milestone onward the interval switches (eval_hooks.py:37-42).
      start: first progress at which evaluation is allowed.
      save_best: metric key to track; ``record`` returns True when the new
        score is the best so far (eval_hooks.py:85-90).
      rule: 'greater' or 'less'.
    """

    def __init__(self, interval: int = 1, by_epoch: bool = True,
                 dynamic_intervals=None, start: Optional[int] = None,
                 save_best: Optional[str] = None, rule: str = 'greater'):
        self.by_epoch = by_epoch
        self.start = start
        self.save_best = save_best
        self.rule = rule
        self.interval = interval
        self.use_dynamic = dynamic_intervals is not None
        self.milestones, self.intervals = calc_dynamic_intervals(
            interval, dynamic_intervals)
        self.best_score: Optional[float] = None
        self.history: List[Tuple[int, float]] = []

    def _decide_interval(self, progress: int) -> int:
        if not self.use_dynamic:
            return self.interval
        step = bisect.bisect(self.milestones, progress + 1)
        self.interval = self.intervals[step - 1]
        return self.interval

    def should_evaluate(self, progress: int) -> bool:
        """progress: 1-based epoch (or iter) count just completed."""
        interval = self._decide_interval(progress - 1)
        if self.start is not None and progress < self.start:
            return False
        return interval > 0 and progress % interval == 0

    def record(self, progress: int, key_score: Optional[float]) -> bool:
        """Track ``save_best``; returns True if this is a new best."""
        if key_score is None:
            return False
        self.history.append((progress, float(key_score)))
        if self.save_best is None:
            return False
        better = (self.best_score is None or
                  (key_score > self.best_score if self.rule == 'greater'
                   else key_score < self.best_score))
        if better:
            self.best_score = float(key_score)
        return better
