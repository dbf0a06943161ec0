# Copyright 2026. Apache License 2.0.
"""Wall-clock averaging helpers (reference: medicalseg/utils/timer.py:18-53)."""

import time


class TimeAverager:
    """Accumulates wall-clock costs and sample counts between resets.

    Used by the train/eval loops for ``batch_cost`` / ``reader_cost`` /
    ``ips`` logging, mirroring reference timer.py:18-46.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._cnt = 0
        self._total_time = 0
        self._total_samples = 0

    def record(self, usetime, num_samples=None):
        self._cnt += 1
        self._total_time += usetime
        if num_samples:
            self._total_samples += num_samples

    def get_average(self):
        if self._cnt == 0:
            return 0
        return self._total_time / float(self._cnt)

    def get_ips_average(self):
        if not self._total_samples or self._cnt == 0:
            return 0
        return float(self._total_samples) / self._total_time


def calculate_eta(remaining_step, speed):
    """Human-readable ETA string (reference timer.py:49-53)."""
    if remaining_step < 0:
        remaining_step = 0
    remaining_time = int(remaining_step * speed)
    result = "{:0>2}:{:0>2}:{:0>2}"
    arr = []
    for i in range(2, -1, -1):
        arr.append(int(remaining_time / 60**i))
        remaining_time %= 60**i
    return result.format(*arr)
