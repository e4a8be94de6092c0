"""Metric logging (reference utils/metric_logger.py:38-132): windowed
median/mean smoothing, one log line every N iterations with eta/losses/lr,
optional TensorBoard scalars via tf.summary (tensorboardX equivalent)."""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque


class SmoothedValue:
    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self.deque.append(value)
        self.count += 1
        self.total += value

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items())


class TensorboardLogger(MetricLogger):
    """tf.summary-backed scalar logging (reference TensorboardLogger,
    metric_logger.py:68-99)."""

    def __init__(self, log_dir: str, start_iter: int = 0, delimiter: str = "  "):
        super().__init__(delimiter)
        self.iteration = start_iter
        try:
            import tensorflow as tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._writer = None

    def update(self, iteration: int | None = None, **kwargs):
        super().update(**kwargs)
        if iteration is not None:
            self.iteration = iteration
        if self._writer is not None:
            import tensorflow as tf
            with self._writer.as_default():
                for k, v in kwargs.items():
                    tf.summary.scalar(k, float(v), step=self.iteration)


def eta_string(avg_iter_time: float, remaining_iters: int) -> str:
    return str(datetime.timedelta(seconds=int(avg_iter_time * remaining_iters)))


class Timer:
    """reference utils/timer.py:8-46."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self):
        dt = time.perf_counter() - self.start_time
        self.total_time += dt
        self.calls += 1
        return dt

    @property
    def average_time(self):
        return self.total_time / max(self.calls, 1)
