"""Running-average meters (reference parity: ``utils/AverageMeter.py:2-42``)."""
from __future__ import annotations

from typing import List, Sequence, Union


class AverageMeter:
    """Tracks val/sum/count/avg for one or more named items."""

    def __init__(self, items: Union[Sequence[str], None] = None):
        self.items = list(items) if items is not None else None
        self.n_items = len(self.items) if self.items is not None else 1
        self.reset()

    def reset(self):
        self._val = [0.0] * self.n_items
        self._sum = [0.0] * self.n_items
        self._count = [0] * self.n_items

    def update(self, values, n: int = 1):
        """Record `values`; `n` weights the entry (e.g. a mean over n steps
        from one scanned multi-step dispatch counts as n observations)."""
        if isinstance(values, (list, tuple)):
            for i, v in enumerate(values):
                self._val[i] = float(v)
                self._sum[i] += float(v) * n
                self._count[i] += n
        else:
            self._val[0] = float(values)
            self._sum[0] += float(values) * n
            self._count[0] += n

    def val(self, idx=None):
        if self.items is None:
            return self._val[0] if idx is None else self._val[idx]
        return self._val if idx is None else self._val[idx]

    def count(self, idx=None):
        if self.items is None:
            return self._count[0] if idx is None else self._count[idx]
        return self._count if idx is None else self._count[idx]

    def avg(self, idx=None) -> Union[float, List[float]]:
        def _avg(i):
            return self._sum[i] / max(self._count[i], 1)
        if self.items is None:
            return _avg(0) if idx is None else _avg(idx)
        return [_avg(i) for i in range(self.n_items)] if idx is None else _avg(idx)


class AccMetric:
    """Scalar accuracy with better_than (reference Acc_Metric,
    tools/runner_pretrain.py:28-45)."""

    def __init__(self, acc: float = 0.0):
        self.acc = float(acc)

    def better_than(self, other: "AccMetric") -> bool:
        return self.acc > other.acc

    def state_dict(self):
        return {"acc": self.acc}
