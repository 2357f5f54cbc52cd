"""Metric smoothing / logging helpers (reference ``pcdet/utils/misc.py``,
which the reference imports but never wires into its train loop; kept here
for the same utility surface).

Cross-process synchronization is JAX-native: where the reference used
``torch.distributed.all_gather`` over NCCL (misc.py:88-156), we use
``jax.experimental.multihost_utils`` over the TPU DCN/ICI fabric.
"""
import datetime
import time
from collections import defaultdict, deque

import numpy as np


class SmoothedValue:
    """Windowed + global average of a scalar series (reference misc.py:26-85)."""

    def __init__(self, window_size=20, fmt=None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n=1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum count/total across hosts (reference misc.py:44-56, dist-gated
        the same way: a no-op in single-process runs)."""
        import jax
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        t = multihost_utils.process_allgather(
            np.array([self.count, self.total], dtype=np.float64))
        self.count = int(t[:, 0].sum())
        self.total = float(t[:, 1].sum())

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


def all_gather(data):
    """Gather an arbitrary picklable object from every host (reference
    misc.py:88-128, pickle-over-NCCL -> multihost broadcast)."""
    import jax
    if jax.process_count() == 1:
        return [data]
    import pickle

    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], dtype=np.int64)).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]


def reduce_dict(input_dict, average=True):
    """Mean/sum a dict of scalars across hosts (reference misc.py:131-155)."""
    import jax
    if jax.process_count() == 1:
        return dict(input_dict)
    from jax.experimental import multihost_utils
    names = sorted(input_dict.keys())
    values = np.array([float(input_dict[k]) for k in names], dtype=np.float64)
    summed = multihost_utils.process_allgather(values).sum(axis=0)
    if average:
        summed = summed / jax.process_count()
    return dict(zip(names, summed.tolist()))


class MetricLogger:
    """Named SmoothedValues + timed iteration logging (reference
    misc.py:158-245)."""

    def __init__(self, delimiter="\t"):
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
            '{}: {}'.format(name, str(meter))
            for name, meter in self.meters.items())

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq, header=None):
        header = header or ''
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt='{avg:.4f}')
        data_time = SmoothedValue(fmt='{avg:.4f}')
        space_fmt = ':' + str(len(str(len(iterable)))) + 'd'
        log_msg = self.delimiter.join([
            header, '[{0' + space_fmt + '}/{1}]', 'eta: {eta}', '{meters}',
            'time: {time}', 'data: {data}'])
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == len(iterable) - 1:
                eta_seconds = iter_time.global_avg * (len(iterable) - i)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
                print(log_msg.format(i, len(iterable), eta=eta_string,
                                     meters=str(self), time=str(iter_time),
                                     data=str(data_time)))
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        total_time_str = str(datetime.timedelta(seconds=int(total_time)))
        print('{} Total time: {} ({:.4f} s / it)'.format(
            header, total_time_str, total_time / max(len(iterable), 1)))
