"""Hardware scaling-ceiling probe: how well does THIS sandbox parallelize
numpy work across process counts? Establishes the maximum efficiency any
data engine could show here (memory-streaming work saturates the VM's
memory bandwidth well before 32 workers).

Usage: python tools/hw_probe.py
"""

import time
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def stream(_):
    """Memory-streaming workload (the shape of Arrow batch kernels)."""
    x = np.random.RandomState(0).rand(2_000_000)
    s = 0.0
    for _ in range(30):
        s += float(np.sqrt(x * 1.7 + 0.3).sum())
    return s


def cache(_):
    """Cache-resident compute-bound workload."""
    x = np.random.RandomState(0).rand(20_000)
    s = 0.0
    for _ in range(3000):
        s += float(np.sqrt(x * 1.7 + 0.3).sum())
    return s


def main():
    for name, work in (("stream", stream), ("cache", cache)):
        rates = {}
        for workers in (1, 4, 8, 16, 32):
            with ProcessPoolExecutor(workers) as ex:
                list(ex.map(work, range(workers)))  # warm
                t0 = time.time()
                list(ex.map(work, range(workers * 3)))
                rates[workers] = workers * 3 / (time.time() - t0)
        print(name, {k: round(v, 1) for k, v in rates.items()})
        print(f"  4->16 efficiency: {rates[16] / rates[4] / 4:.2f}")
        print(f"  8->32 efficiency: {rates[32] / rates[8] / 4:.2f}")


if __name__ == "__main__":
    main()
