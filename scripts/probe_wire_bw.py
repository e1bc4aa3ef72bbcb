"""Measure tunnel host->device bandwidth vs buffer size / thread count,
and the end-to-end effect of bf16 value wire at the bench geometry."""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    f_touch = jax.jit(lambda a: a.ravel()[0])

    total_mb = 16
    total = total_mb * 1024 * 1024
    base = np.random.default_rng(0).integers(0, 65536, size=total // 2).astype(np.uint16)
    jax.device_get(f_touch(jnp.asarray(base[:1024])))

    # bandwidth vs chunk size (single stream)
    for nchunks in (1, 2, 4, 8, 16, 32):
        chunks = np.array_split(base, nchunks)
        for _ in range(2):
            t0 = time.time()
            ds = [jnp.asarray(c) for c in chunks]
            jax.device_get(f_touch(ds[-1]))
            dt = time.time() - t0
        print(f"chunks={nchunks:3d} ({total_mb/nchunks:5.1f} MB each): "
              f"{total_mb/dt:6.1f} MB/s")

    # bandwidth vs upload thread count (8 chunks split over T threads)
    nchunks = 8
    chunks = np.array_split(base, nchunks)
    for T in (1, 2, 4):
        out = [None] * nchunks

        def up(tid):
            for i in range(tid, nchunks, T):
                out[i] = jnp.asarray(chunks[i])

        for _ in range(2):
            t0 = time.time()
            ths = [threading.Thread(target=up, args=(t,)) for t in range(T)]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            jax.device_get(f_touch(out[-1]))
            dt = time.time() - t0
        print(f"threads={T}: {total_mb/dt:6.1f} MB/s")

    # device_put vs asarray on one 2 MB buffer, repeated
    buf = base[: 2 * 1024 * 1024 // 2]
    for name, fnup in (("asarray", jnp.asarray), ("device_put", jax.device_put)):
        for _ in range(2):
            t0 = time.time()
            ds = [fnup(buf) for _ in range(8)]
            jax.device_get(f_touch(ds[-1]))
            dt = time.time() - t0
        print(f"{name} 8x2MB: {16/dt:6.1f} MB/s")


if __name__ == "__main__":
    main()
