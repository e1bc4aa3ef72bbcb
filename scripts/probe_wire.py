"""Characterize the host->device wire: latency vs transfer size, transfer count."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def main():
    f_touch = jax.jit(lambda a: a.ravel()[0] * 1.0)

    # single transfer, varying size
    for mb in [0.125, 0.5, 2, 8, 16, 32]:
        n = int(mb * 1024 * 1024 / 4)
        a = np.random.default_rng(0).integers(0, 100, n, dtype=np.int32)
        x = jnp.asarray(a); sync(f_touch(x))  # warm
        times = []
        for _ in range(5):
            t0 = time.time()
            x = jnp.asarray(a)
            sync(f_touch(x))
            times.append(time.time() - t0)
        t = min(times)
        print(f"1 transfer of {mb:6.3f} MB: {t*1000:7.1f} ms ({mb/t:7.1f} MB/s)")

    # N transfers of fixed total 16 MB
    total = 16 * 1024 * 1024 // 4
    for k in [1, 2, 4, 8, 16]:
        n = total // k
        parts = [np.random.default_rng(i).integers(0, 100, n, dtype=np.int32) for i in range(k)]
        xs = [jnp.asarray(p) for p in parts]; sync(f_touch(xs[-1]))
        times = []
        for _ in range(4):
            t0 = time.time()
            xs = [jnp.asarray(p) for p in parts]
            outs = [f_touch(x) for x in xs]
            sync(outs[-1])
            times.append(time.time() - t0)
        t = min(times)
        print(f"{k:2d} transfers x {n*4/1e6:5.1f} MB: {t*1000:7.1f} ms ({total*4/1e6/t:7.1f} MB/s)")

    # device_put vs asarray for 2 MB
    a = np.random.default_rng(0).integers(0, 100, 512 * 1024, dtype=np.int32)
    x = jax.device_put(a); sync(f_touch(x))
    times = []
    for _ in range(5):
        t0 = time.time()
        x = jax.device_put(a)
        sync(f_touch(x))
        times.append(time.time() - t0)
    print(f"device_put 2 MB: {min(times)*1000:.1f} ms")


if __name__ == "__main__":
    main()
