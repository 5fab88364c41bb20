"""Multi-process collective smoke test (SURVEY.md N18, §4b).

Launches TWO local processes that form one JAX distributed system
(`jax.distributed.initialize`) over CPU devices — the process boundary is
the DCN-analog this environment can actually exercise (one physical TPU
host). Verifies:

- global mesh spanning both processes' devices,
- gradient-style `psum` across the process boundary,
- the halo-exchange `ppermute` crossing processes with correct neighbors.

Run:  python scripts/dcn_smoke.py            (parent: spawns 2 workers)
      python scripts/dcn_smoke.py <i> <n>    (worker i of n)
"""
from __future__ import annotations

import os
import subprocess
import sys

COORD = "localhost:12765"
DEVS_PER_PROC = 4


def worker(pid: int, nproc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_dev = jax.device_count()
    assert n_dev == nproc * DEVS_PER_PROC, f"global devices {n_dev}"
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("time",))

    # 1. psum across the process boundary (the DP-gradient pattern).
    def allsum(x):
        return jax.lax.psum(x, "time")

    f = shard_map(allsum, mesh=mesh, in_specs=P("time"), out_specs=P("time"),
                  check_vma=False)
    x_host = np.arange(n_dev * 2, dtype=np.float32)
    x_global = jax.make_array_from_callback(
        x_host.shape, NamedSharding(mesh, P("time")), lambda idx: x_host[idx]
    )
    y = jax.jit(f)(x_global)
    want_sum = x_host.reshape(n_dev, 2).sum(0)  # per-device psum result
    for shard in y.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data).ravel(), want_sum)

    # 2. halo-exchange ppermute crossing the process boundary.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from modulationdetectioncnn_tpu.parallel.halo import left_halo_exchange

    t_local, h = 8, 3
    g = shard_map(
        lambda xl: left_halo_exchange(xl, h, "time")[None],
        mesh=mesh, in_specs=P("time"), out_specs=P("time"), check_vma=False,
    )
    xs_host = np.arange(n_dev * t_local, dtype=np.float32)
    xs = jax.make_array_from_callback(
        xs_host.shape, NamedSharding(mesh, P("time")), lambda idx: xs_host[idx]
    )
    out = jax.jit(g)(xs)
    for shard in out.addressable_shards:
        d = shard.index[0].start  # global device row of this shard
        row = np.asarray(shard.data).reshape(h + t_local)
        want_h = (
            np.zeros(h, np.float32) if d == 0
            else np.arange(d * t_local - h, d * t_local, dtype=np.float32)
        )
        np.testing.assert_array_equal(row[:h], want_h)
        np.testing.assert_array_equal(
            row[h:], np.arange(d * t_local, (d + 1) * t_local, dtype=np.float32)
        )
    if pid == 0:
        print(f"DCN smoke OK: {nproc} processes x {DEVS_PER_PROC} devices, "
              f"psum + halo ppermute verified across the process boundary")


def parent() -> int:
    procs = [
        subprocess.Popen([sys.executable, __file__, str(i), "2"])
        for i in range(2)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=300)
    return rc


if __name__ == "__main__":
    if len(sys.argv) == 3:
        worker(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(parent())
