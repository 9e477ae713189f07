"""Multi-process (DCN-path) regression test.

Launches two REAL processes with gloo cross-process collectives and 2
virtual CPU chips each — the same jax.distributed + shard_map code that runs
on a multi-host TPU slice (parallel/multihost.py). Validates distributed
init, the (2, 2) global mesh, a sharded update with cross-PROCESS halo
exchange, and that both processes agree with the single-process result.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import numpy as np
import jax
from traversability_estimation_tpu.parallel.multihost import initialize_multihost

pid = int(sys.argv[1])
port = int(sys.argv[2])
mesh = initialize_multihost(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
    local_cpu_devices=2,
)
assert jax.process_count() == 2, jax.process_count()
assert mesh.devices.shape == (2, 2), mesh.devices.shape

import jax.numpy as jnp
from traversability_estimation_tpu.ops.filters import ChainConfig
from traversability_estimation_tpu.ops.veto import VetoConfig
from traversability_estimation_tpu.parallel import sharding as sh
from jax.experimental import multihost_utils

ccfg = ChainConfig(resolution=0.03)
vcfg = VetoConfig(resolution=0.03, check_roughness=False)
rng = np.random.default_rng(0)
elev = (0.05 * rng.standard_normal((64, 64))).astype(np.float32)
elev[rng.random((64, 64)) < 0.05] = np.nan

layers = sh.sharded_update(jnp.asarray(elev), ccfg, vcfg, mesh)
trav = np.asarray(multihost_utils.process_allgather(
    layers["traversability"], tiled=True))
print("CHECKSUM", pid, float(np.nansum(trav)), int(np.isfinite(trav).sum()),
      flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("SKIP_MULTIPROC") == "1", reason="multiproc disabled"
)
def test_two_process_sharded_update(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    # the workers run as scripts from tmp_path; make the repo importable
    # without requiring an installed package
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    # unique coordinator port per run: a fixed one collides with lingering
    # workers from previous/parallel runs
    port = 20000 + os.getpid() % 20000
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    sums = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("CHECKSUM"):
                _, pid, s, nfin = line.split()
                sums[pid] = (float(s), int(nfin))
    assert set(sums) == {"0", "1"}
    assert sums["0"] == sums["1"]  # both processes see the same global map

    # cross-check against the single-process result in THIS process
    import jax.numpy as jnp

    from traversability_estimation_tpu.models.estimator import _update_step
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig

    rng = np.random.default_rng(0)
    elev = (0.05 * rng.standard_normal((64, 64))).astype(np.float32)
    elev[rng.random((64, 64)) < 0.05] = np.nan
    ref = _update_step(
        jnp.asarray(elev),
        ChainConfig(resolution=0.03),
        VetoConfig(resolution=0.03, check_roughness=False),
    )["traversability"]
    ref_sum = float(np.nansum(np.asarray(ref)))
    assert sums["0"][0] == pytest.approx(ref_sum, rel=1e-6)
    assert sums["0"][1] == int(np.isfinite(np.asarray(ref)).sum())


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SKIP_MULTIPROC") == "1", reason="multiproc disabled"
)
def test_scaling_bench_processes_mode():
    """scaling_bench --processes 2 emits the 1-host and 2-host rows plus the
    host-efficiency summary (the >=80%-to-2-hosts harness, VERDICT r2 #6)."""
    import json

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    r = subprocess.run(
        [sys.executable, "scripts/scaling_bench.py", "--processes", "2",
         "--local-devices", "1", "--tile", "32", "--k1", "2", "--k2", "4"],
        cwd="/root/repo", env=env, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    assert r.returncode == 0
    rows = [json.loads(x) for x in r.stdout.decode().splitlines()
            if x.strip().startswith("{")]
    hosts = {row.get("hosts") for row in rows
             if row.get("kind") == "scaling_update_multihost"}
    assert hosts == {1, 2}, rows
    summary = [row for row in rows
               if row.get("kind") == "scaling_multihost_summary"]
    assert summary and summary[0]["efficiency_per_device_vs_1host"] is not None
    assert all(row.get("backend", "cpu") == "cpu" for row in rows
               if "backend" in row)
