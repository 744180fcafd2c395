"""True multi-process jax.distributed test (SURVEY.md §4(4)): two CPU
processes with a local TCP coordinator exchange QUAL score min/max through
exchange_score_minmax's process_allgather path."""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
import numpy as np
sys.path.insert(0, os.getcwd())
from svision_tpu.parallel.dist import exchange_score_minmax

# each process holds a different shard of scores
local = np.array([10.0 + pid, 50.0 - 10 * pid, 42.0])
mn, mx = exchange_score_minmax(local)
print(f"RESULT {pid} {mn} {mx}", flush=True)
"""


@pytest.mark.slow
def test_two_process_score_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.getcwd(), env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    # shard 0 holds {10,50,42}, shard 1 holds {11,40,42} -> global (10, 50)
    # Gloo writes progress lines to fd 1 from C++, which can interleave with
    # Python's print on the same line -- search, don't match line starts.
    for pid, out in enumerate(outs):
        m = re.search(r"RESULT (\d+) ([\d.]+) ([\d.]+)", out)
        assert m is not None, out[-2000:]
        assert int(m.group(1)) == pid
        assert float(m.group(2)) == 10.0 and float(m.group(3)) == 50.0
