"""Simulated multi-HOST training: 2 jax.distributed processes x 4 CPU
devices, one global data-parallel train step (tools/dist_train.sh
semantics).

The reference assumes multi-node correctness from the mm-stack and never
tests it (SURVEY 4); here the actual coordinator bootstrap, cross-process
global mesh, and multi-controller batch/param placement (parallel/mesh._put
via make_array_from_callback) run for real.  Both processes must agree on
the loss bit-for-bit — they execute the same global program.
"""
import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step():
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the axon sitecustomize registers the TPU plugin at interpreter
    # startup from these vars (before any worker code runs) — scrub them
    # in the PARENT env like __graft_entry__.dryrun_multichip does
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env.pop(k)

    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.join(here, ".."))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        # a rendezvous deadlock must not leak two live jax.distributed
        # workers (one holds the coordinator port) into later sessions
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK proc=\d+ loss=([\d.eE+-]+) "
                      r"grad_norm=([\d.eE+-]+)", out)
        assert m, f"no MULTIHOST_OK line:\n{out[-3000:]}"
        losses.append((float(m.group(1)), float(m.group(2))))
    # same global program on both controllers -> identical metrics
    assert losses[0] == losses[1], losses
