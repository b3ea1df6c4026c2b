"""TRUE multi-process data parallelism: 2 OS processes, 1 XLA:CPU device each,
joined by jax.distributed + gloo collectives into one 2-device `data` mesh.

This is the topology of two TPU hosts over DCN, which cannot be faked by the
in-process virtual-device mesh the other DP tests use (docs/ROADMAP.md test
debt). Asserts (a) both workers complete 3 psum-synchronized DP steps,
(b) learner replicas stay bit-identical across processes, (c) both report the
same globally-psum'd reward."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "dp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_stays_in_sync():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the interpreter's default site config
    env["COORD_ADDR"] = f"127.0.0.1:{port}"
    procs = []
    for pid in (0, 1):
        e = dict(env, PROC_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=e,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err[-4000:]}"
        outs.append(out)

    def parse(out, tag):
        for line in out.splitlines():
            if line.startswith(tag):
                return line.split()[1]
        raise AssertionError(f"missing {tag} in: {out}")

    h0, h1 = (parse(o, "PARAMS_HASH") for o in outs)
    r0, r1 = (parse(o, "REWARD") for o in outs)
    assert h0 == h1, f"learner replicas diverged across processes: {h0} vs {h1}"
    assert r0 == r1, f"global reward psum disagrees: {r0} vs {r1}"
