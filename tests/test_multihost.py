"""Multi-host readiness (VERDICT r2 item #9): a REAL 2-process
jax.distributed cluster (4 virtual CPU devices each -> 8 global devices)
exercising process-0 checkpoint gating and the deterministic per-step count
draw.  Run with ``pytest -k multihost``."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_two_process_cluster(tmp_path):
    port = _free_port()
    workers = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pid in range(2):
        env = dict(os.environ)
        # extend (never overwrite) PYTHONPATH; the worker pins its own
        # platform flags
        pp = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
        env.pop("XLA_FLAGS", None)
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "multihost_worker.py"),
             f"localhost:{port}", "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for w in workers:
        # 174 s clean on this single-core box; headroom for a contended
        # core (a concurrent 3-way run blew a 240 s ceiling)
        out, _ = w.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    r0, r1 = results
    # the per-step draw replaced the rank-0 broadcast: identical sequences
    assert r0["counts"] == r1["counts"]
    assert all(2 <= c < 16 for c in r0["counts"])
    # replicated params read back identically on both hosts
    assert r0["param_sum"] == r1["param_sum"]
    # process-0 gating: exactly one orbax checkpoint, both processes see it
    # and resume the same state
    assert r0["ckpt_exists"] and r1["ckpt_exists"]
    assert r0["resumed_step"] == r1["resumed_step"] == 5
    assert r0["resumed_w0"] == r1["resumed_w0"] == 1.0
    ckpts = [d for d in os.listdir(tmp_path / "ckpts") if d.startswith("checkpoint-")]
    assert ckpts == ["checkpoint-5"]
    # the cross-process train step: 8 per-shard groups over the global
    # mesh, identical metrics and post-update params on both hosts
    assert r0["train_num_groups"] == r1["train_num_groups"] == 8
    assert r0["train_reward"] == pytest.approx(r1["train_reward"], rel=1e-5)
    assert r0["train_loss"] == pytest.approx(r1["train_loss"], rel=1e-4)
    assert r0["train_param_sum"] == pytest.approx(
        r1["train_param_sum"], rel=1e-6
    )


@pytest.mark.slow
def test_multihost_edit_family_cross_process_tp(tmp_path):
    """VERDICT r4 #5: one real EditPPOTrainer step with the DiT
    tensor-sharded ACROSS the 2-process boundary (the bf16 >16GB Kontext
    deployment shape), plus the coordinated orbax save — green on a real
    jax.distributed cluster, not just the single-process virtual mesh."""
    port = _free_port()
    workers = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pid in range(2):
        env = dict(os.environ)
        pp = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
        env.pop("XLA_FLAGS", None)
        workers.append(subprocess.Popen(
            [sys.executable,
             os.path.join(repo, "tests", "multihost_edit_worker.py"),
             f"localhost:{port}", "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for w, out in zip(workers, outs):
        assert w.returncode == 0, f"edit worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"edit_result_{pid}.json") as f:
            results.append(json.load(f))

    r0, r1 = results
    # the mesh layout really put one device from EACH process into every
    # TP group (otherwise the test proves nothing)
    assert r0["model_groups_cross_processes"]
    assert r1["model_groups_cross_processes"]
    # identical metrics + post-update params on both hosts
    assert r0["train_num_groups"] == r1["train_num_groups"] == 4
    assert r0["train_reward"] == pytest.approx(r1["train_reward"], rel=1e-5)
    assert r0["train_loss"] == pytest.approx(r1["train_loss"], rel=1e-4)
    assert r0["train_param_sum"] == pytest.approx(
        r1["train_param_sum"], rel=1e-6
    )
    # exactly one coordinated checkpoint; both processes resumed it
    assert r0["ckpt_exists"] and r1["ckpt_exists"]
    assert r0["resumed_step"] == r1["resumed_step"]
    ckpts = [d for d in os.listdir(tmp_path / "edit_ckpts")
             if d.startswith("checkpoint-")]
    assert len(ckpts) == 1
