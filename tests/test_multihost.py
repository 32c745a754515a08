"""True multi-process integration test of the --multihost training path.

Spawns TWO OS processes (4 virtual CPU devices each) that form one
8-device jax.distributed world via Gloo and run the train CLI smoke:
per-process local batch rows assembled into global arrays
(parallel/mesh.py shard_batch), replicated params, XLA-inserted grad
all-reduce, and process_index()==0-gated writes.

Mirrors the reference's multi-node DDP bring-up (main.py:901-919) which
Lightning exercised with real ranks; round-1 review flagged that our
wiring had never executed with process_count > 1.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRAPPER = r"""
import sys
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
from custom_diffusion360_tpu.cli.train import main
main([
    "--smoke", "--multihost",
    "--coordinator", "localhost:" + port,
    "--num_processes", "2", "--process_id", str(pid),
    "--output_dir", out,
])
"""


def _free_port() -> int:
    """OS-assigned ephemeral port — a fixed port flakes when a previous
    run's coordinator socket lingers in TIME_WAIT."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_smoke(tmp_path):
    out = tmp_path / "mh_run"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WRAPPER, str(pid), str(out), port],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{stdout[-4000:]}"

    # rank-0-gated artifacts exist exactly once (shared output dir)
    assert (out / "delta_last.npz").exists()
    assert (out / "metrics.csv").exists()
    assert (out / "config.json").exists()
