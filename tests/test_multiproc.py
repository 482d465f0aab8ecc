"""Real multi-process distributed run (2 jax.distributed CPU processes).

Drives scripts/multiproc_check.py: make_global_batch / local_data_rows /
rank-gated save / the eval local-copy detach, executed across two actual
OS processes — the failure modes the single-process virtual mesh cannot
reach (VERDICT r4 item 6)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_train():
    env = dict(os.environ)
    # The workers pick their own platform/device-count flags.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["GSAVATARS_MP_PORT"] = "19735"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiproc_check.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "multiproc check OK" in r.stdout
