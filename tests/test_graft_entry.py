"""Driver-contract regression tests for `__graft_entry__`.

Round-1 failure mode (VERDICT.md): the driver invoked `dryrun_multichip(8)`
in the default single-TPU environment and the function inherited the real
'axon' platform instead of forcing the 8-device virtual CPU mesh, recording
`ok=false`. These tests replicate the driver's exact bare invocation in a
fresh subprocess with the TPU platform selected by env, and require exit 0.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    # Undo the conftest's CPU forcing: the driver runs with the machine
    # default (JAX_PLATFORMS=axon -> real TPU) and no XLA_FLAGS.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_self_forces_virtual_cpu_mesh():
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_driver_env(), capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8): train step loss=" in proc.stdout, proc.stdout


def test_entry_returns_public_pipeline_method():
    # entry() must route through Pipeline's public API so refactors of
    # private impls can't silently break the driver's compile gate.
    import __graft_entry__ as g

    fn, args = g.entry()
    assert getattr(fn, "__name__", "") == "forward_superchunk"
    assert not fn.__name__.startswith("_")
    assert len(args) == 3
