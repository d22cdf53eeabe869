"""Every CLI entry point parses --help cleanly (argparse wiring; heavy
imports live inside main() so this is fast)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIS = [
    "trainer.py", "refiner.py", "completor.py", "evaluate_depth.py",
    "evaluate_completion.py", "inf_depth_map.py", "inf_gdc.py",
    "export_detection.py", "export_gt_depth.py", "sparsify.py",
    "gen2channel.py", "gen2cha_completion.py", "gen2channel_detec.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, cli), "--help"],
        capture_output=True, text=True, timeout=120, env=env, cwd=ROOT)
    assert r.returncode == 0, (cli, r.stderr[-500:])
    assert "usage" in r.stdout.lower(), cli
