"""CLI surface smoke: arg parsing and help paths of every entry point (the
full flows are covered by the synthetic end-to-end tests; these catch
import/flag regressions cheaply)."""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy jit/model suite; excluded by -m 'not slow'

CLIS = ["train.py", "test.py", "run.py", "demo.py", "app.py", "serve.py",
        "bench.py", "scripts/convert_checkpoint.py"]


@pytest.mark.parametrize("cli", CLIS)
def test_help_exits_cleanly(cli):
    if cli in ("app.py", "bench.py"):
        pytest.skip("no argparse help (positional/flag style)")
    out = subprocess.run([sys.executable, cli, "--help"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()


def test_config_grid_loads():
    from edgecape_tpu.config import Config
    for split in (1, 3, 5):
        for shots in (1, 5):
            for part in ("train", "test"):
                cfg = Config.from_file(
                    f"configs/{part}/{shots}shot_split{split}.py")
                assert cfg.train_data.num_shots == shots
                assert f"split{split}" in cfg.test_data.ann_file
                if part == "test":
                    # test configs bake the stage-3 flags (reference
                    # configs/test/*.py behavior)
                    assert cfg.model.learn_skeleton
                    assert cfg.model.attn_bias


def test_cfg_options_override():
    from edgecape_tpu.config import Config
    cfg = Config.from_file("configs/train/1shot_split1.py").override(
        ["model.learn_skeleton=true", "train.batch_size=4",
         "train_data.sigma=2.0"])
    assert cfg.model.learn_skeleton is True
    assert cfg.train.batch_size == 4
    assert cfg.train_data.sigma == 2.0
