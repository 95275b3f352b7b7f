"""TensorBoard event-file writer: TFRecord framing + Event proto encoding
must round-trip, and crc32c must match the published test vectors."""

import glob
import os
import struct

import numpy as np
import pytest

from edgecape_tpu.utils import tb_writer


def test_crc32c_vectors():
    # RFC 3720 / kernel test vectors
    assert tb_writer.crc32c(b"") == 0x00000000
    assert tb_writer.crc32c(b"123456789") == 0xE3069283
    assert tb_writer.crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 1)
    w.add_scalar("train/loss", 0.75, 2)
    w.add_scalar("val/PCK", 0.875, 2)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = tb_writer.read_scalars(files[0])
    assert scalars == [("train/loss", 1.5, 1), ("train/loss", 0.75, 2),
                       ("val/PCK", 0.875, 2)]


def test_file_structure_is_tfrecord(tmp_path):
    """First record must be the brain.Event:2 version header with valid
    masked crcs (what the TensorBoard loader checks before reading)."""
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("x", 2.0, 7)
    w.close()
    path = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
    with open(path, "rb") as f:
        header = f.read(8)
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", f.read(4))
        assert hcrc == tb_writer._masked_crc(header)
        payload = f.read(length)
        (pcrc,) = struct.unpack("<I", f.read(4))
        assert pcrc == tb_writer._masked_crc(payload)
        assert b"brain.Event:2" in payload


@pytest.mark.slow  # full Trainer epoch (~3 min on 1 core)
def test_trainer_writes_events(tmp_path):
    """End-to-end: a 1-epoch Trainer run produces a readable event file
    with train/loss and train/lr curves."""
    from edgecape_tpu.config import (Config, DataConfig, ModelConfig,
                                     TrainConfig)
    from edgecape_tpu.data import synthetic
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.train.loop import Trainer

    root = str(tmp_path / "data")
    ann = synthetic.generate(root, num_classes=2, images_per_class=6,
                             image_size=64, seed=0)
    dcfg = DataConfig(ann_file=ann,
                      img_prefix=os.path.join(root, "images"),
                      num_shots=1, num_queries=2, num_episodes=1,
                      image_size=56, heatmap_size=16, max_kpt=16, sigma=1.0)
    cfg = Config(model=ModelConfig(image_size=56, heatmap_size=16,
                                   max_kpt=16),
                 train_data=dcfg,
                 train=TrainConfig(batch_size=4, total_epochs=1,
                                   warmup_iters=2, num_workers=0,
                                   log_interval=1, ckpt_interval=100,
                                   eval_interval=100),
                 work_dir=str(tmp_path / "run"))
    ds = MP100Dataset(dcfg, mode="train")
    Trainer(cfg, ds, None).fit()
    files = glob.glob(str(tmp_path / "run" / "tf_logs" /
                          "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = tb_writer.read_scalars(files[0])
    tags = {t for t, _, _ in scalars}
    assert "train/loss" in tags and "train/lr" in tags
    losses = [v for t, v, _ in scalars if t == "train/loss"]
    assert all(np.isfinite(losses))
