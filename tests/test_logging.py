"""Logging-sink tests: meter math and training_log.txt byte format."""
import numpy as np

from ep_tpu.configs import TrainConfig
from ep_tpu.utils.logging import MetricLogger, SmoothedValue, TrainingLogFile


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0  # window keeps [2,3,4]
    assert abs(v.avg - 3.0) < 1e-9
    assert abs(v.global_avg - 2.5) < 1e-9
    v.update(10.0, n=6)
    assert abs(v.global_avg - (1 + 2 + 3 + 4 + 60) / 10) < 1e-9


def test_metric_logger_update_and_str():
    m = MetricLogger()
    m.update(loss=2.0, acc1=50.0)
    m.update(loss=1.0, acc1=100.0)
    assert abs(m.meters["loss"].global_avg - 1.5) < 1e-9
    assert "loss" in str(m) and "acc1" in str(m)
    stats = m.stats()
    assert stats["acc1"] == 75.0


def test_training_log_format(tmp_path):
    cfg = TrainConfig(model="vit_base_patch16", dataset_name="imagenet1k",
                      cls_features="ep", batch_size=512, blr=0.1,
                      output_dir=str(tmp_path))
    log = TrainingLogFile(str(tmp_path))
    log.write_header(cfg)
    log.write_setup(4096, 1234567)
    log.write_epoch(0, {"loss": 4.6973, "acc1": 1.37},
                    {"loss": 4.5158, "acc1": 3.01, "acc5": 11.50})
    log.write_final(3.01, {"acc1": 3.01, "acc5": 11.50}, "0:01:00")
    text = (tmp_path / "training_log.txt").read_text()
    # exact reference line formats (main_linprobe.py:186-196,574-578,719-722)
    assert text.startswith("Training Log\n")
    assert "Model: vit_base_patch16\n" in text
    assert "Batch size per GPU: 512\n" in text
    assert "Base learning rate: 0.1\n" in text
    assert "Effective batch size: 4096\n" in text
    assert "Trainable Parameters: 1,234,567\n" in text
    assert "Epoch, Train Loss, Train Acc1, Val Loss, Val Acc1, Val Acc5\n" in text
    assert "0, 4.6973, 1.37, 4.5158, 3.01, 11.50\n" in text
    assert "Max Accuracy: 3.01%\n" in text
    # the LR-search driver's parser finds the value
    import re
    m = [l for l in text.splitlines() if "Max Accuracy" in l][0]
    assert float(re.findall(r"[\d.]+", m)[0]) == 3.01
