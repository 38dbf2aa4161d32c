import os
import time

import numpy as np
import pytest

from nerf_prv_tpu.labeling.labels import HB_SKIP, hb_view_counts
from nerf_prv_tpu.core.config import Config
from nerf_prv_tpu.utils import Stopwatch, TimingRegistry


def test_stopwatch_laps():
    sw = Stopwatch()
    time.sleep(0.01)
    d1 = sw.lap()
    assert d1 >= 0.009
    d2 = sw.lap()
    assert d2 < d1


def test_timing_registry_and_artifacts(tmp_path):
    reg = TimingRegistry()
    with reg.phase("train"):
        time.sleep(0.01)
    with reg.phase("train"):
        time.sleep(0.01)
    assert reg.total("train") >= 0.019
    s = reg.summary()
    assert s["train"]["count"] == 2
    reg.write_artifact(str(tmp_path), "train_time", "0", value=reg.total("train"))
    assert float(open(tmp_path / "train_time" / "0.txt").read()) >= 0.019
    reg.dump(str(tmp_path / "timings.json"))
    assert os.path.exists(tmp_path / "timings.json")


def test_hb_view_counts_skip_set():
    counts = hb_view_counts()
    assert 13 not in counts and 17 not in counts and 31 not in counts
    assert 41 not in counts and 47 not in counts
    assert counts[0] == 3 and counts[-1] == 49
    assert all(c % 2 == 1 for c in counts)


def test_hb_config_coverage_override():
    cfg = Config(is_shape_net=False)
    assert cfg.effective_coverage_max == 90
    assert cfg.effective_coverage_add == 1
    cfg2 = Config(is_shape_net=True)
    assert cfg2.effective_coverage_max == 50
    assert cfg2.effective_coverage_add == 2
