"""INI compatibility-loader tests against the reference's own config file
(guarded) and a synthetic INI."""

import os

import pytest

from improved_body_parts_tpu.configs import CanonicalConfig
from improved_body_parts_tpu.utils.config_reader import apply_ini, read_ini


def test_synthetic_ini(tmp_path):
    ini = tmp_path / "config"
    ini.write_text("""
[param]
modelID = 1
scale_search = 0.5, 1, 1.5  # comment
thre1 = 0.2
thre2 = 0.15
connect_ration = 0.9
mid_num = 10
len_rate = 8
connection_tole = 0.6
remove_recon = 1
offset_radius = 3

[models]
[[1]]
boxsize = 384
padValue = 127
stride = 4
max_downsample = 32
""")
    cfg = apply_ini(CanonicalConfig(), str(ini))
    assert cfg.infer.scale_search == (0.5, 1.0, 1.5)
    assert cfg.infer.thre1 == 0.2
    assert cfg.infer.mid_num == 10
    assert cfg.infer.remove_recon is True
    assert cfg.infer.boxsize == 384
    assert cfg.infer.pad_value == 127
    assert cfg.infer.max_downsample == 32


def test_reference_ini_golden():
    path = "/root/reference/utils/config"
    if not os.path.exists(path):
        pytest.skip("reference INI not available")
    param, model = read_ini(path)
    assert param["thre1"] == 0.1
    assert param["mid_num"] == 20
    assert param["len_rate"] == 16
    assert model["boxsize"] == 512
    assert model["max_downsample"] == 64
    cfg = apply_ini(CanonicalConfig(), path)
    assert cfg.infer.scale_search == (0.5, 1.0, 1.5, 2.0, 3.0)
    assert cfg.infer.connection_tole == 0.7
    assert cfg.infer.remove_recon is False
