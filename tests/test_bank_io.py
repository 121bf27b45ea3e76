"""Template bank packing and reference-schema YAML round-trips."""

import numpy as np
import pytest

from fealess_tpu import config as cfg
from fealess_tpu.bank import TemplateView, pack_bank, unpack_bank
from fealess_tpu.io import linemod_yaml


def _view(rng, levels=2, nf=(10, 5)):
    feats = [[rng.integers(0, 40, size=(nf[l], 3)).astype(np.int32) % [40, 40, 8]
              for _ in range(2)] for l in range(levels)]
    return TemplateView(features=feats,
                        width=[38, 19], height=[30, 15],
                        offset_x=[100, 50], offset_y=[60, 30],
                        pose=rng.normal(size=13).astype(np.float32))


def test_pack_unpack_roundtrip(rng):
    classes = {"cup": [_view(rng), _view(rng)], "box": [_view(rng)]}
    bank = pack_bank(classes, levels=2, capacity=8)
    assert bank.num_templates == 3
    assert bank.class_names == ("box", "cup")
    out = unpack_bank(bank)
    for cname in classes:
        assert len(out[cname]) == len(classes[cname])
        for v1, v2 in zip(classes[cname], out[cname]):
            np.testing.assert_allclose(v2.pose, v1.pose)
            assert list(v2.width) == list(v1.width)
            for l in range(2):
                for m in range(2):
                    np.testing.assert_array_equal(v2.features[l][m],
                                                  v1.features[l][m])


def test_yaml_roundtrip(rng, tmp_path):
    det = cfg.DetectorConfig()
    classes = {"cup": [_view(rng)], "box": [_view(rng), _view(rng)]}
    path = str(tmp_path / "linemod_templates.yml")
    linemod_yaml.save_linemod(path, det, classes)
    det2, classes2 = linemod_yaml.load_linemod(path)
    assert det2.t_at_level == det.t_at_level
    assert det2.color_gradient == det.color_gradient
    assert det2.depth_normal == det.depth_normal
    assert set(classes2) == set(classes)
    for cname in classes:
        for v1, v2 in zip(classes[cname], classes2[cname]):
            np.testing.assert_allclose(v2.pose, v1.pose, rtol=1e-6)
            assert list(v2.width) == list(v1.width)
            assert list(v2.offset_x) == list(v1.offset_x)
            for l in range(2):
                for m in range(2):
                    np.testing.assert_array_equal(v2.features[l][m],
                                                  v1.features[l][m])


def test_capacity_overflow(rng):
    with pytest.raises(ValueError):
        pack_bank({"a": [_view(rng), _view(rng)]}, levels=2, capacity=1)
