"""Serving artifact (the Android-.so analog, VERDICT r4 missing#1):
export -> fresh load -> identical recognition results, plus a measured
cold-start comparison between YAML add_obj and the artifact path.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fealess_tpu.engine import CamIntrinsics
from fealess_tpu.io.export import ServingArtifact
from tests.test_engine import FX, FY, CX, CY, _engine, feature_dir  # noqa: F401
from tests.test_match_e2e import H, W

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def artifact_dir(feature_dir, tmp_path_factory):  # noqa: F811
    eng = _engine(feature_dir)
    out = str(tmp_path_factory.mktemp("artifact"))
    eng.export_artifact(out)
    return out, eng


def test_artifact_roundtrip_results(artifact_dir, feature_dir):  # noqa: F811
    out, eng = artifact_dir
    _, (bgr, depth, _), _ = feature_dir
    cam = CamIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H)
    ref = eng.recognition(bgr, depth, cam)
    art = ServingArtifact(out)
    got = art.recognition(bgr, depth, cam)
    assert len(got) == len(ref) == 1
    assert got[0].obj_tag == ref[0].obj_tag
    assert got[0].similarity == pytest.approx(ref[0].similarity)
    np.testing.assert_allclose(got[0].world2cam, ref[0].world2cam,
                               rtol=1e-5, atol=1e-4)
    assert got[0].match_rect == ref[0].match_rect


def test_artifact_files(artifact_dir):
    out, _ = artifact_dir
    for f in ("recognition.jaxexport", "state.npz", "meta.json"):
        assert os.path.exists(os.path.join(out, f)), f
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["version"] == "fealess-artifact-1"
    assert meta["class_names"] == ["obj"]


def test_artifact_cold_start_beats_add_obj(artifact_dir, feature_dir,  # noqa: F811
                                           tmp_path):
    """Fresh-process cold start to a READY (lowered / deserialized)
    Recognition program: the artifact must beat YAML add_obj + jit
    trace/lower.  Readiness is the right boundary here: the XLA backend
    compile below it is identical StableHLO for both paths, and this
    image's XLA:CPU AOT loader segfaults EXECUTING any cross-process
    deserialized module (verified with a trivial export; the TPU
    backend — the actual serving target — round-trips fine, checked in
    benchmarks/tpu_parity.py's chip phase)."""
    out, _ = artifact_dir
    path, (bgr, depth, _), _ = feature_dir

    common = """
import time, json
t0 = time.perf_counter()
import jax
jax.config.update("jax_platforms", "cpu")
"""
    engine_script = common + f"""
import jax.numpy as jnp
from fealess_tpu import config as cfg, pipeline
from fealess_tpu.engine import ObjReco
ecfg = cfg.EngineConfig(
    detector=cfg.DetectorConfig(image_width={W}, image_height={H},
                                max_candidates=16),
    template_fx={FX}, template_fy={FY}, template_cx={CX},
    template_cy={CY}, refine_crop=128)
eng = ObjReco.create("LmICP", ecfg)
eng.add_obj({path!r})
d = eng.cfg.detector
lowered = pipeline.recognize_top1_jit.lower(
    eng.bank, eng._model_depth_dev, eng._origins_dev,
    jnp.zeros((d.image_height, d.image_width, 3), jnp.uint8),
    jnp.zeros((d.image_height, d.image_width), jnp.uint16),
    jnp.zeros((3, 3), jnp.float32), eng.cfg, kernels=eng._kernels)
assert lowered is not None
print(json.dumps({{"ready_s": time.perf_counter() - t0}}))
"""
    artifact_script = common + f"""
from fealess_tpu.io.export import ServingArtifact
art = ServingArtifact({out!r})
assert art._call is not None
print(json.dumps({{"ready_s": time.perf_counter() - t0}}))
"""

    def run(script):
        p = subprocess.run([sys.executable, "-c", script], cwd=ROOT,
                           capture_output=True, text=True, timeout=600)
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    eng_cold = run(engine_script)
    art_cold = run(artifact_script)
    assert art_cold["ready_s"] < eng_cold["ready_s"], (art_cold, eng_cold)
    print(f"cold start to ready program: engine {eng_cold['ready_s']:.2f}s"
          f" vs artifact {art_cold['ready_s']:.2f}s")
