"""Reference-compatible template database I/O.

Reads and writes the ``linemod_templates.yml`` schema produced by the
reference's ``writeLinemod`` (linemod/linemod_if.cpp:49-63) /
``Detector::writeClass`` (linemod/linemod.cpp:1764-1794), via
cv2.FileStorage so reference-trained banks load unchanged and banks trained
here load in the reference.

Schema (OpenCV YAML):
  pyramid_levels: L
  T: [T0, T1, ...]
  modalities: [{type: ColorGradient, weak_threshold, num_features,
                strong_threshold},
               {type: DepthNormal, distance_threshold, difference_threshold,
                num_features, extract_threshold}]
  classes:
    - class_id, modalities: [names], pyramid_levels,
      template_pyramids:
        - template_id, template_pose: [13 floats],
          templates: [{width, height, offset_x, offset_y, pyramid_level,
                       features: [[x, y, label], ...]}, ...]   # order l*M+m
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import cv2
import numpy as np

from fealess_tpu import config as cfg
from fealess_tpu.bank import TemplateView

CG_NAME = "ColorGradient"
DN_NAME = "DepthNormal"


def _read_int_seq(node) -> List[int]:
    return [int(node.at(i).real()) for i in range(node.size())]


def _read_float_seq(node) -> List[float]:
    return [float(node.at(i).real()) for i in range(node.size())]


def load_linemod(path: str) -> Tuple[cfg.DetectorConfig,
                                     Dict[str, List[TemplateView]]]:
    """Load a reference template database -> (detector config, classes)."""
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise IOError(f"cannot open {path}")
    try:
        root = fs.root()
        levels = int(root.getNode("pyramid_levels").real())
        t_at_level = tuple(_read_int_seq(root.getNode("T")))
        assert len(t_at_level) == levels

        cg = cfg.ColorGradientConfig()
        dn = cfg.DepthNormalConfig()
        mods_node = root.getNode("modalities")
        mod_names = []
        for i in range(mods_node.size()):
            m = mods_node.at(i)
            mtype = m.getNode("type").string()
            mod_names.append(mtype)
            if mtype == CG_NAME:
                cg = cfg.ColorGradientConfig(
                    weak_threshold=m.getNode("weak_threshold").real(),
                    num_features=int(m.getNode("num_features").real()),
                    strong_threshold=m.getNode("strong_threshold").real())
            elif mtype == DN_NAME:
                dn = cfg.DepthNormalConfig(
                    distance_threshold=int(m.getNode("distance_threshold").real()),
                    difference_threshold=int(m.getNode("difference_threshold").real()),
                    num_features=int(m.getNode("num_features").real()),
                    extract_threshold=int(m.getNode("extract_threshold").real()))
            else:
                raise ValueError(f"unknown modality {mtype!r}")
        n_mod = len(mod_names)

        classes: Dict[str, List[TemplateView]] = {}
        cls_node = root.getNode("classes")
        for ci in range(cls_node.size()):
            class_id, views = _read_class_node(cls_node.at(ci), levels,
                                               n_mod)
            classes[class_id] = views

        name_map = {CG_NAME: "color_gradient", DN_NAME: "depth_normal"}
        det = cfg.DetectorConfig(t_at_level=t_at_level, color_gradient=cg,
                                 depth_normal=dn,
                                 modalities=tuple(name_map[m]
                                                  for m in mod_names))
        return det, classes
    finally:
        fs.release()


def _read_class_node(c, levels: int, n_mod: int):
    """One class map -> (class_id, views) (Detector::readClass,
    linemod.cpp:1711-1762)."""
    class_id = c.getNode("class_id").string()
    assert int(c.getNode("pyramid_levels").real()) == levels
    views: List[TemplateView] = []
    tps = c.getNode("template_pyramids")
    for ti in range(tps.size()):
        tp = tps.at(ti)
        assert int(tp.getNode("template_id").real()) == ti
        pose = np.asarray(_read_float_seq(tp.getNode("template_pose")),
                          np.float32)
        templates = tp.getNode("templates")
        assert templates.size() == levels * n_mod
        feats = [[None] * n_mod for _ in range(levels)]
        width = [0] * levels
        height = [0] * levels
        off_x = [0] * levels
        off_y = [0] * levels
        for j in range(templates.size()):
            t = templates.at(j)
            l = int(t.getNode("pyramid_level").real())
            m = j % n_mod
            assert j // n_mod == l, "unexpected template order"
            fnode = t.getNode("features")
            arr = np.zeros((fnode.size(), 3), np.int32)
            for k in range(fnode.size()):
                arr[k] = _read_int_seq(fnode.at(k))
            feats[l][m] = arr
            width[l] = int(t.getNode("width").real())
            height[l] = int(t.getNode("height").real())
            off_x[l] = int(t.getNode("offset_x").real())
            off_y[l] = int(t.getNode("offset_y").real())
        views.append(TemplateView(features=feats, width=width,
                                  height=height, offset_x=off_x,
                                  offset_y=off_y, pose=pose))
    return class_id, views


def save_linemod(path: str, det: cfg.DetectorConfig,
                 classes: Dict[str, List[TemplateView]]) -> None:
    """Write a template database in the reference schema."""
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_WRITE)
    if not fs.isOpened():
        raise IOError(f"cannot open {path} for writing")
    try:
        fs.write("pyramid_levels", det.pyramid_levels)
        fs.startWriteStruct("T", cv2.FILE_NODE_SEQ | cv2.FILE_NODE_FLOW)
        for t in det.t_at_level:
            fs.write("", int(t))
        fs.endWriteStruct()

        fs.startWriteStruct("modalities", cv2.FILE_NODE_SEQ)
        if "color_gradient" in det.modalities:
            fs.startWriteStruct("", cv2.FILE_NODE_MAP)
            fs.write("type", CG_NAME)
            fs.write("weak_threshold",
                     float(det.color_gradient.weak_threshold))
            fs.write("num_features", int(det.color_gradient.num_features))
            fs.write("strong_threshold",
                     float(det.color_gradient.strong_threshold))
            fs.endWriteStruct()
        if "depth_normal" in det.modalities:
            fs.startWriteStruct("", cv2.FILE_NODE_MAP)
            fs.write("type", DN_NAME)
            fs.write("distance_threshold",
                     int(det.depth_normal.distance_threshold))
            fs.write("difference_threshold",
                     int(det.depth_normal.difference_threshold))
            fs.write("num_features", int(det.depth_normal.num_features))
            fs.write("extract_threshold",
                     int(det.depth_normal.extract_threshold))
            fs.endWriteStruct()
        fs.endWriteStruct()

        fs.startWriteStruct("classes", cv2.FILE_NODE_SEQ)
        for class_id in sorted(classes.keys()):
            fs.startWriteStruct("", cv2.FILE_NODE_MAP)
            _write_class_fields(fs, class_id, det, classes[class_id])
            fs.endWriteStruct()
        fs.endWriteStruct()
    finally:
        fs.release()


def _write_class_fields(fs, class_id: str, det: cfg.DetectorConfig,
                        views: List[TemplateView]) -> None:
    """Class fields (Detector::writeClass, linemod.cpp:1764-1794), written
    into the currently open map/root."""
    fs.write("class_id", class_id)
    fs.startWriteStruct("modalities",
                        cv2.FILE_NODE_SEQ | cv2.FILE_NODE_FLOW)
    if "color_gradient" in det.modalities:
        fs.write("", CG_NAME)
    if "depth_normal" in det.modalities:
        fs.write("", DN_NAME)
    fs.endWriteStruct()
    fs.write("pyramid_levels", det.pyramid_levels)
    fs.startWriteStruct("template_pyramids", cv2.FILE_NODE_SEQ)
    for ti, v in enumerate(views):
        fs.startWriteStruct("", cv2.FILE_NODE_MAP)
        fs.write("template_id", ti)
        fs.startWriteStruct("template_pose",
                            cv2.FILE_NODE_SEQ | cv2.FILE_NODE_FLOW)
        for p in np.asarray(v.pose, np.float64):
            fs.write("", float(p))
        fs.endWriteStruct()
        fs.startWriteStruct("templates", cv2.FILE_NODE_SEQ)
        for l in range(det.pyramid_levels):
            for m in range(len(det.modalities)):
                fs.startWriteStruct("", cv2.FILE_NODE_MAP)
                fs.write("width", int(v.width[l]))
                fs.write("height", int(v.height[l]))
                fs.write("offset_x", int(v.offset_x[l]))
                fs.write("offset_y", int(v.offset_y[l]))
                fs.write("pyramid_level", l)
                fs.startWriteStruct("features", cv2.FILE_NODE_SEQ)
                for (x, y, label) in np.asarray(v.features[l][m],
                                                np.int64):
                    fs.startWriteStruct(
                        "", cv2.FILE_NODE_SEQ | cv2.FILE_NODE_FLOW)
                    fs.write("", int(x))
                    fs.write("", int(y))
                    fs.write("", int(label))
                    fs.endWriteStruct()
                fs.endWriteStruct()
                fs.endWriteStruct()
        fs.endWriteStruct()
        fs.endWriteStruct()
    fs.endWriteStruct()


def save_classes(fmt: str, det: cfg.DetectorConfig,
                 classes: Dict[str, List[TemplateView]]) -> None:
    """Per-class files (Detector::writeClasses, linemod.cpp:1808-1818):
    ``fmt`` is a %s-format path, e.g. ``dir/templates_%s.yml.gz``."""
    for class_id in sorted(classes.keys()):
        fs = cv2.FileStorage(fmt % class_id, cv2.FILE_STORAGE_WRITE)
        if not fs.isOpened():
            raise IOError(f"cannot open {fmt % class_id} for writing")
        try:
            _write_class_fields(fs, class_id, det, classes[class_id])
        finally:
            fs.release()


def load_classes(fmt: str, class_ids: List[str], levels: int = 2,
                 n_mod: int = 2) -> Dict[str, List[TemplateView]]:
    """Per-class files (Detector::readClasses, linemod.cpp:1796-1806)."""
    out: Dict[str, List[TemplateView]] = {}
    for cid in class_ids:
        fs = cv2.FileStorage(fmt % cid, cv2.FILE_STORAGE_READ)
        if not fs.isOpened():
            raise IOError(f"cannot open {fmt % cid}")
        try:
            class_id, views = _read_class_node(fs.root(), levels, n_mod)
            out[class_id] = views
        finally:
            fs.release()
    return out
