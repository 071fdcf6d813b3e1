"""Execute the reference's OWN code as a live oracle (study/verify only).

VERDICT r03 item 1: the nuScenes lift core was pinned only against
hand-transcribed numpy oracles (tests/oracle.py) — a transcription error
landing in both the oracle and the implementation would be undetectable.
The reference's hot functions depend only on torch/numpy/scipy, which are
installed; this module imports /root/reference/src/nuscenes/2d_to_3d.py
and utils/pcd.py via importlib with the absent heavy dependencies
(nuscenes devkit, pyquaternion, shapely, groundingdino, segment_anything,
hdbscan, pycocotools, numba, torchvision) stubbed in sys.modules, so
tests can CALL the reference implementation directly:

    get_medoid            2d_to_3d.py:116-119
    push_centroid         2d_to_3d.py:164-198
    lane_yaws_distances_and_coords  2d_to_3d.py:277-302
    circle_nms            2d_to_3d.py:309-332
    get_detection_name / get_shape_prior  2d_to_3d.py:121-159
    view_points / LidarPointCloud (transform chain)  utils/pcd.py

No reference code is copied into the repo: the files are loaded from the
read-only mount at test time and skipped (pytest.skip) if absent.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF_ROOT = Path("/root/reference/src")
REF_DIR = REF_ROOT / "nuscenes"

# dotted module names the reference imports that this image lacks; each
# becomes an attribute-permissive stub (module-level `from x import y`
# resolves y to an inert placeholder that raises only if USED)
_STUB_MODULES = [
    "torchvision",
    "pyquaternion",
    "numba",
    "pycocotools",
    "pycocotools.mask",
    "hdbscan",
    "shapely",
    "shapely.geometry",
    "trimesh",          # waymo fork
    "open3d",           # kitti fork
    "kitti_object",     # kitti fork (sibling module, heavy deps)
    "cfg",              # per-fork cfg package (prompt tables)
    "cfg.prompt_cfg",
    "tensorflow",       # waymo fork
    "tensorflow.compat",
    "tensorflow.compat.v1",
    "waymo_open_dataset",
    "waymo_open_dataset.utils",
    "waymo_open_dataset.utils.range_image_utils",
    "waymo_open_dataset.utils.transform_utils",
    "waymo_open_dataset.utils.frame_utils",
    "waymo_open_dataset.dataset_pb2",
    "waymo_open_dataset.protos",
    "waymo_open_dataset.protos.metrics_pb2",
    "groundingdino",
    "groundingdino.datasets",
    "groundingdino.datasets.transforms",
    "groundingdino.models",
    "groundingdino.util",
    "groundingdino.util.slconfig",
    "groundingdino.util.utils",
    "segment_anything",
    "nuscenes",
    "nuscenes.nuscenes",
    "nuscenes.utils",
    "nuscenes.utils.data_classes",
    "nuscenes.utils.geometry_utils",
    "nuscenes.utils.splits",
    "nuscenes.map_expansion",
    "nuscenes.map_expansion.map_api",
    "nuscenes.map_expansion.arcline_path_utils",
    "nuscenes.map_expansion.bitmap",
]


class _Placeholder:
    """Inert stand-in for a symbol from a stubbed dependency: importable,
    attributable, and callable (the waymo fork calls
    tf.enable_eager_execution() at module scope) — calls/attrs chain to
    further placeholders; any VALUE use (iteration, conversion,
    arithmetic) raises loudly."""

    def __init__(self, name: str):
        self._name = name

    def __call__(self, *a, **k):
        return _Placeholder(f"{self._name}()")

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return _Placeholder(f"{self._name}.{item}")

    def _used(self):
        raise RuntimeError(f"stubbed reference dependency used: {self._name}")

    def __iter__(self):
        self._used()

    def __int__(self):
        self._used()

    def __float__(self):
        self._used()

    def __array__(self, *a, **k):
        self._used()


class _StubModule(types.ModuleType):
    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return _Placeholder(f"{self.__name__}.{item}")


def _load(path: Path, name: str, extra_modules: dict | None = None):
    saved: dict[str, object] = {}
    injected: list[str] = []

    def put(modname: str, mod: types.ModuleType) -> None:
        if modname in sys.modules:
            saved[modname] = sys.modules[modname]
        else:
            injected.append(modname)
        sys.modules[modname] = mod

    try:
        for modname in _STUB_MODULES:
            if modname not in sys.modules:
                stub = _StubModule(modname)
                put(modname, stub)
                parent, _, child = modname.rpartition(".")
                if parent and parent in sys.modules:
                    setattr(sys.modules[parent], child, stub)
        for modname, mod in (extra_modules or {}).items():
            put(modname, mod)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for modname in injected:
            sys.modules.pop(modname, None)
        sys.modules.update(saved)


_CACHE: dict[str, types.ModuleType] = {}


def reference_available() -> bool:
    return (REF_DIR / "2d_to_3d.py").is_file()


def load_pcd(dataset: str = "nuscenes"):
    """The reference's <dataset>/utils/pcd.py (LidarPointCloud,
    view_points)."""
    key = f"pcd_{dataset}"
    if key not in _CACHE:
        _CACHE[key] = _load(
            REF_ROOT / dataset / "utils" / "pcd.py", f"ref_pcd_{dataset}"
        )
    return _CACHE[key]


def load_2d_to_3d(dataset: str = "nuscenes"):
    """The reference's <dataset>/2d_to_3d.py (the nuScenes original or
    the Waymo/KITTI forks), with its `utils.pcd` import bound to the
    live-loaded module above and the per-run `timer` global (normally
    created inside its main loop) pre-seeded so the timed helpers are
    callable."""
    key = f"lift_{dataset}"
    if key not in _CACHE:
        pcd = load_pcd(dataset)
        utils_pkg = types.ModuleType("utils")
        utils_pkg.pcd = pcd
        mod = _load(
            REF_ROOT / dataset / "2d_to_3d.py",
            f"ref_2d_to_3d_{dataset}",
            extra_modules={"utils": utils_pkg, "utils.pcd": pcd},
        )
        mod.timer = {"closest lane": 0.0}
        _CACHE[key] = mod
    return _CACHE[key]
