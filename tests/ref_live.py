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

# SHA-256 pins of every reference file this module will exec. The mount is
# designated PUBLIC UNTRUSTED content: executing it in the test process is
# acceptable only for the exact revisions that were reviewed when these
# oracles were written (ADVICE r04). On mismatch the loader refuses and
# the tests skip — an unreviewed revision never executes.
_CONTENT_PINS = {
    "nuscenes/2d_to_3d.py":
        "36aff429603c351d40b374062e21c8d7ae34bb078f468a7a75dc25d6b407340f",
    "waymo/2d_to_3d.py":
        "c6a9f67674eb340f4d7ae9cec4b3f710fa0fda008dd3ab7ead950fdeabc8867f",
    "kitti/2d_to_3d.py":
        "c06852cf1ff7079bfb2d9f46592889a3eee7aacb210c133a3aa0fbc757eba497",
    "nuscenes/utils/pcd.py":
        "c55f963f116e84e77c8ee2c2e6dcfe9075b05021d2680548a5d8dd6eb4ddd62b",
    "waymo/utils/pcd.py":
        "b37ca2afd2df64551d48b6ef8ad543c41991ee4eba80a15c1847d9210fba0b06",
    "kitti/utils/pcd.py":
        "c55f963f116e84e77c8ee2c2e6dcfe9075b05021d2680548a5d8dd6eb4ddd62b",
    "nuscenes/eval_custom.py":
        "bfa64bc2ed4d1f21c54c8dcd539af8f538a9adc2a38e34ebc3e6cc10fbd4f4f4",
    "nuscenes/linear_matching.py":
        "1ff290638ab629d03cef7301df65be33e168b2dc9eec5fe47ba6e8cc2608d30c",
    "waymo/linear_matching.py":
        "4cc37e67c74f211a0d7097fe49f1998fda00ca43ca624080e7fdf76a30d3389f",
}


class PinMismatch(RuntimeError):
    pass


def _check_pin(path: Path) -> None:
    import hashlib

    rel = str(path.relative_to(REF_ROOT))
    pin = _CONTENT_PINS.get(rel)
    if pin is None:
        raise PinMismatch(f"no content pin for reference file {rel}; "
                          f"review it and add its sha256 to _CONTENT_PINS")
    got = hashlib.sha256(path.read_bytes()).hexdigest()
    if got != pin:
        raise PinMismatch(
            f"reference file {rel} changed since its oracle review "
            f"(sha256 {got} != pinned {pin}); re-review before executing"
        )

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

    _check_pin(path)
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
    """Skip-gate: the reference mount is present AND every pinned file
    still matches its reviewed sha256 (see _CONTENT_PINS)."""
    if not (REF_DIR / "2d_to_3d.py").is_file():
        return False
    try:
        for rel in _CONTENT_PINS:
            p = REF_ROOT / rel
            if p.is_file():
                _check_pin(p)
    except PinMismatch:
        return False
    return True


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
