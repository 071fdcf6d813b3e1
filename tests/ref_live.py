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
    touched: set[str] = set()

    def put(modname: str, mod: types.ModuleType) -> None:
        # record only the PRE-CALL state, once per name: when an
        # extra_modules entry overrides a stub this call just installed,
        # re-recording would "restore" the stub permanently (review r05 —
        # it leaked attribute-permissive fakes into sys.modules for the
        # rest of the process)
        if modname not in touched:
            touched.add(modname)
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


# ---- whole-main live execution (VERDICT r04 item 2) --------------------
#
# The functions above exercise the reference's hot FUNCTIONS; the shim
# below executes the ENTIRE nuScenes lift main (2d_to_3d.py:343-938 —
# multi-sweep aggregation, the two-pass scene barrier, pass-2 box
# assembly, per-sample circle-NMS grouping, and the submission writer)
# over the tests/nusc_fixture.py dataroot, by duck-typing the handful of
# devkit objects main touches with FUNCTIONAL stand-ins served from the
# repo's own devkit-free readers (datasets/nuscenes/{tables,maps}.py).


class _MiniQuaternion:
    """Functional pyquaternion.Quaternion stand-in for exactly the ops
    main performs: wxyz-list construction, matrix= construction,
    .rotation_matrix, and list() iteration (which feeds the reference's
    documented wxyz-into-scipy-xyzw push_centroid quirk — element order
    here IS the behavior under test, so it must be pyquaternion's
    [w, x, y, z])."""

    def __init__(self, q=None, matrix=None):
        import numpy as np

        if matrix is not None:
            from scipy.spatial.transform import Rotation as R

            x, y, z, w = R.from_matrix(np.asarray(matrix, float)).as_quat()
            self.q = np.array([w, x, y, z], float)
        else:
            if isinstance(q, _MiniQuaternion):
                q = q.q
            self.q = np.asarray(q, float)

    @property
    def rotation_matrix(self):
        import numpy as np
        from scipy.spatial.transform import Rotation as R

        w, x, y, z = self.q / np.linalg.norm(self.q)
        return R.from_quat([x, y, z, w]).as_matrix()

    def __iter__(self):
        return iter(self.q.tolist())


def _point_in_ring(x: float, y: float, ring) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


class _MiniPoint:
    """shapely.geometry.Point stand-in; .within accepts the polygon
    values our NuScenesMapLite.extract_polygon returns (ext, holes)."""

    def __init__(self, x, y):
        self.x, self.y = float(x), float(y)

    def within(self, polygon) -> bool:
        ext, holes = polygon
        return _point_in_ring(self.x, self.y, ext) and not any(
            _point_in_ring(self.x, self.y, h) for h in holes
        )


def _functional_modules(fixture_root, version: str, scene_names):
    """sys.modules entries that make the reference main RUN (vs the inert
    placeholders): a duck-typed NuScenes/NuScenesMap over the fixture
    tables, real splits, pyquaternion/shapely/pycocotools stand-ins."""
    import numpy as np

    from cm3d_tpu.datasets.nuscenes.maps import NuScenesMapLite
    from cm3d_tpu.datasets.nuscenes.tables import NuScenesTables
    from cm3d_tpu.ops import rle as _rle

    class _NuScenes:
        # reference signature: NuScenes(VER_NAME, INPUT_PATH, verbose);
        # the fixture's version dir is authoritative, VER_NAME is the
        # reference's hardcoded constant
        def __init__(self, _ver, dataroot, *a, **k):
            self._t = NuScenesTables(fixture_root, version)
            self.dataroot = str(fixture_root)

        def get(self, table, token):
            return self._t.get(table, token)

        def field2token(self, table, field, value):
            return self._t.field2token(table, field, value)

    class _NuScenesMap(NuScenesMapLite):
        def __init__(self, dataroot=None, map_name=None):
            super().__init__(fixture_root, map_name)

    def _mk(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    def _decode_many(rles):
        if not rles:
            return np.zeros((1, 1, 0), np.uint8)
        return np.stack([_rle.decode(r) for r in rles], axis=-1)

    nusc_pkg = _mk("nuscenes")
    mods = {
        "nuscenes": nusc_pkg,
        "nuscenes.nuscenes": _mk(
            "nuscenes.nuscenes", NuScenes=_NuScenes,
            NuScenesExplorer=_Placeholder("NuScenesExplorer"),
        ),
        "nuscenes.utils": _mk("nuscenes.utils"),
        "nuscenes.utils.data_classes": _mk(
            "nuscenes.utils.data_classes",
            Box=_Placeholder("Box"), Quaternion=_MiniQuaternion,
        ),
        "nuscenes.utils.splits": _mk(
            "nuscenes.utils.splits", mini_val=list(scene_names),
            mini_train=[], train_detect=[], train=[], val=[],
        ),
        "nuscenes.map_expansion": _mk("nuscenes.map_expansion"),
        "nuscenes.map_expansion.map_api": _mk(
            "nuscenes.map_expansion.map_api", NuScenesMap=_NuScenesMap,
        ),
        "nuscenes.map_expansion.arcline_path_utils": _mk(
            "nuscenes.map_expansion.arcline_path_utils"
        ),
        "nuscenes.map_expansion.bitmap": _mk(
            "nuscenes.map_expansion.bitmap", BitMap=_Placeholder("BitMap"),
        ),
        "pyquaternion": _mk("pyquaternion", Quaternion=_MiniQuaternion),
        "shapely": _mk("shapely"),
        "shapely.geometry": _mk(
            "shapely.geometry", Point=_MiniPoint, box=_Placeholder("box"),
        ),
        "pycocotools": None,  # filled below (needs the mask submodule)
    }
    pyco_mask = _mk("pycocotools.mask", decode=_decode_many)
    pyco = _mk("pycocotools")
    pyco.mask = pyco_mask
    mods["pycocotools"] = pyco
    mods["pycocotools.mask"] = pyco_mask
    return mods


def run_nuscenes_main(fixture_root, mask_dir, scene_names,
                      version: str = "v1.0-fake") -> dict:
    """Execute the reference's nuScenes 2d_to_3d.py WHOLE main over the
    fixture dataroot; returns its submission JSON. Layout is staged so the
    reference's hardcoded relative paths (INPUT_PATH ../../data/nuScenes/,
    INPUT_DIR ../../mask_outputs/nuscenes-detic/, OUTPUT_DIR
    ../../outputs/nuscenes/, cfg/shape_priors_chatgpt.json) resolve from a
    scratch cwd mirroring the repo layout the script expects."""
    import json
    import os
    import shutil
    import tempfile

    from cm3d_tpu.config import SHAPE_PRIORS_CHATGPT

    scratch = Path(tempfile.mkdtemp(prefix="refmain_"))
    try:
        run_dir = scratch / "src" / "nuscenes"
        (run_dir / "cfg").mkdir(parents=True)
        (scratch / "outputs" / "nuscenes").mkdir(parents=True)
        (scratch / "data").mkdir()
        os.symlink(os.path.abspath(fixture_root), scratch / "data" / "nuScenes")
        (scratch / "mask_outputs").mkdir()
        os.symlink(os.path.abspath(mask_dir),
                   scratch / "mask_outputs" / "nuscenes-detic")
        with open(run_dir / "cfg" / "shape_priors_chatgpt.json", "w") as f:
            json.dump({k: list(v) for k, v in SHAPE_PRIORS_CHATGPT.items()},
                      f)

        pcd = load_pcd("nuscenes")
        utils_pkg = types.ModuleType("utils")
        utils_pkg.pcd = pcd
        extra = _functional_modules(
            os.path.abspath(fixture_root), version, scene_names
        )
        extra["utils"] = utils_pkg
        extra["utils.pcd"] = pcd

        cwd = os.getcwd()
        os.chdir(run_dir)
        try:
            # module name "__main__" => the reference's
            # `if __name__ == "__main__"` main body EXECUTES on load
            _load(REF_DIR / "2d_to_3d.py", "__main__", extra_modules=extra)
        finally:
            os.chdir(cwd)

        out = scratch / "outputs" / "nuscenes" / "pseudolabels_minival.json"
        with open(out) as f:
            return json.load(f)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


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
