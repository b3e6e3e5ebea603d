"""Minimal numpy-backed mock of ``bpy``/``bmesh``/``mathutils``/``bpy_extras``.

Enough surface to *execute* the crt_tpu Blender add-on outside Blender:
registration, PropertyGroups (annotation-evaluated defaults), the depsgraph
walk in scene_bridge (bmesh triangulation included), the RenderEngine
Combined-pass contract, operators (incl. ``bpy.ops.crt.debug_ray_add``), and
the exporter/importer round trip.  Mirrors the behavioral subset of the
Blender 4.x API that the reference add-on (reference src/blender/) relies on.

Usage::

    import mock_bpy
    mods = mock_bpy.install()     # installs sys.modules entries + reloads
    ...                           # the crt_tpu.frontend.blender modules
    mock_bpy.uninstall()          # removes mocks and reloads bpy-less
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np

# --------------------------------------------------------------------------
# mathutils
# --------------------------------------------------------------------------


class Vector:
    def __init__(self, seq=(0.0, 0.0, 0.0)):
        self._v = np.array([float(x) for x in seq], np.float64)

    def __getitem__(self, i):
        return float(self._v[i])

    def __len__(self):
        return len(self._v)

    def __iter__(self):
        return iter(float(x) for x in self._v)

    x = property(lambda self: float(self._v[0]))
    y = property(lambda self: float(self._v[1]))
    z = property(lambda self: float(self._v[2]))

    @property
    def length(self):
        return float(np.linalg.norm(self._v))

    def to_track_quat(self, track, up):
        return (1.0, 0.0, 0.0, 0.0)

    def copy(self):
        return Vector(self._v)


class Matrix:
    def __init__(self, rows=None):
        if rows is None:
            self.a = np.eye(4)
        else:
            self.a = np.array([[float(v) for v in r] for r in rows], np.float64)

    @classmethod
    def Identity(cls, n):
        m = cls.__new__(cls)
        m.a = np.eye(n)
        return m

    @classmethod
    def Translation(cls, v):
        m = cls.Identity(4)
        m.a[:3, 3] = np.asarray(list(v), np.float64)
        return m

    @classmethod
    def _wrap(cls, a):
        m = cls.__new__(cls)
        m.a = np.array(a, np.float64)
        return m

    def to_3x3(self):
        return Matrix._wrap(self.a[:3, :3])

    def to_4x4(self):
        out = np.eye(4)
        n = self.a.shape[0]
        out[:n, :n] = self.a if n == 4 else self.a[:3, :3]
        if n == 4:
            out = np.array(self.a)
        return Matrix._wrap(out)

    def transposed(self):
        return Matrix._wrap(self.a.T)

    @property
    def translation(self):
        return Vector(self.a[:3, 3])

    @translation.setter
    def translation(self, v):
        self.a[:3, 3] = np.asarray(list(v), np.float64)

    def __matmul__(self, other):
        if isinstance(other, Matrix):
            return Matrix._wrap(self.a @ other.a)
        if isinstance(other, Vector):
            v = np.asarray(list(other), np.float64)
            if self.a.shape == (4, 4) and v.shape == (3,):
                out = self.a @ np.append(v, 1.0)
                return Vector(out[:3])
            return Vector(self.a @ v)
        return NotImplemented

    def __iter__(self):
        # iterating a Matrix yields rows (as in mathutils)
        return iter([Vector(r) if len(r) == 3 else list(r) for r in self.a])

    def copy(self):
        return Matrix._wrap(self.a)


# --------------------------------------------------------------------------
# property system
# --------------------------------------------------------------------------


class _PropDef:
    def __init__(self, default=None, size=None, type=None, **kw):
        self.default = default
        self.size = size
        self.ptype = type

    def instantiate(self):
        if self.ptype is not None:
            return self.ptype()
        d = self.default
        if isinstance(d, tuple):
            return list(d)
        if d is None and self.size:
            return [0.0] * self.size
        return d


def _prop(default=None, **kw):
    return _PropDef(default=default, **kw)


def IntProperty(default=0, **kw):
    return _PropDef(default=default, **kw)


def FloatProperty(default=0.0, **kw):
    return _PropDef(default=default, **kw)


def BoolProperty(default=False, **kw):
    return _PropDef(default=default, **kw)


def StringProperty(default="", **kw):
    return _PropDef(default=default, **kw)


def EnumProperty(items=(), default=None, **kw):
    if default is None and items:
        default = items[0][0]
    return _PropDef(default=default, **kw)


def FloatVectorProperty(default=None, size=3, **kw):
    if default is None:
        default = tuple([0.0] * size)
    return _PropDef(default=default, size=size, **kw)


def IntVectorProperty(default=None, size=3, **kw):
    if default is None:
        default = tuple([0] * size)
    return _PropDef(default=default, size=size, **kw)


def PointerProperty(type=None, **kw):
    return _PropDef(type=type, **kw)


def _init_annotated_props(obj):
    """Evaluate ``name: XProperty(...)`` annotations (stringified by
    ``from __future__ import annotations``) and set instance defaults."""
    for klass in type(obj).__mro__:
        mod = sys.modules.get(klass.__module__)
        g = getattr(mod, "__dict__", {})
        for name, ann in getattr(klass, "__annotations__", {}).items():
            if hasattr(obj, name) and not isinstance(
                getattr(obj, name, None), _PropDef
            ):
                continue
            if isinstance(ann, _PropDef):
                setattr(obj, name, ann.instantiate())
                continue
            if isinstance(ann, str) and "Property" in ann:
                try:
                    pd = eval(ann, g)  # noqa: S307 - test mock
                except Exception:
                    continue
                if isinstance(pd, _PropDef):
                    setattr(obj, name, pd.instantiate())


class PropertyGroup:
    def __init__(self):
        _init_annotated_props(self)


# --------------------------------------------------------------------------
# bpy.data collections and datablocks
# --------------------------------------------------------------------------


class _Collection(list):
    """bpy.data.<things>: list with .new() and name lookup."""

    def __init__(self, factory):
        super().__init__()
        self._factory = factory

    def new(self, *args, **kw):
        item = self._factory(*args, **kw)
        self.append(item)
        return item


class _CrtHolder:
    """Base for datablocks that grow a ``.crt`` PropertyGroup when the
    add-on assigns ``bpy.types.X.crt = PointerProperty(type=...)``."""

    def __init__(self):
        ptr = getattr(type(self), "crt", None)
        if isinstance(ptr, _PropDef) and ptr.ptype is not None:
            self.crt = ptr.ptype()


class Mesh:
    def __init__(self, name="mesh"):
        self.name = name
        self.vertices = []  # list of Vector
        self.polygons = []  # list of tuple(vert indices)
        self.loops = []
        self.uv_layers = _UVLayers(self)
        self.materials = _Collection(lambda m: m)

    def from_pydata(self, verts, edges, faces):
        self.vertices = [Vector(v) for v in verts]
        self.polygons = [tuple(f) for f in faces]
        self.loops = []
        for f in self.polygons:
            for vi in f:
                loop = types.SimpleNamespace(
                    vertex_index=vi, index=len(self.loops)
                )
                self.loops.append(loop)

    def update(self):
        pass


class _UVLayers(list):
    def __init__(self, mesh):
        super().__init__()
        self._mesh = mesh

    def new(self, name="UVMap"):
        layer = types.SimpleNamespace(
            name=name,
            data=[
                types.SimpleNamespace(uv=(0.0, 0.0))
                for _ in self._mesh.loops
            ],
        )
        self.append(layer)
        return layer

    @property
    def active(self):
        return self[0] if self else None


class Camera(_CrtHolder):
    def __init__(self, name="camera"):
        super().__init__()
        self.name = name
        self.angle = np.radians(90.0)  # sensor-fit axis
        self.angle_y = np.radians(59.0)


class PointLightData(_CrtHolder):
    def __init__(self, name="light", kind="POINT"):
        super().__init__()
        self.name = name
        self.type = kind
        self.energy = 1000.0


class Material(_CrtHolder):
    def __init__(self, name="material"):
        super().__init__()
        self.name = name


class Texture(_CrtHolder):
    def __init__(self, name="texture", kind="NONE"):
        super().__init__()
        self.name = name
        self.type = kind
        self.image = None


class Object:
    def __init__(self, name, data):
        self.name = name
        self.data = data
        self.location = Vector((0, 0, 0))
        self.matrix_world = Matrix.Identity(4)
        self.empty_display_type = None
        self.empty_display_size = 1.0
        self.rotation_mode = "XYZ"
        self.rotation_quaternion = (1, 0, 0, 0)
        if isinstance(data, Mesh):
            self.type = "MESH"
        elif isinstance(data, PointLightData):
            self.type = "LIGHT"
        elif isinstance(data, Camera):
            self.type = "CAMERA"
        else:
            self.type = "EMPTY"

    @property
    def material_slots(self):
        if isinstance(self.data, Mesh):
            return [
                types.SimpleNamespace(material=m) for m in self.data.materials
            ]
        return []

    def evaluated_get(self, depsgraph):
        return self

    def to_mesh(self):
        return self.data


# --------------------------------------------------------------------------
# bmesh
# --------------------------------------------------------------------------


class _BMVert:
    def __init__(self, co):
        self.co = co


class _BMLoop:
    def __init__(self, vert, uv):
        self.vert = vert
        self._uv = uv

    def __getitem__(self, layer):
        return types.SimpleNamespace(uv=self._uv)


class _BMFace:
    def __init__(self, loops):
        self.loops = loops


class _BMesh:
    def __init__(self):
        self.verts = []
        self._faces = []  # list of (vert index tuple, uv list)
        self._uv_active = None

    def from_mesh(self, mesh):
        self.verts = [_BMVert(v.copy()) for v in mesh.vertices]
        uvl = mesh.uv_layers.active
        li = 0
        for poly in mesh.polygons:
            uvs = []
            for _ in poly:
                uvs.append(tuple(uvl.data[li].uv) if uvl else (0.0, 0.0))
                li += 1
            self._faces.append((tuple(poly), uvs))
        if uvl:
            self._uv_active = object()

    def transform(self, matrix):
        for v in self.verts:
            v.co = matrix @ v.co

    @property
    def faces(self):
        out = []
        for idxs, uvs in self._faces:
            loops = [
                _BMLoop(self.verts[vi], uv) for vi, uv in zip(idxs, uvs)
            ]
            out.append(_BMFace(loops))
        return out

    @property
    def loops(self):
        uv = types.SimpleNamespace(active=self._uv_active)
        layers = types.SimpleNamespace(uv=uv)
        return types.SimpleNamespace(layers=layers)

    def free(self):
        pass


class _BMeshOps:
    @staticmethod
    def triangulate(bm, faces=None):
        new_faces = []
        for idxs, uvs in bm._faces:
            if len(idxs) == 3:
                new_faces.append((idxs, uvs))
                continue
            for i in range(1, len(idxs) - 1):  # fan triangulation
                new_faces.append(
                    (
                        (idxs[0], idxs[i], idxs[i + 1]),
                        [uvs[0], uvs[i], uvs[i + 1]],
                    )
                )
        bm._faces = new_faces


# --------------------------------------------------------------------------
# bpy.types / registration / ops
# --------------------------------------------------------------------------


class Operator:
    def __init__(self, **props):
        _init_annotated_props(self)
        for k, v in props.items():
            setattr(self, k, v)
        self.reports = []

    def report(self, level, message):
        self.reports.append((level, message))


class Panel:
    pass


class _RenderPass:
    def __init__(self):
        self.rect = None


class _RenderResult:
    def __init__(self, w, h):
        self.layers = [
            types.SimpleNamespace(passes={"Combined": _RenderPass()})
        ]


class RenderEngine:
    def __init__(self):
        self.result = None

    def begin_result(self, x, y, w, h):
        return _RenderResult(w, h)

    def end_result(self, result):
        self.result = result


class _OpsNamespace:
    """bpy.ops.<category>.<idname>(**props) dispatch."""

    def __init__(self):
        self._registry = {}

    def _register(self, cls, context_factory):
        cat, name = cls.bl_idname.split(".")
        ns = getattr(self, cat, None)
        if ns is None:
            ns = types.SimpleNamespace()
            setattr(self, cat, ns)

        def call(**props):
            op = cls(**props)
            return op.execute(context_factory())

        setattr(ns, name, call)
        self._registry[cls.bl_idname] = cls

    def _unregister(self, cls):
        if "." not in getattr(cls, "bl_idname", ""):
            return
        cat, name = cls.bl_idname.split(".")
        ns = getattr(self, cat, None)
        if ns is not None and hasattr(ns, name):
            delattr(ns, name)
        self._registry.pop(cls.bl_idname, None)


class _Menu:
    def __init__(self):
        self.entries = []

    def append(self, fn):
        self.entries.append(fn)

    def remove(self, fn):
        self.entries.remove(fn)


# --------------------------------------------------------------------------
# module assembly
# --------------------------------------------------------------------------


def _build_modules():
    mathutils = types.ModuleType("mathutils")
    mathutils.Vector = Vector
    mathutils.Matrix = Matrix

    bpy = types.ModuleType("bpy")

    bpy_types = types.ModuleType("bpy.types")
    bpy_types.PropertyGroup = PropertyGroup
    bpy_types.Operator = Operator
    bpy_types.Panel = Panel
    bpy_types.RenderEngine = RenderEngine
    bpy_types.Scene = type("Scene", (_CrtHolder,), {})
    bpy_types.Material = Material
    bpy_types.Light = PointLightData
    bpy_types.Texture = Texture
    bpy_types.TOPBAR_MT_file_export = _Menu()
    bpy_types.TOPBAR_MT_file_import = _Menu()

    bpy_props = types.ModuleType("bpy.props")
    for f in (
        IntProperty,
        FloatProperty,
        BoolProperty,
        StringProperty,
        EnumProperty,
        FloatVectorProperty,
        IntVectorProperty,
        PointerProperty,
    ):
        setattr(bpy_props, f.__name__, f)

    data = types.SimpleNamespace(
        materials=_Collection(Material),
        meshes=_Collection(Mesh),
        objects=_Collection(Object),
        lights=_Collection(PointLightData),
        cameras=_Collection(Camera),
        textures=_Collection(Texture),
    )

    scene_coll = types.SimpleNamespace(
        objects=types.SimpleNamespace(
            _items=[], link=lambda ob: scene_coll.objects._items.append(ob)
        )
    )
    context = types.SimpleNamespace(
        collection=scene_coll, scene=types.SimpleNamespace(camera=None)
    )

    registered = []

    def register_class(cls):
        registered.append(cls)
        if issubclass(cls, Operator) and "." in getattr(cls, "bl_idname", ""):
            bpy.ops._register(cls, lambda: bpy.context)

    def unregister_class(cls):
        registered.remove(cls)
        if issubclass(cls, Operator):
            bpy.ops._unregister(cls)

    bpy.types = bpy_types
    bpy.props = bpy_props
    bpy.data = data
    bpy.context = context
    bpy.ops = _OpsNamespace()
    bpy.utils = types.SimpleNamespace(
        register_class=register_class,
        unregister_class=unregister_class,
        registered_classes=registered,
    )
    bpy.path = types.SimpleNamespace(abspath=lambda p: p)

    bmesh = types.ModuleType("bmesh")
    bmesh.new = _BMesh
    bmesh.ops = _BMeshOps

    bpy_extras = types.ModuleType("bpy_extras")
    io_utils = types.ModuleType("bpy_extras.io_utils")

    class ExportHelper:
        filename_ext = ""

    class ImportHelper:
        filename_ext = ""

    io_utils.ExportHelper = ExportHelper
    io_utils.ImportHelper = ImportHelper
    bpy_extras.io_utils = io_utils

    return {
        "mathutils": mathutils,
        "bpy": bpy,
        "bpy.types": bpy_types,
        "bpy.props": bpy_props,
        "bmesh": bmesh,
        "bpy_extras": bpy_extras,
        "bpy_extras.io_utils": io_utils,
    }


_BLENDER_MODULES = (
    "crt_tpu.frontend.blender.scene_bridge",
    "crt_tpu.frontend.blender.properties",
    "crt_tpu.frontend.blender.engine",
    "crt_tpu.frontend.blender.ui",
    "crt_tpu.frontend.blender.ops",
)


def _reload_frontend():
    for name in _BLENDER_MODULES:
        mod = sys.modules.get(name)
        if mod is not None:
            importlib.reload(mod)
        else:
            importlib.import_module(name)


def install():
    """Install mock modules and reload the add-on against them."""
    mods = _build_modules()
    sys.modules.update(mods)
    _reload_frontend()
    return mods["bpy"]


def uninstall():
    """Remove the mocks and restore the bpy-less module state."""
    for name in (
        "mathutils",
        "bpy",
        "bpy.types",
        "bpy.props",
        "bmesh",
        "bpy_extras",
        "bpy_extras.io_utils",
    ):
        sys.modules.pop(name, None)
    _reload_frontend()
