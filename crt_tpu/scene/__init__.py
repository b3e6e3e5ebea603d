from crt_tpu.scene.types import Scene, AccelTree, RenderSettings
from crt_tpu.scene.json_loader import load_scene, scene_from_dict, scene_from_json

__all__ = [
    "Scene",
    "AccelTree",
    "RenderSettings",
    "load_scene",
    "scene_from_dict",
    "scene_from_json",
]
