"""Texture sampling vs scalar ports of crt_texture.cpp."""

import numpy as np
import jax.numpy as jnp

from crt_tpu.ops.texture import sample_textures
from crt_tpu.scene.json_loader import scene_from_dict
from tests.test_scene_loader import minimal_dict


def build_scene_with_textures():
    d = minimal_dict()
    d["textures"] = [
        {"name": "e", "type": "edges", "edge_width": 0.1,
         "edge_color": [1, 0, 0], "inner_color": [0, 1, 0]},
        {"name": "c", "type": "checker", "color_A": [1, 1, 1],
         "color_B": [0, 0, 0], "square_size": 0.25},
    ]
    d["materials"] = [
        {"type": "diffuse", "albedo": "e", "smooth_shading": False},
        {"type": "diffuse", "albedo": "c", "smooth_shading": False},
    ]
    d["objects"][0]["material_index"] = 0
    return scene_from_dict(d)


def ref_edges(u, v, w_, edge=0.1):
    # crt_texture.cpp:14-22
    return (1, 0, 0) if (u <= edge or v <= edge or (1 - u - v) <= edge) \
        else (0, 1, 0)


def ref_checker(uu, vv, size=0.25):
    # crt_texture.cpp:24-36 — C int truncation
    row = int(uu / size)
    col = int(vv / size)
    return (0, 0, 0) if (row + col) & 1 else (1, 1, 1)


def test_edges_texture_exact():
    scene = build_scene_with_textures()
    cases = [(0.05, 0.5), (0.5, 0.05), (0.45, 0.46), (0.3, 0.3), (0.1, 0.1),
             (0.100001, 0.5), (0.5, 0.4)]
    us = jnp.asarray([c[0] for c in cases], jnp.float32)
    vs = jnp.asarray([c[1] for c in cases], jnp.float32)
    tex = jnp.zeros(len(cases), jnp.int32)  # edges texture index 0
    uv = jnp.zeros((len(cases), 3), jnp.float32)
    out = np.asarray(sample_textures(scene, tex, uv, us, vs))
    for i, (u, v) in enumerate(cases):
        np.testing.assert_allclose(out[i], ref_edges(u, v, 1 - u - v),
                                   err_msg=f"case {i}: u={u} v={v}")


def test_checker_texture_exact():
    scene = build_scene_with_textures()
    cases = [(0.1, 0.1), (0.26, 0.1), (0.26, 0.26), (0.49, 0.74),
             (0.75, 0.75), (0.999, 0.001), (0.5, 0.5), (0.24999, 0.25001)]
    uv = jnp.asarray([[u, v, 0.0] for u, v in cases], jnp.float32)
    tex = jnp.ones(len(cases), jnp.int32)  # checker texture index 1
    z = jnp.full(len(cases), 0.4, jnp.float32)
    out = np.asarray(sample_textures(scene, tex, uv, z, z))
    for i, (u, v) in enumerate(cases):
        np.testing.assert_allclose(out[i], ref_checker(u, v),
                                   err_msg=f"case {i}: u={u} v={v}")


def test_bitmap_texture_nearest_vflip(tmp_path):
    # 2x2 RGB bitmap: distinct corner colors; sample centers of each quadrant
    from PIL import Image

    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], np.uint8
    )
    p = tmp_path / "t.png"
    Image.fromarray(img).save(p)

    d = minimal_dict()
    d["textures"] = [{"name": "b", "type": "bitmap", "file_path": p.name}]
    d["materials"] = [{"type": "diffuse", "albedo": "b",
                       "smooth_shading": False}]
    scene = scene_from_dict(d, asset_root=str(tmp_path))

    # crt_texture.cpp:38-45: x = int(u*w) % w; y = int((1-v)*h) % h
    cases = {
        (0.25, 0.75): img[0, 0],  # u=.25 -> x=0; v=.75 -> y=int(.5)=0
        (0.75, 0.75): img[0, 1],
        (0.25, 0.25): img[1, 0],
        (0.75, 0.25): img[1, 1],
    }
    uv = jnp.asarray([[u, v, 0.0] for u, v in cases], jnp.float32)
    tex = jnp.zeros(len(cases), jnp.int32)
    z = jnp.zeros(len(cases), jnp.float32)
    out = np.asarray(sample_textures(scene, tex, uv, z, z))
    for i, ((u, v), expect) in enumerate(cases.items()):
        np.testing.assert_allclose(
            out[i], np.asarray(expect, np.float32) / 255.0, atol=1e-6,
            err_msg=f"u={u} v={v}",
        )


def test_strict_mode_rejects_legacy_like_head(scenes_dir):
    """HEAD rejects material-less / light-less scenes (crt_json.cpp:590-610)."""
    import pytest

    from crt_tpu.scene.json_loader import SceneFormatError, load_scene

    for rel in ["07-01-scene/scene0.crtscene", "08-01-light/scene0.crtscene",
                "09-01-barycentric-coordinates/scene0.crtscene"]:
        with pytest.raises(SceneFormatError):
            load_scene(str(scenes_dir / rel), strict=True)
    # 09-01-scene1 onward loads in strict mode
    load_scene(str(scenes_dir / "09-01-barycentric-coordinates/scene1.crtscene"),
               strict=True)
