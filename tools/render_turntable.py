"""Camera-animation demo: orbit the camera and render frames.

Exercises the camera-move API (CameraRig pan_around/dolly/tilt — the
reference's task-06 animation surface, crt_camera.h:26-56) end to end.

Usage: python tools/render_turntable.py [scene] [outdir] [--frames N]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    from crt_tpu import RenderSettings, load_scene, render_image
    from crt_tpu.io.ppm import quantize
    from crt_tpu.scene.procedural import make_test_scene
    from crt_tpu.utils.camera_rig import CameraRig
    from crt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    args = [a for a in argv if not a.startswith("-")]
    scene_path = args[0] if args and args[0].endswith(".crtscene") else None
    outdir = (args[1] if scene_path else args[0]) if len(args) > (1 if scene_path else 0) else "turntable"
    frames = int(argv[argv.index("--frames") + 1]) if "--frames" in argv else 12

    if scene_path:
        scene = load_scene(scene_path)
    else:
        scene = make_test_scene(width=320, height=180, num_quads=8)
    settings = RenderSettings()
    os.makedirs(outdir, exist_ok=True)

    # orbit about the scene centroid
    anchor = np.asarray(scene.vertices).mean(axis=0)
    rig0 = CameraRig.from_scene(scene)

    from PIL import Image

    for f in range(frames):
        angle = 2.0 * math.pi * f / frames
        rig = rig0.pan_around(angle, anchor)
        img = np.asarray(render_image(rig.apply(scene), settings))
        Image.fromarray(quantize(img).astype(np.uint8)).save(
            os.path.join(outdir, f"frame_{f:03d}.png")
        )
        print(f"frame {f + 1}/{frames}", flush=True)
    print(f"wrote {frames} frames to {outdir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
