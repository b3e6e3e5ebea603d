"""Stage the Blender add-on as an installable zip.

Functional mirror of the reference's Blender-extension staging target
(reference CMakeLists.txt:66-92): bundles the add-on modules, the manifest,
AND the crt_tpu package (the add-on imports it) into one zip whose top-level
package is the add-on.

Usage: python tools/stage_blender_addon.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    out = argv[0] if argv else os.path.join(REPO, "crt_tpu_blender.zip")
    pkg = os.path.join(REPO, "crt_tpu")
    addon_dir = os.path.join(pkg, "frontend", "blender")

    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        # add-on modules at the top level (Blender extension layout)
        for fname in sorted(os.listdir(addon_dir)):
            if fname.endswith((".py", ".toml")):
                z.write(os.path.join(addon_dir, fname),
                        os.path.join("crt_tpu_renderer", fname))
        # the crt_tpu package the add-on imports, vendored inside
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, REPO)
                z.write(full, os.path.join("crt_tpu_renderer", rel))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
