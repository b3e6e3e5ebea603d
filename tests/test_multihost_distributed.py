"""REAL multi-process multihost runtime test.

Spawns two OS processes that join one jax.distributed runtime (CPU
platform, gloo collectives, 2 virtual devices each = 4 global devices),
render through crt_tpu.parallel.multihost.render_image_multihost with rows
sharded over the GLOBAL device set, and assert that the frame every
process assembles via process_allgather is identical to the single-process
render.  This exercises the actual cross-process path the pod runtime
uses (distributed init, global mesh construction, multihost gather) —
not just the single-process fallbacks.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent(
    """
    import os
    import sys

    sys.path.insert(0, os.getcwd())  # repo root (test sets cwd)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    pid = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]

    from crt_tpu.parallel import multihost

    assert multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import numpy as np

    from crt_tpu import RenderSettings
    from crt_tpu.scene.procedural import make_test_scene

    scene = make_test_scene(width=48, height=32, num_quads=5)
    frame = multihost.render_image_multihost(scene, RenderSettings())
    np.save(f"{outdir}/frame_{pid}.npy", np.asarray(frame))
    print(f"worker {pid} ok", flush=True)
    """
)


def test_two_process_distributed_render(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    port = "29517"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(tmp_path)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"

    f0 = np.load(tmp_path / "frame_0.npy")
    f1 = np.load(tmp_path / "frame_1.npy")
    # both processes assembled the SAME full frame
    np.testing.assert_array_equal(f0, f1)

    # and it matches the single-process render
    import jax

    from crt_tpu import RenderSettings, render_image
    from crt_tpu.scene.procedural import make_test_scene

    scene = make_test_scene(width=48, height=32, num_quads=5)
    single = np.asarray(render_image(scene, RenderSettings()))
    np.testing.assert_allclose(f0, single, rtol=1e-5, atol=1e-6)
