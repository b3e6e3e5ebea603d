"""PPM writer format parity + roundtrip."""

import io

import numpy as np

from crt_tpu.io.ppm import quantize, read_ppm, write_ppm


def test_header_and_quantization():
    img = np.array(
        [[[0.0, 0.5, 1.0], [1.5, -0.2, 0.999]]], np.float32
    )  # 1x2
    buf = io.StringIO()
    write_ppm(img, buf)
    text = buf.getvalue()
    # Header: P3\n<w> <h>\n255\n  (crt_image_ppm.cpp:10-12)
    assert text.startswith("P3\n2 1\n255\n")
    # 0.5*255 = 127.5 -> trunc 127 (C int cast); 1.5 clamps to 255; -0.2 to 0
    body = text.splitlines()[3]
    assert body == "0 127 255\t255 0 254\t"


def test_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (5, 7, 3)).astype(np.float32)
    buf = io.StringIO()
    write_ppm(img, buf)
    back = read_ppm(io.StringIO(buf.getvalue()))
    np.testing.assert_allclose(back, quantize(img) / 255.0, atol=1e-6)


def test_native_formatter_byte_identical():
    """The native ASCII P3 formatter (native/crt_ppm.cpp) must produce the
    EXACT bytes of the Python reference loop on arbitrary images."""
    import numpy as np

    from crt_tpu.io.native_ppm import format_ppm_native
    from crt_tpu.io.ppm import quantize

    rng = np.random.default_rng(7)
    for h, w in ((1, 1), (3, 5), (17, 31)):
        img = rng.random((h, w, 3)).astype(np.float32) * 1.2 - 0.1
        arr = quantize(img)
        lines = [f"P3\n{w} {h}\n255\n"]
        flat = arr.reshape(h, w * 3)
        for row in flat:
            it = iter(row.tolist())
            lines.append(
                "".join(f"{r} {g} {b}\t" for r, g, b in zip(it, it, it))
                + "\n"
            )
        assert format_ppm_native(arr, 255) == "".join(lines)
