"""Image output: PPM (binary P6), PNG, and RGBA buffers.

Quantization replicates the reference exactly: clamp to [0,1], scale by 255,
add 0.5, truncate to u8 (save_ppm /root/reference/src/lib.rs:567-580,
pixels_to_rgba lib.rs:582-592).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def quantize_u8(pixels: np.ndarray) -> np.ndarray:
    """clamp(0,1) * 255 + 0.5, truncated — byte-identical to the reference."""
    px = np.asarray(pixels, dtype=np.float32)
    return (np.clip(px, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_ppm(path, pixels: np.ndarray, height: int, width: int) -> None:
    """Binary P6 PPM writer (reference save_ppm, lib.rs:568-580)."""
    rgb = quantize_u8(np.asarray(pixels).reshape(height, width, 3))
    try:
        from nerf_rs_tpu.io import native

        if native.available():
            native.write_ppm(str(path), rgb)
            return
    except Exception:
        pass
    with open(path, "wb") as f:
        f.write(f"P6\n{width} {height}\n255\n".encode())
        f.write(rgb.tobytes())


def load_ppm(path) -> np.ndarray:
    """Read a binary P6 PPM into a float32 (H, W, 3) array in [0, 1]."""
    data = Path(path).read_bytes()
    # Parse header: magic, width, height, maxval — whitespace/comment tolerant.
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM: magic {tokens[0]!r}")
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    i += 1  # single whitespace after maxval
    raw = np.frombuffer(data, dtype=np.uint8, count=width * height * 3, offset=i)
    return raw.reshape(height, width, 3).astype(np.float32) / float(maxval)


def pixels_to_rgba(pixels: np.ndarray) -> np.ndarray:
    """Flat RGBA u8 buffer with A=255 (reference pixels_to_rgba, lib.rs:582-592).

    Serving hot path (api.render_image_rgba -> every viewer frame): uses
    the threaded C quantize+interleave when built, numpy otherwise —
    byte-identical either way (tests/test_io.py)."""
    px = np.asarray(pixels, dtype=np.float32).reshape(-1, 3)
    try:
        from nerf_rs_tpu.io import native

        if native.available():
            return native.rgb_to_rgba(px)
    except Exception:
        pass
    rgb = quantize_u8(px)
    rgba = np.empty((rgb.shape[0], 4), dtype=np.uint8)
    rgba[:, :3] = rgb
    rgba[:, 3] = 255
    return rgba.reshape(-1)


def save_png(path, pixels: np.ndarray, height: int, width: int) -> None:
    from PIL import Image

    rgb = quantize_u8(np.asarray(pixels).reshape(height, width, 3))
    Image.fromarray(rgb, mode="RGB").save(path)


def load_png(path) -> np.ndarray:
    """Read a PNG into a float32 (H, W, 3) array in [0, 1]."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return img / 255.0
