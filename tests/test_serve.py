"""HTTP viewer tests: the handler contract (page, render route, meta
header, input validation, error surfacing) with a stubbed renderer — no
TPU or real render needed."""

import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest


@pytest.fixture()
def server(monkeypatch):
    from http.server import ThreadingHTTPServer

    import nerf_rs_tpu.api as api
    from nerf_rs_tpu.serve import Handler

    calls = {}

    def fake_render(width, height, seed=0):
        if width == 13:  # trigger the error path
            raise RuntimeError("synthetic render failure")
        calls["last"] = (width, height, seed)
        return np.full(height * width * 4, 128, np.uint8)

    monkeypatch.setattr(api, "render_image_rgba", fake_render)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", calls
    srv.shutdown()


def test_serve_page_and_render(server):
    base, calls = server
    page = urllib.request.urlopen(base + "/").read().decode()
    assert "resp.ok" in page  # error surfacing stays in the viewer JS
    resp = urllib.request.urlopen(base + "/render?width=16&height=8&seed=3")
    meta = json.loads(resp.headers["x-render-meta"])
    body = resp.read()
    assert (meta["width"], meta["height"]) == (16, 8)
    assert len(body) == 16 * 8 * 4
    assert calls["last"] == (16, 8, 3)


def test_serve_rejects_bad_query(server):
    base, _ = server
    for q in ("width=abc", "width=0&height=16", "width=4096&height=16",
              "seed=x"):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/render?{q}")
        assert e.value.code == 400, q


def test_serve_surfaces_render_errors(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/render?width=13&height=16")
    assert e.value.code == 500
    assert "synthetic render failure" in e.value.read().decode()


def test_serve_unknown_path_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope")
    assert e.value.code == 404
